"""Dump the compiled CIFAR train step's HLO and map fusion names to their
convolution ops (kind, shapes, window) so trace hotspots can be attributed.

Usage: python experiments/hlo_inspect.py [names...]   (default: all conv fusions)
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tinyedm_tpu.utils.tpu import tune_for_tpu

tune_for_tpu()


def compile_step(config: str = "cifar10", batch: int | None = None):
    from _common import build_compiled_step

    return build_compiled_step(config, batch).compiled


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="cifar10")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    sys.argv = [sys.argv[0]] + args.names  # downstream code reads sys.argv
    compiled = compile_step(args.config, args.batch)
    txt = compiled.as_text()
    Path("/tmp/train_step_hlo.txt").write_text(txt)
    print(f"HLO dumped to /tmp/train_step_hlo.txt ({len(txt)/1e6:.1f} MB)")

    # index: fusion computation name -> list of conv lines inside it
    # fusion instruction lines look like:
    #   %fusion.677 = ... fusion(...), kind=kOutput, calls=%fused_computation.NNN
    fus_to_comp = {}
    for m in re.finditer(r"%?(fusion[.\w]*) = [^\n]*calls=%?([\w.\-]+)", txt):
        fus_to_comp[m.group(1)] = m.group(2)

    # computation bodies: "%fused_computation.NNN (...) {" ... "}"
    comp_convs: dict[str, list[str]] = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"%?([\w.\-]+) \([^)]*\) -> .* \{", line.strip())
        if m:
            cur = m.group(1)
            continue
        if cur and line.strip() == "}":
            cur = None
            continue
        if cur and ("convolution(" in line or "convolution.clone" in line):
            comp_convs.setdefault(cur, []).append(line.strip())

    explicit = sys.argv[1:]
    names = explicit or sorted(fus_to_comp)
    for name in names:
        comp = fus_to_comp.get(name)
        if not comp:
            continue
        convs = comp_convs.get(comp, [])
        if not convs and not explicit:
            # default mode: only conv-bearing fusions (explicitly named
            # fusions always print, conv or not)
            continue
        print(f"\n== {name} -> {comp} ==")
        for c in convs:
            print("   ", c[:400])


if __name__ == "__main__":
    main()
