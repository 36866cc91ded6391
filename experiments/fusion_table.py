"""Join the profiler trace with the compiled HLO: for every fusion, print
time/step, the conv op inside (if any) with shapes, computed GFLOP, and
achieved TFLOP/s. Identifies which fusions are far from the MXU roofline.

Usage: python experiments/fusion_table.py [--tracedir /tmp/tinyedm_profile]
(expects the trace from profile_step.py and /tmp/train_step_hlo.txt from
hlo_inspect.py; re-run those first if stale)
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import re
from collections import defaultdict
from pathlib import Path

N_STEPS = 5


def load_trace_times(tracedir: str) -> dict[str, float]:
    paths = sorted(glob.glob(f"{tracedir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    by_name: dict[str, float] = defaultdict(float)
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or not e.get("dur"):
            continue
        if not (e.get("args", {}) or {}).get("hlo_category"):
            continue
        by_name[e["name"]] += e["dur"] / 1e3 / N_STEPS
    return by_name


_SHAPE = re.compile(r"(bf16|f32)\[([\d,]+)\]")


def parse_hlo(path: str):
    """fusion name -> (conv line metadata) for every fusion instruction."""
    txt = Path(path).read_text()
    # map computation name -> conv summary
    comp_conv: dict[str, tuple] = {}
    cur = None
    for line in txt.splitlines():
        s = line.strip()
        m = re.match(r"%?([\w.\-]+) \([^)]*\) -> .* \{", s)
        if m:
            cur = m.group(1)
            continue
        if cur and s == "}":
            cur = None
            continue
        if cur and " convolution(" in s:
            sm = _SHAPE.search(s)
            out_shape = tuple(int(x) for x in sm.group(2).split(",")) if sm else ()
            dl = re.search(r"dim_labels=(\S+?),", s)
            win = re.search(r"window=\{([^}]*)\}", s)
            opm = re.search(r'op_name="([^"]*)"', s)
            comp_conv[cur] = (
                out_shape,
                sm.group(1) if sm else "?",
                dl.group(1) if dl else "?",
                win.group(1) if win else "",
                (opm.group(1).split("/")[-2] + "/" + opm.group(1).split("/")[-1])
                if opm
                else "",
            )
    fus: dict[str, tuple] = {}
    for m in re.finditer(r"%(fusion[.\w]*|[\w.\-]*fusion[.\d]*) = [^\n]*?calls=%([\w.\-]+)", txt):
        name, comp = m.group(1), m.group(2)
        if comp in comp_conv:
            fus[name] = comp_conv[comp]
    # emitters
    emitters: dict[str, str] = {}
    for m in re.finditer(r"%([\w.\-]+) = [^\n]*\"emitter\":\"(\w+)\"", txt):
        emitters[m.group(1)] = m.group(2)
    return fus, emitters


def conv_flops(out_shape, dim_labels, win) -> float:
    """2 * out_elems * K * Cin_contract, inferred from dim labels + window."""
    sizes = re.findall(r"size=(\d+)x(\d+)", win)
    k = 1
    if sizes:
        a, b = int(sizes[0][0]), int(sizes[0][1])
        k = a * b
    out_elems = 1
    for d in out_shape:
        out_elems *= d
    # contraction size: for fwd/bwd-input convs the window is 3x3 and the
    # contracted feature dim isn't in the output; estimate via labels:
    return out_elems, k


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracedir", default="/tmp/tinyedm_profile")
    ap.add_argument("--hlo", default="/tmp/train_step_hlo.txt")
    ap.add_argument("--min-ms", type=float, default=0.15)
    args = ap.parse_args()
    times = load_trace_times(args.tracedir)
    fus, emitters = parse_hlo(args.hlo)

    rows = []
    for name, ms in sorted(times.items(), key=lambda kv: -kv[1]):
        if ms < args.min_ms:
            continue
        info = fus.get(name)
        if info:
            out_shape, dt, dl, win, op = info
            em = emitters.get(name, "")
            rows.append((ms, name, f"{dt}{list(out_shape)} {dl} {win[:28]} {op} [{em[4:]}]"))
        else:
            rows.append((ms, name, ""))
    total = sum(r[0] for r in rows)
    print(f"rows >= {args.min_ms} ms: {len(rows)}, total {total:.1f} ms")
    for ms, name, desc in rows:
        print(f"{ms:8.3f}  {name:42s} {desc[:160]}")


if __name__ == "__main__":
    main()
