"""Rank conv fusions by EXCESS time over an achievable-roofline estimate
(FLOPs at --roofline TF/s), using true contraction sizes parsed from the
conv instruction's operand shapes. Shows where the step's sub-roofline conv
time concentrates.

Usage: python experiments/conv_excess.py [--roofline 170] (expects
/tmp/train_step_hlo.txt from hlo_inspect.py and the profile_step.py trace)
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


_SHAPES = re.compile(r"(?:bf16|f32)\[([\d,]+)\]")


def parse_convs(path: str):
    """fusion name -> (flops, desc): resolves conv operand shapes via a
    global name->shape map (operand shapes are not inlined in the dump)."""
    txt = Path(path).read_text()
    shape_of: dict[str, tuple] = {}
    for m in re.finditer(r"%([\w.\-]+) = (?:bf16|f32|u16|s32|pred)\[([\d,]*)\]", txt):
        if m.group(2):
            shape_of[m.group(1)] = tuple(int(x) for x in m.group(2).split(","))
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
            om = re.match(r"%([\w.\-]+) = (?:bf16|f32)\[([\d,]+)\]", s)
            ops = re.search(r"convolution\(%([\w.\-]+), %([\w.\-]+)\)", s)
            dl = re.search(r"dim_labels=(\S+?),", s)
            if not (om and ops and dl):
                continue
            out_s = tuple(int(x) for x in om.group(2).split(","))
            rhs_s = shape_of.get(ops.group(2))
            if rhs_s is None or len(rhs_s) != 4:
                continue
            labels = dl.group(1)
            lhs_l, rest = labels.split("_")
            rhs_l, out_l = rest.split("->")
            ci = rhs_s[rhs_l.index("i")]
            k = rhs_s[rhs_l.index("0")] * rhs_s[rhs_l.index("1")]
            out_elems = 1
            for d in out_s:
                out_elems *= d
            flops = 2.0 * out_elems * k * ci
            comp_conv[cur] = (flops, f"{labels} out{list(out_s)} rhs{list(rhs_s)}")
    fus: dict[str, tuple] = {}
    for m in re.finditer(
        r"%(fusion[.\w]*|[\w.\-]*fusion[.\d]*) = [^\n]*?calls=%([\w.\-]+)", txt
    ):
        if m.group(2) in comp_conv:
            fus[m.group(1)] = comp_conv[m.group(2)]
    return fus


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracedir", default="/tmp/tinyedm_profile")
    ap.add_argument("--hlo", default="/tmp/train_step_hlo.txt")
    ap.add_argument("--roofline", type=float, default=170.0)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()
    times = load_trace_times(args.tracedir)
    fus = parse_convs(args.hlo)
    rows = []
    tot_t = tot_fl = tot_ex = 0.0
    for name, ms in times.items():
        if name not in fus:
            continue
        fl, desc = fus[name]
        ideal = fl / (args.roofline * 1e9)
        rows.append((ms - ideal, ms, fl / ms / 1e9, name, desc))
        tot_t += ms
        tot_fl += fl
        tot_ex += ms - ideal
    rows.sort(reverse=True)
    print(
        f"conv fusions: {tot_t:.1f} ms, {tot_fl/1e12:.2f} TFLOP, "
        f"avg {tot_fl/tot_t/1e9:.0f} TF/s, excess vs {args.roofline:.0f} TF/s = {tot_ex:.1f} ms"
    )
    print(f"{'excess':>7} {'ms':>7} {'TF/s':>6}  name / conv")
    for ex, ms, tf, name, desc in rows[: args.top]:
        print(f"{ex:7.3f} {ms:7.3f} {tf:6.1f}  {name:34s} {desc[:90]}")


if __name__ == "__main__":
    main()
