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
    local_shapes: dict[str, tuple] = {}
    for line in txt.splitlines():
        s = line.strip()
        m = re.match(r"%?([\w.\-]+) \([^)]*\) -> .* \{", s)
        if m:
            cur = m.group(1)
            local_shapes = {}
            continue
        if cur and s == "}":
            cur = None
            continue
        if cur:
            # record every instruction's result shape for operand lookup
            dm = re.match(r"%([\w.\-]+) = (?:\()?(bf16|f32|s32|u32|pred)\[([\d,]*)\]", s)
            if dm:
                local_shapes[dm.group(1)] = tuple(
                    int(x) for x in dm.group(3).split(",") if x
                )
        if cur and " convolution(" in s:
            shapes = _SHAPE.findall(s)
            out_shape = (
                tuple(int(x) for x in shapes[0][1].split(",")) if shapes else ()
            )
            ops = re.search(r"convolution\(%([\w.\-]+), %([\w.\-]+)\)", s)
            rhs_shape = local_shapes.get(ops.group(2), ()) if ops else ()
            dl = re.search(r"dim_labels=(\S+?),", s)
            win = re.search(r"window=\{([^}]*)\}", s)
            opm = re.search(r'op_name="([^"]*)"', s)
            comp_conv[cur] = (
                out_shape,
                shapes[0][0] if shapes else "?",
                dl.group(1) if dl else "?",
                win.group(1) if win else "",
                (opm.group(1).split("/")[-2] + "/" + opm.group(1).split("/")[-1])
                if opm
                else "",
                rhs_shape,
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


def conv_flops(out_shape, dim_labels, win, rhs_shape) -> float:
    """FLOPs = 2 x out_elems x (spatial window product x contracted feature
    size). The contracted feature dim is the rhs position labeled 'i' in
    dim_labels (lhs_rhs->out); this holds for all three conv forms XLA emits
    (forward, dgrad as rhs-reversed conv, wgrad as big-window conv)."""
    sizes = re.findall(r"size=(\d+)x(\d+)", win)
    k = 1
    if sizes:
        a, b = int(sizes[0][0]), int(sizes[0][1])
        k = a * b
    out_elems = 1
    for d in out_shape:
        out_elems *= d
    try:
        rhs_labels = dim_labels.split("_")[1].split("-")[0]
        ci = rhs_shape[rhs_labels.index("i")]
    except (IndexError, ValueError):
        return 0.0
    return 2.0 * out_elems * k * ci


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracedir", default="/tmp/tinyedm_profile")
    ap.add_argument("--hlo", default="/tmp/train_step_hlo.txt")
    ap.add_argument("--min-ms", type=float, default=0.15)
    ap.add_argument("--peak-tfs", type=float, default=250.0,
                    help="physical sanity bound: a row whose naive "
                    "window-size FLOP count implies more than this is a "
                    "transposed-contraction form (full-padding window with "
                    "rhs_reversal, e.g. 1x1 dgrads at 64x64) whose padding "
                    "zeros the regex cannot see — excluded from the roofline "
                    "denominators instead of inflating them (v5e bf16 peak "
                    "is ~197 TF/s)")
    args = ap.parse_args()
    times = load_trace_times(args.tracedir)
    fus, emitters = parse_hlo(args.hlo)

    rows = []
    conv_ms = conv_fl = unresolved_ms = 0.0
    unresolved = 0
    by_form: dict[str, list[float]] = defaultdict(lambda: [0.0, 0.0])
    for name, ms in sorted(times.items(), key=lambda kv: -kv[1]):
        if ms < args.min_ms:
            continue
        info = fus.get(name)
        if info:
            out_shape, dt, dl, win, op, rhs_shape = info
            em = emitters.get(name, "")
            fl = conv_flops(out_shape, dl, win, rhs_shape)
            tfs = fl / ms * 1e-9 if fl else 0.0
            if fl and tfs > args.peak_tfs:
                unresolved += 1
                unresolved_ms += ms
                rows.append(
                    (ms, name,
                     f"FLOPs-unresolved (naive {tfs:.0f} TF/s > peak; "
                     f"transposed form) {dt}{list(out_shape)} {dl} {op} "
                     f"[{em[4:]}]")
                )
                continue
            if fl:
                # only FLOP-resolved rows enter the roofline denominators —
                # a 0-FLOP row (operand shape the HLO regexes could not
                # resolve) would silently deflate "mean TF/s achieved"
                conv_ms += ms
                conv_fl += fl
                form = f"{op} {dl} out={list(out_shape)} rhs={list(rhs_shape)}"
                by_form[form][0] += ms
                by_form[form][1] += fl
            else:
                unresolved += 1
                unresolved_ms += ms
            rows.append(
                (ms, name, f"{tfs:6.0f} TF/s {dt}{list(out_shape)} {dl} {op} [{em[4:]}]")
            )
        else:
            rows.append((ms, name, ""))
    total = sum(r[0] for r in rows)
    print(f"rows >= {args.min_ms} ms: {len(rows)}, total {total:.1f} ms")
    if conv_ms:
        print(
            f"attributed convs: {conv_ms:.1f} ms, {conv_fl / 1e12:.2f} TFLOP, "
            f"mean {conv_fl / conv_ms * 1e-9:.0f} TF/s achieved"
        )
    if unresolved:
        print(
            f"WARNING: {unresolved} conv rows ({unresolved_ms:.1f} ms) had "
            "unresolvable operand shapes and are EXCLUDED from the roofline "
            "numbers above"
        )
    for ms, name, desc in rows:
        print(f"{ms:8.3f}  {name:42s} {desc[:160]}")
    if by_form:
        print("\n== conv roofline by form (ms, TF/s) ==")
        for form, (ms, fl) in sorted(by_form.items(), key=lambda kv: -kv[1][0]):
            print(f"{ms:8.2f}  {fl / ms * 1e-9 if fl else 0.0:6.0f} TF/s  {form}")


if __name__ == "__main__":
    main()
