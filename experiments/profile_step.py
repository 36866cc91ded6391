"""Capture a device trace of the CIFAR train step and print the op-time
breakdown, aggregated by fusion kind. Reads the perfetto trace.json.gz the
jax profiler writes.

Usage: python experiments/profile_step.py [--sampler] [--top N]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from tinyedm_tpu.utils.tpu import tune_for_tpu

tune_for_tpu()


def capture(tracedir: str, config: str = "cifar10", batch: int | None = None) -> None:
    from _common import build_compiled_step

    s = build_compiled_step(config, batch)
    state = s.state
    for _ in range(3):
        state, metrics = s.compiled(state, s.feed, s.key, s.sched)
    float(metrics["train_loss"])
    jax.profiler.start_trace(tracedir)
    for _ in range(5):
        state, metrics = s.compiled(state, s.feed, s.key, s.sched)
    float(metrics["train_loss"])
    jax.profiler.stop_trace()


def summarize(tracedir: str, top: int, n_steps: int = 5) -> None:
    paths = sorted(glob.glob(f"{tracedir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("no trace found under", tracedir)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = [
        e
        for e in trace.get("traceEvents", [])
        if e.get("ph") == "X" and e.get("dur") and "pid" in e
    ]
    # keep device-thread events only (XLA ops carry run ids / hlo names)
    by_name = defaultdict(float)
    by_cat = defaultdict(float)
    total = 0.0
    for e in events:
        name = e.get("name", "")
        args = e.get("args", {})
        hlo_cat = args.get("hlo_category") or ""
        if not hlo_cat:
            continue
        dur_ms = e["dur"] / 1e3 / n_steps
        by_name[f"{hlo_cat:26s} {name}"] += dur_ms
        by_cat[hlo_cat] += dur_ms
        total += dur_ms
    print(f"\n== per-category (ms/step, total {total:.1f}) ==")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{ms:9.2f}  {cat}")
    print(f"\n== top {top} ops (ms/step) ==")
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms:9.3f}  {name[:150]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--tracedir", default="/tmp/tinyedm_profile")
    ap.add_argument("--no-capture", action="store_true")
    ap.add_argument("--config", default="cifar10")
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()
    if not args.no_capture:
        import shutil

        shutil.rmtree(args.tracedir, ignore_errors=True)
        capture(args.tracedir, args.config, args.batch)
    summarize(args.tracedir, args.top)


if __name__ == "__main__":
    main()
