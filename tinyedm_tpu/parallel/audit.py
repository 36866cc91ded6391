"""Communication audit: extract the collective inventory of a compiled
multi-chip program from its optimized HLO.

Why this exists: the dryrun (``__graft_entry__.dryrun_multichip``) proves the
sharded programs compile and execute without partitioner warnings, but a
warning-free compile does not pin WHICH collectives the program performs. The
reference's distributed contract is Lightning DDP (``experiments/conf/
cifar10.yaml:4-8`` -> torch.distributed/NCCL): exactly one fused gradient
all-reduce per step, parameters never gathered in the forward. A regression —
say an accidental parameter all-gather sneaking into the DP forward through a
bad sharding annotation — would keep the dryrun green while multiplying
bytes-on-ICI per step. ``collective_inventory`` turns the optimized HLO into
a typed list so tests can assert the inventory positively (see
``tests/test_collective_audit.py``) and ``docs/PERFORMANCE.md`` can tabulate
bytes moved per step.

Parsing notes: instruction lines look like

  %all-reduce.65 = (f32[3,3,2,8]{3,2,1,0}, ...) all-reduce(%a, %b, ...),
      channel_id=1, replica_groups=[1,8]<=[8], use_global_device_ids=true, ...

The result type is a single shape or a tuple; payload bytes = sum of element
counts x dtype width over the result shapes. Async pairs (``all-reduce-start``
/ ``all-reduce-done``) are counted once, at the ``-start``, with the payload
taken from the matching ``-done``'s result — the start's own result tuple is
backend-dependent (an (operand, result) pair for all-gather-start, a bare
result shape for all-reduce-start on some backends), so the done result is
the only shape that consistently equals the collective's output. On the CPU
test backend XLA emits the sync forms.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Iterable

# HLO primitive byte widths (only types that can appear in our programs)
_DTYPE_BYTES = {
    "pred": 1,
    "s8": 1,
    "u8": 1,
    "f8e4m3fn": 1,
    "f8e5m2": 1,
    "s16": 2,
    "u16": 2,
    "f16": 2,
    "bf16": 2,
    "s32": 4,
    "u32": 4,
    "f32": 4,
    "s64": 8,
    "u64": 8,
    "f64": 8,
    "c64": 8,
    "c128": 16,
}

COLLECTIVE_KINDS = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)

# "f32[3,3,2,8]{3,2,1,0}" or "f32[]" (scalar); layout suffix optional
_SHAPE_RE = re.compile(r"\b([a-z]+\d*[a-z0-9]*)\[([\d,]*)\](?:\{[^}]*\})?")

# Defining lines only: "  [ROOT] %name = TYPE kind(". The definition anchor
# keeps operand references from matching; the kind token is then located
# separately (the result TYPE may contain /*index=N*/ comments, so it cannot
# be captured by a simple character class).
_DEF_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*")
_KIND_RE = re.compile(
    r"\s(" + "|".join(COLLECTIVE_KINDS) + r")(-start)?\("
)
# completion of an async pair: "%done = f32[8]{0} all-reduce-done(%start)"
_DONE_RE = re.compile(
    r"\s(?:" + "|".join(COLLECTIVE_KINDS) + r")-done\(\s*%?([\w.\-]+)\s*\)"
)
# computation header: "%body.3 (p: f32[8]) -> f32[8] {" or "ENTRY %main ... {"
_COMP_RE = re.compile(r"^(?:ENTRY\s+)?%([\w.\-]+)\s*(?:\([^)]*\))?.*\{\s*$")
# while-loop body attribute on a while instruction
_WHILE_BODY_RE = re.compile(r"\bbody=%?([\w.\-]+)")


def _shape_bytes(dtype: str, dims: str) -> int:
    width = _DTYPE_BYTES.get(dtype)
    if width is None:
        return 0  # token/opaque types carry no payload
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * width


@dataclasses.dataclass(frozen=True)
class Collective:
    kind: str  # one of COLLECTIVE_KINDS
    name: str  # HLO instruction name, e.g. "all-reduce.65"
    shapes: tuple[str, ...]  # result element shapes, e.g. ("f32[3,3,2,8]",)
    bytes: int  # payload bytes (sum over result shapes)
    replica_groups: str  # e.g. "[1,8]<=[8]"
    op_name: str  # metadata op_name (jax provenance), may be ""
    computation: str = ""  # enclosing HLO computation (for loop-body checks)


def while_body_computations(hlo_text: str) -> set[str]:
    """Names of computations that are while-loop bodies (lax.scan /
    lax.while_loop lower to these). A collective whose ``computation`` is in
    this set executes ONCE PER TRIP, so static inventories count it once but
    a bytes-per-execution estimate must multiply by the trip count — see
    experiments/collective_audit.py, which reports loop-body collectives
    separately for exactly this reason. Nested scans are covered because
    every while instruction's ``body=`` lands in the set regardless of which
    computation the while itself sits in."""
    return set(_WHILE_BODY_RE.findall(hlo_text))


def _parse_result_shapes(result_type: str) -> tuple[list[str], int]:
    shapes = []
    total = 0
    for sm in _SHAPE_RE.finditer(result_type):
        dtype, dims = sm.group(1), sm.group(2)
        if dtype not in _DTYPE_BYTES:
            continue
        shapes.append(f"{dtype}[{dims}]")
        total += _shape_bytes(dtype, dims)
    return shapes, total


def collective_inventory(hlo_text: str) -> list[Collective]:
    """All communication collectives in an optimized-HLO dump, in program
    order. Use ``compiled.as_text()`` from an AOT ``.lower(...).compile()``.
    """
    lines = hlo_text.splitlines()
    # pass 1: each async pair's true payload is the -done result (the start's
    # own tuple is backend-dependent: (operand, result) for all-gather-start,
    # bare result for all-reduce-start on some backends)
    done_bytes: dict[str, tuple[tuple[str, ...], int]] = {}
    for line in lines:
        d = _DEF_RE.match(line)
        if d is None:
            continue
        dn = _DONE_RE.search(line, d.end())
        if dn is None:
            continue
        shapes, total = _parse_result_shapes(line[d.end() : dn.start()])
        done_bytes[dn.group(1)] = (tuple(shapes), total)

    out: list[Collective] = []
    comp = ""
    for line in lines:
        cm = _COMP_RE.match(line)
        if cm is not None:
            comp = cm.group(1)
            continue
        d = _DEF_RE.match(line)
        if d is None:
            continue
        # the kind token sits between the result TYPE and its operand list;
        # searching from the end of the "=" finds it before any metadata
        # (op_name strings live after the operand list)
        k = _KIND_RE.search(line, d.end())
        if k is None:
            continue
        name, kind, start = d.group(1), k.group(1), k.group(2)
        # a "-done" definition is the completion of a "-start" already
        # counted; its own name carries the kind so _KIND_RE won't match it
        # (the "-done(" suffix fails "(-start)?\(")
        shapes, total = _parse_result_shapes(line[d.end() : k.start()])
        if start:
            if name in done_bytes:
                shapes, total = done_bytes[name]
                shapes = list(shapes)
            else:
                # unmatched start (truncated dump): fall back to halving the
                # start tuple — exact for the (operand, result) duplicate
                # form, approximate otherwise
                total //= 2
        # iota form "[G,S]<=[8]" (with optional transpose suffix) or the
        # explicit "{{0,1},{2,3}}" form; both contain commas, so capture up
        # to the next ", key=" attribute instead of the next comma
        rg = re.search(r"replica_groups=(.+?)(?=, [a-z_]+=|, metadata|$)", line)
        op = re.search(r'op_name="([^"]*)"', line)
        out.append(
            Collective(
                kind=kind,
                name=name,
                shapes=tuple(shapes),
                bytes=total,
                replica_groups=rg.group(1) if rg else "",
                op_name=op.group(1) if op else "",
                computation=comp,
            )
        )
    return out


def group_shape(c: Collective) -> tuple[int, int] | None:
    """(num_groups, group_size) of a collective's replica groups, or None
    when the instruction carries none (collective-permute uses
    source_target_pairs instead).

    On a (data, model) mesh this classifies the communication axis: with
    data=D, model=M, a data-axis reduction has (num_groups=M, size=D) and a
    model-axis psum has (num_groups=D, size=M).
    """
    rg = c.replica_groups
    m = re.match(r"\[(\d+),(\d+)\]<=", rg)
    if m:
        return int(m.group(1)), int(m.group(2))
    if rg.startswith("{{"):
        groups = re.findall(r"\{([\d,]+)\}", rg)
        if groups:
            return len(groups), len(groups[0].split(","))
    return None


def inventory_summary(inv: Iterable[Collective]) -> dict[str, dict[str, int]]:
    """{kind: {"count": n, "bytes": payload}} over an inventory."""
    out: dict[str, dict[str, int]] = {}
    for c in inv:
        d = out.setdefault(c.kind, {"count": 0, "bytes": 0})
        d["count"] += 1
        d["bytes"] += c.bytes
    return out


def format_inventory(inv: Iterable[Collective]) -> str:
    """Human-readable table (used by experiments/collective_audit.py and the
    docs/PERFORMANCE.md bytes-moved table)."""
    lines = []
    for c in inv:
        shapes = ", ".join(c.shapes[:4]) + (", ..." if len(c.shapes) > 4 else "")
        lines.append(
            f"{c.kind:<20} {c.bytes/1e6:>10.3f} MB  groups={c.replica_groups:<14} "
            f"{shapes}  <- {c.op_name[:80]}"
        )
    if not lines:
        lines.append("(no collectives: single-device program)")
    return "\n".join(lines)
