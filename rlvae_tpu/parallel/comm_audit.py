"""HLO communication audit for the sharded training paths.

The reference has no distributed communication at all (SURVEY.md §2c: single
GPU, no NCCL); this framework's replacement is XLA-inserted collectives over
ICI (pjit/GSPMD for the DP and DP x TP steps, explicit ``lax.pmean`` inside
the shard_map epoch scan).  Those collectives are invisible in Python — a
sharding regression (e.g. a spec change that makes GSPMD all-gather the
parameters every step) would silently multiply per-step ICI traffic without
failing any numerical test.

This module makes the communication plan inspectable: lower + compile a
function under its real input shardings, parse the optimized HLO, and return
per-opcode counts and payload bytes.  ``scripts/comm_audit.py`` records the
audit as a committed artifact; ``tests/test_comm_audit.py`` pins the
invariants.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Sequence

COLLECTIVE_OPCODES = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

# one typed array shape, e.g. ``f32[512,64]{1,0}`` or ``s32[]``
_SHAPE_RE = re.compile(r"\b([a-z]+\d*)\[([\d,]*)\]")
# an HLO instruction line: ``%name = <result-shape(s)> opcode(...)``
_INSTR_RE = re.compile(r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(.*)$")


def _shape_bytes(dtype: str, dims: str) -> int:
    size = _DTYPE_BYTES.get(dtype)
    if size is None:  # token/opaque/tuple placeholder: no payload
        return 0
    n = 1
    if dims:
        for d in dims.split(","):
            n *= int(d)
    return n * size


def _result_bytes(result_part: str) -> int:
    """Total payload bytes of an instruction's result (handles tuples)."""
    return sum(_shape_bytes(dt, dims) for dt, dims in _SHAPE_RE.findall(result_part))


def collective_summary(hlo_text: str) -> Dict[str, Dict[str, Any]]:
    """Per-opcode ``{count, bytes}`` for every collective in an HLO dump.

    ``bytes`` sums the *result* payload of each collective instruction — for
    all-reduce that equals the reduced tensor bytes; for all-gather the
    gathered (output) bytes; counts are static instruction counts, so a
    collective inside a compiled loop body counts once regardless of trip
    count (the per-step traffic is what matters for a train step that is
    itself the loop body).
    """
    out: Dict[str, Dict[str, Any]] = {
        op: {"count": 0, "bytes": 0} for op in COLLECTIVE_OPCODES
    }
    for line in hlo_text.splitlines():
        m = _INSTR_RE.match(line)
        if not m:
            continue
        rhs = m.group(1)
        # opcode is the first bare word after the result shape(s); find it by
        # scanning for " <opcode>(" with opcode in our set (fast + robust to
        # attribute noise like channel_id / replica_groups)
        for op in COLLECTIVE_OPCODES:
            # match e.g. "all-reduce(", "all-reduce-start(" (async pairs
            # split the op; count the -start half only, -done carries the
            # same payload)
            if re.search(rf"\s{op}(?:-start)?\(", rhs):
                result_part = rhs.split(f" {op}", 1)[0]
                out[op]["count"] += 1
                out[op]["bytes"] += _result_bytes(result_part)
                break
    return out


def audit(fn: Callable, args: Sequence[Any]) -> Dict[str, Any]:
    """Compile ``fn(*args)`` (capturing the args' real shardings) and return
    its collective summary plus totals.  ``fn`` may already be jitted (it is
    lowered as-is, keeping donation/sharding attributes) or a plain callable.
    """
    import jax

    if not hasattr(fn, "lower"):
        fn = jax.jit(fn)
    compiled = fn.lower(*args).compile()
    summary = collective_summary(compiled.as_text())
    total_count = sum(v["count"] for v in summary.values())
    total_bytes = sum(v["bytes"] for v in summary.values())
    return {
        "collectives": summary,
        "total_count": total_count,
        "total_bytes": total_bytes,
    }


def param_bytes(tree) -> int:
    import jax

    return sum(
        leaf.size * leaf.dtype.itemsize for leaf in jax.tree_util.tree_leaves(tree)
    )
