"""Collective-traffic audit: what a compiled distributed solve moves per step.

VERDICT r1 item 5: real N≥2 hardware is unreachable in this environment, so
the quantitative evidence for the distributed design is extracted from the
**compiled HLO** on a virtual CPU mesh — the collective instructions XLA
actually emits (op kind, tensor shape, byte size), which are mesh-topology
facts independent of the executing backend. Collectives inside a `while`
body execute once per Lanczos step, so static instances map 1:1 to per-step
traffic.

Reconciles the PERF.md model ("~5 KB psum vs ~2 MB all-gather per step" at
500k arcs): see `scripts/collective_audit.py` for the recorded table and
`tests/test_collectives.py` for the pinned invariants.
"""

from __future__ import annotations

import dataclasses
import re
from typing import List

__all__ = ["CollectiveOp", "collectives_in_hlo", "collectives_in_stablehlo",
           "collective_bytes"]

_COLLECTIVES = ("all-gather", "all-reduce", "reduce-scatter",
                "collective-permute", "all-to-all")

_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2,
                "u16": 2, "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
                "u64": 8}

_SHAPE_RE = re.compile(r"=\s*(?:\()?\s*(\w+)\[([\d,]*)\]")


@dataclasses.dataclass(frozen=True)
class CollectiveOp:
    kind: str  # e.g. "all-gather"
    dtype: str
    shape: tuple
    count: int

    @property
    def bytes_out(self) -> int:
        n = 1
        for d in self.shape:
            n *= d
        return n * _DTYPE_BYTES.get(self.dtype, 4) * self.count


def collectives_in_hlo(hlo_text: str) -> List[CollectiveOp]:
    """Parse collective instructions (kind, output dtype/shape, count) out of
    a compiled HLO module's text. Tuple-shaped outputs report the first
    element (XLA's combined collectives); `-start/-done` pairs are counted
    once (on the `-start`)."""
    found = {}
    for line in hlo_text.splitlines():
        for kind in _COLLECTIVES:
            if f"{kind}(" in line or f"{kind}-start(" in line:
                m = _SHAPE_RE.search(line)
                if not m:
                    continue
                dtype = m.group(1)
                shape = tuple(int(x) for x in m.group(2).split(",") if x)
                key = (kind, dtype, shape)
                found[key] = found.get(key, 0) + 1
    return [CollectiveOp(kind=k, dtype=d, shape=s, count=c)
            for (k, d, s), c in sorted(found.items())]


_STABLEHLO_COLLECTIVES = ("all_gather", "all_reduce", "reduce_scatter",
                          "collective_permute", "all_to_all")
_STABLEHLO_DTYPES = {"f32": "f32", "f64": "f64", "bf16": "bf16", "f16": "f16",
                     "i32": "s32", "i64": "s64", "i16": "s16", "i8": "s8",
                     "i1": "pred", "ui32": "u32"}
_STABLEHLO_RE = re.compile(
    r'"stablehlo\.(\w+)"[^\n]*?->\s*tensor<([0-9x]*)(\w+)>')
_GROUPS_RE = re.compile(r"replica_groups\s*=\s*dense<\[\[([^\]]*)\]")


def collectives_in_stablehlo(stablehlo_text: str) -> List[CollectiveOp]:
    """Parse collective ops out of LOWERED (pre-compile) StableHLO text —
    `jitted.lower(...).as_text()`. Lowering skips the XLA backend compile
    entirely, which is what makes an 8-device audit of the interpret-mode
    double-float sharded kernels tractable (their XLA-CPU *compile*
    explodes superlinearly past 4 devices — `__graft_entry__.py`).

    The `shape` reported is the op's RESULT tensor shape (post-gather:
    leading axis = device count for an all_gather over the full group);
    counts aggregate identical (kind, dtype, shape) instances. Collectives
    inside a `stablehlo.while` body appear once per static call site, so
    counts map to per-step traffic exactly like `collectives_in_hlo`.
    """
    found = {}
    for line in stablehlo_text.splitlines():
        names = [c for c in _STABLEHLO_COLLECTIVES
                 if f'"stablehlo.{c}"' in line]
        if not names:
            continue
        m = _STABLEHLO_RE.search(line)
        if m and m.group(1) in _STABLEHLO_COLLECTIVES:
            kind = m.group(1).replace("_", "-")
            shape = tuple(int(x) for x in m.group(2).split("x") if x)
            dtype = _STABLEHLO_DTYPES.get(m.group(3), m.group(3))
        else:
            # region-carrying form (e.g. all_reduce): result type lands on
            # a later line — still record the op so "none of kind X"
            # assertions cannot silently pass on a parse miss
            kind = names[0].replace("_", "-")
            shape, dtype = (), "unknown"
        gm = _GROUPS_RE.search(line)
        group = len(gm.group(1).split(",")) if gm else 0
        key = (kind, dtype, shape, group)
        found[key] = found.get(key, 0) + 1
    return [CollectiveOp(kind=k, dtype=d, shape=s, count=c)
            for (k, d, s, _g), c in sorted(found.items())]


def collective_bytes(ops: List[CollectiveOp], kinds=None) -> int:
    """Total output bytes across (optionally a subset of) collective ops."""
    return sum(o.bytes_out for o in ops
               if kinds is None or o.kind in kinds)
