"""Checkpoint/resume for the two-pass pipeline.

The reference's ``LanczosDecomposition`` is "a complete, cloneable capture of
pass-one state enabling arbitrary work between passes"
(``src/algorithms/mod.rs:88-108``, SURVEY §5). Here that capture is made
durable: pass one can run on one job/host, the decomposition saved, and pass
two resumed later (or elsewhere — it is backend- and shard-agnostic, being a
few KB of scalars). This is the natural checkpoint boundary of the algorithm:
pass two is a pure replay of stored coefficients.

Bit-fidelity caveat: the replay is bit-identical to pass one only when pass
two runs on the SAME operator layout (same backend, same library version —
internal slot orderings are not part of the checkpoint format). Across
layouts/versions the resumed pass two is still a correct reconstruction, but
agreement is at rounding tolerance rather than bitwise.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from two_pass_lanczos_tpu.algorithms.core import LanczosDecomposition

__all__ = ["save_decomposition", "load_decomposition"]

_FORMAT_VERSION = 1


def _npz_path(path) -> Path:
    # np.savez silently appends ".npz" to extension-less paths while np.load
    # opens the literal path; normalize so save/load always agree.
    path = Path(path)
    return path if path.suffix == ".npz" else path.with_suffix(
        path.suffix + ".npz")


def save_decomposition(path, decomposition: LanczosDecomposition) -> None:
    """Serialize a decomposition to ``.npz`` (portable, dtype-preserving)."""
    path = _npz_path(path)
    np.savez(
        path,
        alphas=np.asarray(decomposition.alphas),
        betas=np.asarray(decomposition.betas),
        steps_taken=np.asarray(decomposition.steps_taken),
        b_norm=np.asarray(decomposition.b_norm),
        meta=json.dumps({"version": _FORMAT_VERSION}),
    )


def load_decomposition(path) -> LanczosDecomposition:
    path = _npz_path(path)
    with np.load(Path(path), allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        if meta.get("version") != _FORMAT_VERSION:
            raise ValueError(f"unsupported decomposition format: {meta}")
        return LanczosDecomposition(
            alphas=jnp.asarray(z["alphas"]),
            betas=jnp.asarray(z["betas"]),
            steps_taken=jnp.asarray(z["steps_taken"]),
            b_norm=jnp.asarray(z["b_norm"]),
        )
