"""Morton (Z-order) spatial sort for locality-aware kernel tiling.

The tiled kNN kernel (`pallas_knn.knn_indices_tiled`) carries a per-chunk
pruning gate: the 2k extraction passes are skipped whenever no row of the
query tile can improve on its current k-th neighbor
(`pallas_knn.py::_knn_kernel` `improves`). On unsorted clouds the gate
almost never fires — a 256-query tile spans the whole scene, so some row
improves on nearly every chunk. Sorting BOTH the queries and the
candidates along a Z-order curve makes tiles spatially compact: each
query tile's neighbors concentrate in a few candidate chunks, the head
converges after those, and the remaining chunks cost only the distance
evaluation (selection skipped) — the classic locality win the CUDA
reference gets implicitly from scan-ordered radar returns
(`src/lib/src/interpolate_gpu.cu:9-79` brute-forces regardless; this is
a TPU-side improvement, not a parity feature).

Per-row results are order-independent (every op downstream of the sort
is row-wise), so sorting queries + unsorting the final stage output is
exact up to kNN tie order: ties now resolve to the lowest MORTON-sorted
index instead of the lowest original index — the same rounding-freedom
class as the expanded-form distances (see pallas_knn docstring). Tests
pin sorted-vs-unsorted equivalence away from ties.

Quantization is fixed-range (no data-dependent min/max reduces):
coordinates are clipped to ±`extent` metres and quantized to 10 bits per
axis → a 30-bit Z-code. Radar returns are ≤ ~300 m, so the default
512 m extent loses no resolution (cell ≈ 1 m; equal codes only make the
ORDER within a cell arbitrary — selection math is unaffected).
"""

from __future__ import annotations

import jax.numpy as jnp

#: A/B switch for the >4096 split correlator path (models/correlator.py).
SPLIT_SPATIAL_SORT = True


def _spread10(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of int32 v: bit i → bit 3i (Z-order)."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton_code(xyz: jnp.ndarray, extent: float = 512.0) -> jnp.ndarray:
    """(N, 3) float coords → (N,) int32 30-bit Z-order codes."""
    q = jnp.clip((xyz.astype(jnp.float32) + extent)
                 * (1024.0 / (2.0 * extent)), 0.0, 1023.0)
    q = q.astype(jnp.int32)
    return ((_spread10(q[:, 0]) << 2) | (_spread10(q[:, 1]) << 1)
            | _spread10(q[:, 2]))


def morton_perm(xyz: jnp.ndarray, mask: jnp.ndarray | None = None,
                extent: float = 512.0) -> jnp.ndarray:
    """Permutation sorting rows along the Z-curve; invalid rows last.

    Stable argsort → deterministic. Returns (N,) int32 `perm` such that
    `xyz[perm]` is Z-ordered with masked-out rows at the end.
    """
    key = morton_code(xyz, extent)
    if mask is not None:
        key = jnp.where(mask, key, jnp.int32(0x7FFFFFFF))
    return jnp.argsort(key).astype(jnp.int32)


def invert_perm(perm: jnp.ndarray) -> jnp.ndarray:
    """inv with inv[perm[i]] = i (unsort gather indices)."""
    n = perm.shape[0]
    return jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))
