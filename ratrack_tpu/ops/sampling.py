"""Masked farthest point sampling and gathering.

TPU-native replacement for the reference CUDA kernels in
`src/lib/src/sampling_gpu.cu` (furthest_point_sampling: 94-251,
gather_points: 8-83).

Key reference semantics preserved:
  * FPS is seeded at index 0 (sampling_gpu.cu:113-115).
  * When `npoint` exceeds the number of (valid) points, the sampled set
    contains every valid point once plus deterministic duplicates — the
    reference has the same behaviour because VoD radar frames usually have
    fewer points than `npoint=512`.

The identity fast path: the live RaTrack config uses npoint == padded size
(512), in which case FPS selects *all* valid points and only the ordering /
duplicate pattern differs. Since every downstream consumer (per-center MLPs,
max-pool, 3-NN interpolation) is order-invariant over the center set,
`identity_sample` returns `arange` clipped to the valid count — removing a
~512-iteration sequential loop from the step. Set `exact_fps=True` in the
model config to force true FPS everywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def furthest_point_sample(xyz: jnp.ndarray, npoint: int,
                          mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Iterative farthest point sampling over valid points.

    Args:
      xyz: (N, 3) points (padding rows arbitrary but finite).
      npoint: number of samples (static).
      mask: optional (N,) bool validity.
    Returns:
      (npoint,) int32 indices. Seeded at the first valid index; invalid
      points are never selected (provided at least one point is valid).
    """
    n = xyz.shape[0]
    # jnp.asarray, not .astype: a host ndarray input would stay NumPy and
    # xyz[<traced index>] inside the loop then fails at trace time
    xyz = jnp.asarray(xyz, jnp.float32)
    if jax.default_backend() == "tpu" and n % 128 == 0 and npoint > 1:
        # fused kernel: the XLA loop below costs 2·npoint tiny
        # launch-overhead-bound fusions (~4 µs each — ~2 ms/frame at the
        # 8k stretch); the kernel runs the same loop in one program.
        # Selection is bit-matched (pallas_fps_kernel.py docstring).
        from .pallas_fps_kernel import fps_indices_fused
        return fps_indices_fused(xyz, npoint, mask)
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)
    # running min-distance; invalid points pinned to -1 so argmax skips them
    temp = jnp.where(mask, jnp.float32(1e10), jnp.float32(-1.0))
    # reference seeds at raw index 0; with padding at the tail the first
    # valid index is 0 whenever any point is valid.
    seed = jnp.argmax(mask).astype(jnp.int32)
    out0 = jnp.zeros((npoint,), jnp.int32).at[0].set(seed)

    def body(j, state):
        temp, old, out = state
        d = jnp.sum((xyz - xyz[old]) ** 2, axis=-1)
        temp = jnp.where(mask, jnp.minimum(temp, d), -1.0)
        new = jnp.argmax(temp).astype(jnp.int32)
        return temp, new, out.at[j].set(new)

    _, _, out = jax.lax.fori_loop(1, npoint, body, (temp, seed, out0))
    return out


def identity_sample(n: int, npoint: int,
                    mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Order-preserving stand-in for FPS when npoint >= n_valid.

    Returns arange(npoint) with slots beyond the valid count redirected to
    the first valid index (duplicates, like reference FPS when it runs out
    of distinct points). Requires npoint == n for exact cover.
    """
    idx = jnp.arange(npoint, dtype=jnp.int32) % n
    if mask is None:
        return idx
    n_valid = jnp.sum(mask.astype(jnp.int32))
    seed = jnp.argmax(mask).astype(jnp.int32)
    return jnp.where(idx < n_valid, idx, seed)


def identity_gather(points: jnp.ndarray,
                    mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """gather(points, identity_sample(n, n, mask)) without the row gather.

    identity_sample's indices are arange for positions < n_valid and the
    seed (first valid index) elsewhere — so the gather is a row select
    against ONE dynamically-gathered seed row. Bit-identical to the
    gather for any mask (contiguous or not), ~10× cheaper on TPU where
    full row gathers are latency-bound.
    """
    n = points.shape[0]
    if mask is None:
        return points
    n_valid = jnp.sum(mask.astype(jnp.int32))
    seed_row = jnp.take(points, jnp.argmax(mask), axis=0)
    keep = (jnp.arange(n, dtype=jnp.int32) < n_valid)[:, None]
    return jnp.where(keep, points, seed_row[None, :])


def _bf16_parts(v: jnp.ndarray):
    """Split f32 into exactly-bf16-representable parts, Σ parts == v.

    Round-to-nearest bf16 leaves a residual of ≤ 15 significant bits;
    one more split leaves ≤ 6 — so (hi, mid, lo) are each exact in bf16
    and hi + mid + lo reassembles v bit-exactly in f32 (the partial sums
    carry ≤ 18 and ≤ 24 significand bits). Exact for normal f32 inputs
    (|v| ≳ 1e-33; below that the lo part can denormal-flush in bf16 —
    irrelevant for coordinates/features/cotangents).
    """
    hi = v.astype(jnp.bfloat16)
    r = v - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


@jax.custom_vjp
def take_rows_mm(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather (N, C) × (M,) → (M, C) as an exact one-hot matmul.

    Forward: onehot over a 3×-tiled point axis × the stacked bf16 split
    parts (_bf16_parts) in ONE single-pass bf16 MXU dot — each output
    row sums exactly the three products 1.0 × (hi, mid, lo), so it is
    bit-exact to jnp.take for f32/bf16 inputs (equal to the HIGHEST
    one-hot matmul, measured) at 3 effective MXU passes instead of 6.
    Backward (custom VJP): onehotᵀ @ cotangent at HIGHEST — the
    scatter-add the reference hand-writes in CUDA
    (group_points_gpu.cu:51-86) as an MXU matmul; the stacked-bf16 form
    measures SLOWER here (the 3×-contraction one-hot regeneration beats
    the pass saving: 2.9 vs 1.6 ms at the (8,16384,512)×64 train shape).
    Motivation: under grad the take-based gathers plus their scatter-add
    backwards are 55% of the profiled TRAIN step device time on TPU (the
    forwards fuse into the grouped MLP, the scatters do not).
    """
    out, _ = _take_rows_mm_fwd(points, idx)
    return out


def _take_rows_mm_fwd(points, idx):
    n = points.shape[0]
    # clamp to the edge row like jnp.take's default TPU mode — without it
    # an out-of-range index yields an all-zero row and silently breaks
    # the bit-exact-to-take contract (all current callers are in range;
    # the clamp is one cheap elementwise op).
    idx = jnp.clip(idx, 0, n - 1)
    if points.dtype == jnp.bfloat16:   # exact in one un-split pass
        oh = (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :])
        out = jax.lax.dot(oh.astype(jnp.bfloat16), points,
                          preferred_element_type=jnp.float32)
    else:
        oh3 = (idx[:, None] == (jnp.arange(3 * n, dtype=idx.dtype)
                                % n)[None, :]).astype(jnp.bfloat16)
        vstack = jnp.concatenate(
            _bf16_parts(points.astype(jnp.float32)), axis=0)  # (3N, C)
        out = jax.lax.dot(oh3, vstack,
                          preferred_element_type=jnp.float32)
    return out.astype(points.dtype), (points, idx)


def _take_rows_mm_bwd(res, g):
    points, idx = res
    n, dtype = points.shape[0], points.dtype
    oh = (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :])
    dp = jax.lax.dot_general(
        oh.astype(jnp.float32), g.astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    return dp.astype(dtype), None


take_rows_mm.defvjp(_take_rows_mm_fwd, _take_rows_mm_bwd)


# one-hot footprint cap: idx.size × N f32 elements (64 MB). The live
# train shapes (16384 × 512 = 8.4M) pass; 8k-stretch groups (16384 ×
# 8192 = 134M) would blow HBM traffic and fall back to jnp.take.
_MM_GATHER_MAX_ELEMS = 16 * 1024 * 1024


def _use_mm_gather(idx_size: int, n: int) -> bool:
    import jax as _jax
    return (_jax.default_backend() == "tpu"
            and idx_size * n <= _MM_GATHER_MAX_ELEMS)


def gather(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather: (N, C) × (M,) -> (M, C).

    The reference implements forward + hand-written scatter-add backward in
    CUDA (sampling_gpu.cu:8-83). On TPU this routes through the one-hot
    matmul (bit-exact; see take_rows_mm); elsewhere `jnp.take`, whose
    autodiff produces exactly that scatter-add.
    """
    if _use_mm_gather(idx.size, points.shape[0]):
        return take_rows_mm(points, idx)
    return jnp.take(points, idx, axis=0)


def group(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Group gather: (N, C) × (M, S) -> (M, S, C).

    Reference: group_points (group_points_gpu.cu:8-86), backward is
    scatter-add. On TPU: one-hot matmul (bit-exact, MXU both directions —
    see take_rows_mm; the scatter-add backward of jnp.take was 55% of the
    train step); elsewhere jnp.take.
    """
    if _use_mm_gather(idx.size, points.shape[0]):
        m, s = idx.shape
        return take_rows_mm(points, idx.reshape(-1)).reshape(
            m, s, points.shape[-1])
    return jnp.take(points, idx, axis=0)
