"""Tiled k-nearest-neighbor Pallas kernel for large point clouds.

The dense `ops.neighborhood.knn` materializes the full (N, M) distance
matrix in HBM — fine at the live VoD budget (512×512) but 1 GB at the 16k
stretch configs (SURVEY.md §5 "long-context" scaling: the reference's
`knn_point` / cost volume are O(N²), model_utils.py:85-99). This kernel
streams point tiles through VMEM flash-attention-style: each grid step
owns one query tile, loops over point tiles, computes the (TQ, TP) distance
block on the MXU, and folds it into a running top-k head via k rounds of
masked min-reduction (VPU) — nothing N×M ever leaves VMEM.

Mosaic-specific structure notes (hard-won):
  * loops are lax.while_loop, NOT fori_loop — Mosaic fully unrolls
    static-trip-count loops and stack-allocates every iteration's
    temporaries simultaneously (vmem OOM at k=16, TP=1024);
  * the running head (TQ, k) and the tile pool (TQ, TP) are separate
    scratch refs — a combined (TQ, k+TP) pool needs k-offset subtile
    slicing, which is lane-unaligned for k < 128;
  * no dynamic_update_slice on values (unimplemented in Mosaic) — output
    columns are written via one-hot jnp.where selects.

Only neighbor INDICES come out of the kernel (integer outputs — no VJP
needed); callers recompute the k gathered distances outside in jnp, which
is exact and differentiable.

Grid: (N / TQ,). Defaults TQ=128, TP=1024.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e10    # plain float: jnp scalars would be captured tracers in pallas
_BIGI = 2 ** 30


def _knn_kernel(kdyn_ref, q_ref, p_ref, pm_ref, idx_ref, hd_ref, hi_ref,
                td_ref, *, k: int, tp: int, m: int):
    """hd/hi: (TQ, k) running top-k head. td: (TQ, TP) tile distances.

    kdyn_ref: (1, 1) SMEM scalar holding k. The select loop bound reads it
    instead of the static k so Mosaic cannot constant-fold and unroll the
    loop (unrolling stack-allocates all k iterations' temporaries at once:
    ~4 MB × k ≈ 65 MB of scoped vmem at TP=1024).
    """
    q = q_ref[:].astype(jnp.float32)                    # (TQ, 3)
    tq = q.shape[0]
    q2 = jnp.sum(q * q, axis=1, keepdims=True)          # (TQ, 1)
    n_tiles = m // tp
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (tq, k), 1)

    hd_ref[:] = jnp.full((tq, k), _BIG, jnp.float32)
    hi_ref[:] = jnp.zeros((tq, k), jnp.int32)

    def tile_cond(t):
        return t < n_tiles

    def tile_body(t):
        p = p_ref[pl.ds(t * tp, tp), :].astype(jnp.float32)   # (TP, 3)
        pm = pm_ref[pl.ds(t * tp, tp), :]                     # (TP, 1)
        # EXACT op order of neighborhood.square_distance: -2qp, then +|q|²,
        # then +|p|² — a different association is ±1ulp off and flips the
        # ordering of near-equal neighbors vs the dense path
        d2 = -2.0 * jax.lax.dot_general(
            q, p, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        d2 = d2 + q2
        d2 = d2 + jnp.sum(p * p, axis=1)[None, :]
        d2 = jnp.maximum(d2, 0.0)
        td_ref[:] = jnp.where(pm[:, 0][None, :] > 0.5, d2, _BIG)
        base = t * tp    # tile column offset; col = base + local iota

        def select_cond(carry):
            return carry[0] < kdyn_ref[0, 0]

        def select(carry):
            j, out_d, out_i = carry                           # (TQ, k)
            hd, hi = hd_ref[:], hi_ref[:]
            td = td_ref[:]
            ti = base + jax.lax.broadcasted_iota(jnp.int32, (tq, tp), 1)
            md = jnp.minimum(jnp.min(hd, axis=1), jnp.min(td, axis=1))
            # lowest index among ties across both pools (top_k / CUDA
            # insertion-sort tie order); head & tile indices are disjoint
            hit_h = hd == md[:, None]
            hit_t = td == md[:, None]
            mi = jnp.minimum(
                jnp.min(jnp.where(hit_h, hi, _BIGI), axis=1),
                jnp.min(jnp.where(hit_t, ti, _BIGI), axis=1))
            hd_ref[:] = jnp.where(hit_h & (hi == mi[:, None]), _BIG, hd)
            td_ref[:] = jnp.where(hit_t & (ti == mi[:, None]), _BIG, td)
            # one-hot column update (dynamic_update_slice doesn't lower)
            write = out_cols == j
            out_d = jnp.where(write, md[:, None], out_d)
            out_i = jnp.where(write, mi[:, None], out_i)
            return j + 1, out_d, out_i

        _, best_d, best_i = jax.lax.while_loop(
            select_cond, select,
            (jnp.int32(0), jnp.zeros((tq, k), jnp.float32),
             jnp.zeros((tq, k), jnp.int32)))
        # merged top-k becomes the head for the next tile
        hd_ref[:] = best_d
        hi_ref[:] = best_i
        return t + 1

    jax.lax.while_loop(tile_cond, tile_body, jnp.int32(0))
    idx_ref[:] = hi_ref[:]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit,
                   static_argnames=("k", "tq", "tp", "interpret",
                                    "vmem_limit_bytes"))
def knn_indices_tiled(query: jnp.ndarray, points: jnp.ndarray,
                      points_mask: jnp.ndarray | None = None, *,
                      k: int, tq: int = 128, tp: int = 1024,
                      vmem_limit_bytes: int = 64 * 1024 * 1024,
                      interpret: bool = False) -> jnp.ndarray:
    """Indices of the k nearest valid `points` per `query` row.

    Args:
      query: (N, 3) float.
      points: (M, 3) float.
      points_mask: optional (M,) bool.
      k: neighbor count (static).
      tq/tp: query/point tile sizes (static).
      interpret: run in the Pallas interpreter (CPU testing).
    Returns:
      (N, k) int32, ascending by distance, ties to the lowest index.
      Rows beyond the valid point count repeat the nearest valid index
      (same padding rule as ops.neighborhood.knn); all-invalid → 0.
    """
    n, m = query.shape[0], points.shape[0]
    n_pad, m_pad = _round_up(n, tq), _round_up(m, max(tp, 128))
    tp = min(tp, m_pad)

    qp = jnp.zeros((n_pad, 3), jnp.float32).at[:n].set(
        query.astype(jnp.float32))
    pp = jnp.zeros((m_pad, 3), jnp.float32).at[:m].set(
        points.astype(jnp.float32))
    if points_mask is None:
        pm = (jnp.arange(m_pad) < m)
    else:
        pm = jnp.zeros((m_pad,), bool).at[:m].set(points_mask)
    pmf = pm.astype(jnp.float32)[:, None]

    idx = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, tp=tp, m=m_pad),
        grid=(n_pad // tq,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tq, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, k), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tq, k), jnp.float32),
            pltpu.VMEM((tq, k), jnp.int32),
            pltpu.VMEM((tq, tp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jnp.full((1, 1), k, jnp.int32), qp, pp, pmf)[:n]

    # first-hit padding for < k valid points (matches neighborhood.knn)
    nbr_valid = jnp.take(pm, idx)
    fallback = jnp.where(nbr_valid[:, :1], idx[:, :1], 0)
    return jnp.where(nbr_valid, idx, fallback).astype(jnp.int32)


def knn_tiled(k: int, query: jnp.ndarray, points: jnp.ndarray,
              points_mask: jnp.ndarray | None = None,
              interpret: bool = False):
    """Drop-in replacement for ops.neighborhood.knn at large N·M.

    Returns (dist2, idx) like the dense version; dist2 is recomputed from
    the gathered neighbors (differentiable, never materializes N×M).
    """
    # the kernel is selection-only; block autodiff from tracing into it
    idx = knn_indices_tiled(jax.lax.stop_gradient(query),
                            jax.lax.stop_gradient(points),
                            points_mask, k=k, interpret=interpret)
    nbr = jnp.take(points.astype(jnp.float32), idx, axis=0)  # (N, k, 3)
    d = query.astype(jnp.float32)[:, None, :] - nbr
    # repeated-fallback slots report the fallback's true distance, which is
    # exactly what the dense path's padded gather produces
    dist2 = jnp.sum(d * d, axis=-1)
    return dist2, idx
