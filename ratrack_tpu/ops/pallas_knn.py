"""Tiled k-nearest-neighbor Pallas kernel for large point clouds.

The dense `ops.neighborhood.knn` materializes the full (N, M) distance
matrix in HBM — fine at the live VoD budget (512×512) but 1 GB at the 16k
stretch configs (SURVEY.md §5 "long-context" scaling: the reference's
`knn_point` / cost volume are O(N²), model_utils.py:85-99). This kernel
streams point tiles through VMEM flash-attention-style: each grid step
owns one query tile and loops over point chunks.

Selection is the blocked-tournament formulation that beats everything
else in XLA too (ops.neighborhood.top_k_blocked): per chunk, k
extraction passes run over the CHUNK ONLY (the (TQ, TP) block lives in
registers/stack for the whole k-loop), and the chunk's k finalists merge
with the running head through a second, tiny extraction over (TQ, 2k).
The previous version folded the head into every full-tile pass and
re-wrote the (TQ, TP) scratch per pass — measured 63 ms at 8192×8192
against 11 ms for the chunked-XLA path; this formulation wins instead
(see NOTES_ROUND3.md for numbers).

Tie order matches the dense path exactly: within a chunk the stable
first-max extraction picks the lowest local index; at the merge the head
(earlier, lower, already-ranked indices) precedes the chunk finalists,
so equal distances resolve to the lowest global index — the
torch.topk / CUDA insertion-sort order.

Mosaic-specific structure notes (hard-won):
  * the chunk loop is a fori_loop with a VALUE carry for the head —
    (TQ, k) is small; the k-pass extraction loop is UNROLLED Python (its
    per-pass temporaries are what Mosaic stack-allocates — ~k·TQ·TP·4 B,
    affordable under the raised vmem budget and much faster than the
    serialized while_loop);
  * no dynamic_update_slice on values — extraction outputs accumulate
    into lists and concatenate (static shapes);
  * distance uses the EXACT op order of neighborhood.square_distance
    (-2qp at HIGHEST, then +|q|², then +|p|², clamp) so near-tie
    neighbor ordering is bit-identical to the dense path.

Only neighbor INDICES come out of the kernel (integer outputs — no VJP
needed); callers recompute the k gathered distances outside in jnp,
which is exact and differentiable.

Grid: (N / TQ,). Defaults TQ=256, TP=512.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e10    # plain float: jnp scalars would be captured tracers in pallas


def _extract_k(keys, idxf, k):
    """k lowest-index-tie max-extraction passes over the last axis.

    keys (TQ, W) descending-priority (use -d²); idxf (TQ, W) global ids
    AS f32 (exact for ids < 2^24 — 16M points, far past the stretch
    budget). Returns (vals, ids) (TQ, k) f32 in rank order.

    Pure max/min reduces: Mosaic's argmax lowers through a slow
    cross-lane index-reduce helper; selecting the winner as the MINIMUM
    id among key ties needs only a where + min-reduce and gives exactly
    the lowest-index tie order of the dense path."""
    vals, ids = [], []
    x = keys
    for _ in range(k):
        m = jnp.max(x, axis=1, keepdims=True)
        jid = jnp.min(jnp.where(x == m, idxf, _BIG), axis=1,
                      keepdims=True)
        vals.append(m)
        ids.append(jid)
        x = jnp.where(idxf == jid, -_BIG, x)
    return (jnp.concatenate(vals, axis=1),
            jnp.concatenate(ids, axis=1))


def _knn_kernel(q_ref, xt_ref, sqx_ref, pm_ref, bbox_ref, idx_ref,
                keys_ref, *, k: int, tp: int, m: int, n_q: int):
    q = q_ref[:].astype(jnp.float32)                    # (TQ, 3)
    tq = q.shape[0]
    q2 = jnp.sum(q * q, axis=1, keepdims=True)          # (TQ, 1)
    n_chunks = m // tp

    # locality-first chunk order: start at the candidate chunk sitting
    # at the same FRACTION of its cloud as this query tile, then wrap.
    # With both clouds Z-order sorted (ops/morton.py) the head converges
    # within the first few (spatially nearest) chunks and the pruning
    # gates skip the rest; scanning 0..n_chunks-1 instead forces every
    # chunk BEFORE the tile's own region to "improve" a still-empty
    # head. Selection is visit-order independent — extraction and merge
    # both break key ties by the MINIMUM global id (_extract_k), so the
    # result is bit-identical for any chunk order (tests pin this).
    c0 = (pl.program_id(0) * (tq * n_chunks)) // n_q

    # query-tile bounding sphere for the chunk-level gate. Computed over
    # ALL rows — padding queries in a mixed tile only inflate the radius
    # (less pruning, never wrong).
    c_t = jnp.mean(q, axis=0, keepdims=True)            # (1, 3)
    r_t = jnp.sqrt(jnp.max(jnp.sum((q - c_t) * (q - c_t), axis=1)))

    def chunk(t, carry):
        hd, hi = carry                                  # (TQ, k) head
        tc = jax.lax.rem(c0 + t, n_chunks)

        # GATE 1 — bounding spheres (skips the whole chunk, d² and all):
        # for any query in this tile and valid candidate in the chunk,
        # dist >= dist(centers) - r_tile - r_chunk. Skip when even that
        # lower bound cannot beat the LEAST-converged row's k-th key.
        # The 0.99 deflation dwarfs every f32 rounding difference vs the
        # kernel's expanded-form d², keeping the bound conservative
        # (selection stays bit-identical; tests pin it). All-invalid
        # chunks carry a far-sentinel centroid -> lb² ~ 1e18 -> skipped
        # even while heads are unfilled (they have nothing to offer).
        # While any row's head is unfilled (hd_k == -_BIG) a LEGIT chunk
        # is never skipped: the range contract (d² < 5e9, docstring)
        # bounds 0.99·lb² < 5e9 < _BIG for every valid pair.
        cb = bbox_ref[pl.ds(tc, 1), :]                  # (1, 4)
        dcc = jnp.sqrt(jnp.sum(
            (c_t - cb[:, 0:3]) * (c_t - cb[:, 0:3])))
        lb = jnp.maximum(dcc - r_t - jnp.max(cb[:, 3:4]), 0.0)
        # a chunk can improve SOME row iff its best possible key beats
        # the EASIEST row's current k-th key — the minimum over rows
        worst = jnp.min(hd[:, k - 1:k])
        chunk_can_improve = (-0.99 * lb * lb) > worst

        def eval_chunk(carry):
            hd, hi = carry
            js = pl.ds(tc * tp, tp)
            xs = xt_ref[:, js]                          # (3, TP)
            # expanded-form distance as plain VPU FMAs (the K=3 HIGHEST
            # matmul per chunk measured ~140 µs — it dominated the
            # whole kernel). Same rounding-freedom class vs the dense
            # path as the SA kernels: near-equal neighbors may order
            # differently.
            prod = (q[:, 0:1] * xs[0:1, :] + q[:, 1:2] * xs[1:2, :]
                    + q[:, 2:3] * xs[2:3, :])           # (TQ, TP)
            d2 = jnp.maximum(q2 + sqx_ref[:, js] - 2.0 * prod, 0.0)
            keys = jnp.where(pm_ref[:, js] > 0.5, -d2, -_BIG)
            # tpu.iota must be integer; ids carried as exact f32
            ti = (tc * tp
                  + jax.lax.broadcasted_iota(jnp.int32, (tq, tp),
                                             1)).astype(jnp.float32)
            # GATE 2 — actual keys: skip the 2k extraction passes when
            # no row of this chunk beats its current k-th neighbor
            rowmax = jnp.max(keys, axis=1, keepdims=True)
            improves = jnp.max(rowmax - hd[:, k - 1:k]) > 0.0

            def do(args):
                hd, hi, keys, ti = args
                cv, ci = _extract_k(keys, ti, k)        # chunk top-k
                # merge: equal keys resolve to the minimum global id —
                # the dense path's lowest-index tie order
                return _extract_k(jnp.concatenate([hd, cv], axis=1),
                                  jnp.concatenate([hi, ci], axis=1), k)

            def skip(args):
                return args[0], args[1]

            return jax.lax.cond(improves, do, skip, (hd, hi, keys, ti))

        return jax.lax.cond(chunk_can_improve, eval_chunk,
                            lambda c: c, (hd, hi))

    hd0 = jnp.full((tq, k), -_BIG, jnp.float32)
    hi0 = jnp.zeros((tq, k), jnp.float32)
    hd, hi = jax.lax.fori_loop(0, n_chunks, chunk, (hd0, hi0))
    idx_ref[:] = hi.astype(jnp.int32)
    # final head keys (-d², or -_BIG where no valid candidate was
    # selected): lets callers derive per-neighbor validity without the
    # (N·k,) jnp.take over the mask — that bool row gather measured
    # 1.85 ms/frame PER STAGE at the 16k stretch config (latency-bound,
    # as wide as the 256-channel feature gather).
    keys_ref[:] = hd


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit,
                   static_argnames=("k", "tq", "tp", "interpret",
                                    "vmem_limit_bytes", "return_keys"))
def knn_indices_tiled(query: jnp.ndarray, points: jnp.ndarray,
                      points_mask: jnp.ndarray | None = None, *,
                      k: int, tq: int = 512, tp: int = 2048,
                      vmem_limit_bytes: int = 96 * 1024 * 1024,
                      interpret: bool = False,
                      return_keys: bool = False):
    """Indices of the k nearest valid `points` per `query` row.

    Range contract: coordinates must satisfy d² < 5e9 (|x| ≲ 7e4 m)
    for every (query, valid point) pair. Per-neighbor validity is
    derived from the selection keys moving off the -1e10 floor instead
    of gathering the mask (that bool row gather measured 1.85 ms/frame
    per stage at 16k); a VALID point further than ~70 km — or a caller
    that encodes padding as huge sentinel coordinates with mask=True —
    would be silently misclassified as invalid. Radar returns are
    ≤ ~300 m, so the contract holds by ~230× margin; out-of-domain
    callers are caught by the jit-time guard below when
    RATRACK_DEBUG_NUMERICS=1 (CPU/interpret backends only — axon has
    no host callbacks).

    Args:
      query: (N, 3) float. See range contract above.
      points: (M, 3) float. See range contract above.
      points_mask: optional (M,) bool.
      k: neighbor count (static).
      tq/tp: query/point tile sizes (static).
      interpret: run in the Pallas interpreter (CPU testing).
      return_keys: also return the selection keys (-d², the expanded-form
        squared distance of neighborhood.square_distance) and the
        per-slot validity. Fallback-padded slots keep their original
        -_BIG key (validity False) — callers wanting the padded slots'
        true distances recompute from the gathered neighbors.
    Returns:
      (N, k) int32, ascending by distance, ties to the lowest index.
      Rows beyond the valid point count repeat the nearest valid index
      (same padding rule as ops.neighborhood.knn); all-invalid → 0.
      With return_keys: (idx, keys, valid).
    """
    n, m = query.shape[0], points.shape[0]
    if (__import__("os").environ.get("RATRACK_DEBUG_NUMERICS") == "1"
            and jax.default_backend() != "tpu"):
        # range-contract guard (see docstring); debug-only — the
        # reduce + host callback would otherwise cost every caller a
        # pass over both clouds per dispatch. CPU/interpret only: the
        # axon TPU backend has no host callbacks (UNIMPLEMENTED).
        def _guard(qmax, pmax):
            if not (qmax < 7e4 and pmax < 7e4):
                raise ValueError(
                    "knn_indices_tiled range contract violated: "
                    f"max|query|={qmax:.3e} max|points|={pmax:.3e} "
                    "(validity-from-keys needs |coord| < 7e4)")
        jax.debug.callback(_guard, jnp.max(jnp.abs(query)),
                           jnp.max(jnp.abs(points)))
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
    xt = pp.T                                           # (3, M)
    sqx = jnp.sum(pp * pp, axis=1)[None, :]             # (1, M)
    pmf = pm.astype(jnp.float32)[None, :]               # (1, M)

    # per-chunk bounding spheres over VALID points for the kernel's
    # chunk-level pruning gate: (n_chunks, 4) = [centroid xyz, radius].
    # All-invalid chunks get a far sentinel centroid (1e9) so the gate
    # skips them outright — they cannot contribute a neighbor.
    n_chunks = m_pad // tp
    pc3 = pp.reshape(n_chunks, tp, 3)
    pmc = pm.reshape(n_chunks, tp).astype(jnp.float32)[:, :, None]
    cnt = jnp.sum(pmc, axis=1)                          # (n_chunks, 1)
    ctr = jnp.sum(pc3 * pmc, axis=1) / jnp.maximum(cnt, 1.0)
    rad = jnp.sqrt(jnp.max(
        jnp.sum((pc3 - ctr[:, None, :]) ** 2, axis=2) * pmc[:, :, 0],
        axis=1, keepdims=True))
    ctr = jnp.where(cnt > 0.0, ctr, 1e9)
    bbox = jnp.concatenate([ctr, rad], axis=1)          # (n_chunks, 4)

    idx, keys = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, tp=tp, m=m_pad, n_q=n_pad),
        grid=(n_pad // tq,),
        in_specs=[
            pl.BlockSpec((tq, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, m_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chunks, 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((tq, k), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tq, k), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n_pad, k), jnp.int32),
                   jax.ShapeDtypeStruct((n_pad, k), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(qp, xt, sqx, pmf, bbox)
    idx, keys = idx[:n], keys[:n]

    # first-hit padding for < k valid points (matches neighborhood.knn).
    # A slot selected a valid candidate iff its key moved off the -_BIG
    # floor — masked candidates keep exactly -_BIG and real radar-scale
    # coordinates can never reach d² = 1e10 (|x| ~ 1e5 m); no mask
    # gather needed.
    nbr_valid = keys > (-_BIG / 2)
    fallback = jnp.where(nbr_valid[:, :1], idx[:, :1], 0)
    idx = jnp.where(nbr_valid, idx, fallback).astype(jnp.int32)
    if return_keys:
        return idx, keys, nbr_valid
    return idx


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
