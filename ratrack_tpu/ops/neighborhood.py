"""Masked neighborhood queries over fixed-shape (padded) point clouds.

TPU-native replacements for the reference CUDA kernels
(`src/lib/src/ball_query_gpu.cu`, `src/lib/src/interpolate_gpu.cu`) and the
pure-torch `knn_point`/`square_distance` (`src/utils/model_utils/model_utils.py:17-99`).

All functions operate on a single cloud in points-major layout `(N, 3)` /
`(N, C)`; batch via `jax.vmap`. Invalid (padding) points are excluded through
boolean masks instead of varying shapes, so every op has a static shape and
compiles once.

Distance computations are done in float32 with HIGHEST matmul precision:
neighbor *selection* is index-producing and therefore numerically brittle
under bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e10)

# XLA's TPU top_k has a fast path for k <= 16 and falls back to a full
# sort above it (measured ~3-10x slower at k=32 on v5e). _TOPK_CHUNK-sized
# exact extraction rounds keep every neighborhood op on the fast path.
_TOPK_CHUNK = 16


def top_k_extract(keys: jnp.ndarray, k: int):
    """Stable top-k by k first-max extraction passes (sort-free).

    Matches jax.lax.top_k exactly (values, indices, stable lowest-index
    tie order, and gradient routing via the final regather) for every slot
    whose value is finite. Slots that land on -inf padding may report a
    different — equally invalid — index than top_k (repeated extraction
    re-selects the first -inf); every caller here (ball_query, knn,
    three_nn) overwrites those slots with its own fallback rule before
    use.

    Why: inside large TPU programs XLA assigns the sort a hostile
    non-minor layout (~300 µs per (8,512,512) sort measured in the train
    step vs ~15 µs for these elementwise/reduce passes, which have no
    layout constraint).
    """
    cols = jax.lax.broadcasted_iota(jnp.int32, keys.shape,
                                    keys.ndim - 1)
    x = jax.lax.stop_gradient(keys)
    idxs, vals = [], []
    for _ in range(k):
        m = jnp.max(x, axis=-1, keepdims=True)
        j = jnp.argmax(x == m, axis=-1)
        sel = cols == j[..., None]
        # value via masked sum over the ORIGINAL keys: forward equals the
        # pass maximum; backward routes the slot's cotangent to exactly
        # the selected entry (top_k's VJP) as dense elementwise math — a
        # take_along_axis regather here puts a (M, N) scatter in the
        # backward, which measurably dominates the train step
        vals.append(jnp.sum(jnp.where(sel, keys, 0.0), axis=-1))
        idxs.append(j)
        x = jnp.where(sel, -jnp.inf, x)
    return (jnp.stack(vals, axis=-1),
            jnp.stack(idxs, axis=-1).astype(jnp.int32))


_TOURN_BLOCK = 512


def top_k_blocked(keys: jnp.ndarray, k: int):
    """Exact top-k over wide rows via a two-level tournament.

    k extraction passes over an (N, M) matrix re-stream it k times
    (~17 ms at 8192×8192, HBM-bound). The tournament reads it ONCE:
    per-512-block top-k (extraction over narrow blocks), then top-k of
    the nb·k finalists. Exact incl. the stable lowest-global-index tie
    order: finalists are laid out block-major and within-block rank
    order, so the stage-2 stable first-max always lands on the lowest
    global index among equal values. Gradients route through both
    masked-sum stages to exactly the selected entries.
    """
    *lead, n = keys.shape
    if k > _TOURN_BLOCK:
        # a single block can hold > _TOURN_BLOCK of the global top-k;
        # capping kb would silently drop winners. Callers use k <= 32 —
        # route any larger k through the flat extraction.
        raise ValueError(
            f"top_k_blocked requires k <= {_TOURN_BLOCK}; got k={k} "
            "(use top_k_extract)")
    kb = k
    nb = -(-n // _TOURN_BLOCK)
    pad = nb * _TOURN_BLOCK - n
    if pad:
        keys = jnp.pad(keys, [(0, 0)] * len(lead) + [(0, pad)],
                       constant_values=-jnp.inf)
    blocks = keys.reshape(*lead, nb, _TOURN_BLOCK)
    v1, i1 = top_k_extract(blocks, kb)                   # (..., nb, kb)
    gi = i1 + (jnp.arange(nb, dtype=jnp.int32)
               * _TOURN_BLOCK)[..., :, None]
    v2, i2 = top_k_extract(v1.reshape(*lead, nb * kb), k)
    idx = jnp.take_along_axis(gi.reshape(*lead, nb * kb), i2, axis=-1)
    # -inf-padding slots may point past n (caller-discarded); keep the
    # index in range for downstream gathers
    return v2, jnp.minimum(idx, n - 1)


def top_k_exact(keys: jnp.ndarray, k: int, wide_tournament: bool = True):
    """Exact descending top-k along the last axis, chunked for speed.

    Equivalent to jax.lax.top_k (same stable lowest-index tie order —
    -inf-padding caveat in top_k_extract): on TPU, k extraction passes
    avoid XLA's layout-hostile in-graph sorts; wide rows use the blocked
    tournament unless `wide_tournament=False` (inside lax.map tiles the
    tournament's reshapes measurably LOSE — knn_chunked opts out).
    Elsewhere lax.top_k, chunked to its k <= 16 fast path.
    """
    if jax.default_backend() == "tpu":
        if (wide_tournament and k <= _TOURN_BLOCK
                and keys.shape[-1] >= 4 * _TOURN_BLOCK):
            return top_k_blocked(keys, k)
        return top_k_extract(keys, k)
    if k <= _TOPK_CHUNK:
        return jax.lax.top_k(keys, k)
    vals, idxs = [], []
    for _ in range(-(-k // _TOPK_CHUNK)):
        v, i = jax.lax.top_k(keys, _TOPK_CHUNK)
        vals.append(v)
        idxs.append(i)
        # scatter-mask the taken entries (a one-hot over the key axis
        # would cost chunk x 16 x M memory — 16x the key matrix)
        keys = jnp.put_along_axis(keys, i, -jnp.inf, axis=-1,
                                  inplace=False)
    return (jnp.concatenate(vals, -1)[..., :k],
            jnp.concatenate(idxs, -1)[..., :k])


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared euclidean distance, clamped at zero.

    Mirrors reference `square_distance` (model_utils.py:17-39) which clamps
    negatives produced by the expanded form.

    Args:
      src: (N, C) query points.
      dst: (M, C) target points.
    Returns:
      (N, M) float32 squared distances.
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    d = -2.0 * jax.lax.dot_general(
        src, dst,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    d = d + jnp.sum(src * src, axis=-1, keepdims=True)
    d = d + jnp.sum(dst * dst, axis=-1)[None, :]
    return jnp.maximum(d, 0.0)


def knn(k: int, query: jnp.ndarray, points: jnp.ndarray,
        points_mask: jnp.ndarray | None = None,
        wide_tournament: bool = True):
    """k nearest neighbors of `query` among valid `points`.

    Reference: `knn_point` (model_utils.py:85-99) — torch.topk over the dense
    distance matrix — and the CUDA `knn` kernel (interpolate_gpu.cu:9-79).

    If fewer than `k` points are valid, the remaining neighbor slots are
    filled with the nearest valid index (first-hit padding, matching the
    spirit of ball_query_gpu.cu:34-41); if no point is valid, index 0.

    Args:
      k: number of neighbors (static).
      query: (N, C).
      points: (M, C).
      points_mask: optional (M,) bool validity of `points`.
    Returns:
      (dist2, idx): (N, k) float32 squared distances and (N, k) int32 indices,
      sorted ascending by distance.
    """
    d = square_distance(query, points)  # (N, M)
    if points_mask is not None:
        d = jnp.where(points_mask[None, :], d, _BIG)
    neg_d, idx = top_k_exact(-d, k, wide_tournament)
    dist2 = -neg_d
    if points_mask is not None:
        nbr_valid = dist2 < _BIG
        # pad invalid neighbor slots with the nearest valid neighbor (col 0);
        # if col 0 itself is invalid (no valid points at all), use index 0.
        fallback = jnp.where(nbr_valid[:, :1], idx[:, :1], 0)
        idx = jnp.where(nbr_valid, idx, fallback)
        dist2 = jnp.where(nbr_valid, dist2, jnp.take_along_axis(
            jnp.where(points_mask[None, :], d, _BIG), fallback, axis=1))
    return dist2, idx.astype(jnp.int32)


def ball_query(radius: float, nsample: int, points: jnp.ndarray,
               centers: jnp.ndarray,
               points_mask: jnp.ndarray | None = None,
               wide_tournament: bool = True) -> jnp.ndarray:
    """Fixed-size radius query with the reference kernel's exact padding rule.

    Reference CUDA semantics (ball_query_gpu.cu:28-44):
      * scan points in index order, keep the first `nsample` with d² < r²;
      * ALL slots are pre-filled with the FIRST hit before being overwritten,
        so trailing slots repeat the first in-radius index;
      * if no point is in radius, all slots stay 0.

    Args:
      radius: ball radius (static).
      nsample: max neighbors (static).
      points: (N, 3) candidate points.
      centers: (M, 3) query centers.
      points_mask: optional (N,) bool validity of `points`.
    Returns:
      (M, nsample) int32 indices into `points`.
    """
    d2 = square_distance(centers, points)  # (M, N)
    hit = d2 < (radius * radius)
    if points_mask is not None:
        hit = jnp.logical_and(hit, points_mask[None, :])
    # first nsample hits in index order via one top_k over the negated
    # column index (single fused op — a per-slot argmax loop blows up
    # compile time and a scatter is slow on TPU).
    cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    keys = jnp.where(hit, -cols.astype(jnp.float32), -jnp.float32(jnp.inf))
    vals, idx = top_k_exact(keys, nsample,
                            wide_tournament)   # descending → ascending col
    found = vals > -jnp.float32(jnp.inf)
    # CUDA padding rule: every slot is pre-filled with the first hit
    # (ball_query_gpu.cu:34-41); no hit at all -> 0 (kernel zero-init).
    first = jnp.where(found[:, :1], idx[:, :1], 0)
    return jnp.where(found, idx, first).astype(jnp.int32)


def knn_chunked(k: int, query: jnp.ndarray, points: jnp.ndarray,
                points_mask: jnp.ndarray | None = None,
                chunk: int = 512):
    """kNN with HBM bounded to chunk×M: lax.map over query tiles.

    Identical results to `knn` (same distance formula and top_k per tile);
    memory never exceeds chunk·M instead of N·M. For the 4k–16k stretch
    configs where the dense (N, M) matrix is 0.25–1 GB
    (SURVEY.md §5 long-context scaling). See ops.pallas_knn for the
    VMEM-resident Pallas variant.
    """
    n = query.shape[0]
    n_pad = -(-n // chunk) * chunk
    qp = jnp.zeros((n_pad, query.shape[1]), query.dtype).at[:n].set(query)

    def one(q_tile):
        return knn(k, q_tile, points, points_mask, wide_tournament=False)

    d2, idx = jax.lax.map(one, qp.reshape(-1, chunk, query.shape[1]))
    return (d2.reshape(n_pad, k)[:n], idx.reshape(n_pad, k)[:n])


# dense N·M footprint above which knn() switches to the chunked path
_KNN_DENSE_LIMIT = 4 * 1024 * 1024


def ball_query_chunked(radius: float, nsample: int, points: jnp.ndarray,
                       centers: jnp.ndarray,
                       points_mask: jnp.ndarray | None = None,
                       chunk: int = 512) -> jnp.ndarray:
    """ball_query with HBM bounded to chunk×N via lax.map over center tiles.

    Identical results to `ball_query`; for stretch configs where the dense
    (M, N) hit matrix would be hundreds of MB (16k×16k ≈ 1 GB)."""
    m = centers.shape[0]
    m_pad = -(-m // chunk) * chunk
    cp = jnp.zeros((m_pad, centers.shape[1]),
                   centers.dtype).at[:m].set(centers)

    def one(c_tile):
        # tournament reshapes lose inside lax.map tiles (see knn_chunked)
        return ball_query(radius, nsample, points, c_tile, points_mask,
                          wide_tournament=False)

    idx = jax.lax.map(one, cp.reshape(-1, chunk, centers.shape[1]))
    return idx.reshape(m_pad, nsample)[:m]


def ball_query_auto(radius: float, nsample: int, points: jnp.ndarray,
                    centers: jnp.ndarray,
                    points_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Size-dispatched ball query (same policy as knn_auto)."""
    if centers.shape[0] * points.shape[0] > _KNN_DENSE_LIMIT:
        return ball_query_chunked(radius, nsample, points, centers,
                                  points_mask)
    return ball_query(radius, nsample, points, centers, points_mask)




def knn_auto(k: int, query: jnp.ndarray, points: jnp.ndarray,
             points_mask: jnp.ndarray | None = None):
    """Size-dispatched kNN: dense under ~4M pair footprint; above it the
    VMEM-streaming Pallas kernel on TPU (7.5 vs 10.5 ms at 8192² k=16 —
    near-tie neighbor order differs in the FMA-distance rounding class),
    chunked lax.map elsewhere."""
    if query.shape[0] * points.shape[0] > _KNN_DENSE_LIMIT:
        if jax.default_backend() == "tpu" and k <= 32:
            from .pallas_knn import knn_tiled
            return knn_tiled(k, query, points, points_mask)
        return knn_chunked(k, query, points, points_mask)
    return knn(k, query, points, points_mask)


def three_nn(query: jnp.ndarray, points: jnp.ndarray,
             points_mask: jnp.ndarray | None = None):
    """3 nearest neighbors; returns euclidean (not squared) distances.

    Reference: three_nn CUDA kernel (interpolate_gpu.cu:81-147), which
    returns sqrt distances via the Python wrapper (pointnet2_utils.py:126).
    Stretch shapes route through knn_auto (the dense (N, M) matrix is
    256 MB at 8k²).
    """
    dist2, idx = knn_auto(3, query, points, points_mask)
    return jnp.sqrt(dist2), idx
