"""Slot-based object formation, GT matching, and cross-frame association.

On-device, fixed-shape equivalents of:
  * per-cluster object descriptors (reference affinity_module,
    src/models/track4d.py:182-223);
  * Sinkhorn mutual-max matching + ID inheritance (sinkhorn_module +
    association_module, track4d.py:135-180);
  * pred↔GT greedy point-IoU matching (map_gt_objects,
    src/models/utils/track4d_utils.py:75-102).

Channel layout of the 139-ch per-point tensor F (track4d.py:53-54):
  0:3 warped xyz | 3:6 original xyz | 6:9 flow | 9:11 [RCS, v_r]
  | 11:139 prop features (128).
The object descriptor (141-d, track4d.py:200-214) is
  [mean(3:6), var(3:6), max(11:139), mean(6:9), mean(9:11), var(9:11)].
(The reference slices prev features as 11:11+256, which silently clamps to
128 — both sides are 128-d here, reproducing the effective behaviour.)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .sinkhorn import log_optimal_transport_masked
from .state import DESC_DIM

_NEG_INF = jnp.float32(-1e30)


def cluster_descriptors(feats: jnp.ndarray, labels: jnp.ndarray,
                        k_max: int):
    """Masked per-cluster statistics → descriptors.

    Args:
      feats: (N, 139) per-point tensor F.
      labels: (N,) int32 cluster ids in [-1, k_max).
      k_max: slot count.
    Returns:
      desc (k_max, 141), valid (k_max,), sizes (k_max,) int32,
      onehot (N, k_max) float32 membership.
    """
    n = feats.shape[0]
    member = labels[:, None] == jnp.arange(k_max)[None, :]    # (N, K)
    oh = member.astype(jnp.float32)
    sizes = jnp.sum(member, axis=0).astype(jnp.int32)
    valid = sizes > 0
    denom = jnp.maximum(sizes.astype(jnp.float32), 1.0)[:, None]

    def mean(sl):
        return (oh.T @ feats[:, sl]) / denom                  # (K, |sl|)

    def var(sl):
        m = mean(sl)
        sq = (oh.T @ jnp.square(feats[:, sl])) / denom
        return jnp.maximum(sq - jnp.square(m), 0.0)           # biased var

    pos = mean(slice(3, 6))
    pos_var = var(slice(3, 6))
    flow = mean(slice(6, 9))
    rrv = mean(slice(9, 11))
    rrv_var = var(slice(9, 11))
    fmax = jnp.max(
        jnp.where(member[:, :, None], feats[:, None, 11:139], _NEG_INF),
        axis=0)
    fmax = jnp.where(valid[:, None], fmax, 0.0)
    desc = jnp.concatenate([pos, pos_var, fmax, flow, rrv, rrv_var], axis=-1)
    desc = jnp.where(valid[:, None], desc, 0.0)
    assert desc.shape == (k_max, DESC_DIM)
    return desc, valid, sizes, oh


def greedy_gt_match(labels: jnp.ndarray, gt_dense: jnp.ndarray,
                    gt_label_ids: jnp.ndarray, gt_valid: jnp.ndarray,
                    k_max: int, frame_idx: jnp.ndarray) -> jnp.ndarray:
    """Greedy point-IoU match of predicted clusters to GT objects.

    Reference map_gt_objects (track4d_utils.py:75-102): per predicted
    object in order, pick the highest point-IoU GT not yet used; objects
    with no match get a unique never-matching negative key (reference uses
    random negatives; here -(2 + frame_idx*k_max + slot), collision-free
    across frames).

    Args:
      labels: (N,) cluster id per point (-1 noise).
      gt_dense: (N,) dense GT slot per point (-1 none).
      gt_label_ids: (G,) original GT label id per dense slot.
      gt_valid: (G,) bool.
    Returns:
      (k_max,) int32 matched GT label id per cluster slot.
    """
    gt_label_ids = jnp.asarray(gt_label_ids)  # numpy input + traced index
    g_max = gt_label_ids.shape[0]
    in_k = labels[:, None] == jnp.arange(k_max)[None, :]         # (N, K)
    in_g = gt_dense[:, None] == jnp.arange(g_max)[None, :]       # (N, G)
    common = in_k.astype(jnp.float32).T @ in_g.astype(jnp.float32)  # (K, G)
    size_k = jnp.sum(in_k, axis=0).astype(jnp.float32)[:, None]
    size_g = jnp.sum(in_g, axis=0).astype(jnp.float32)[None, :]
    denom = jnp.maximum(size_k + size_g - common, 1.0)
    iou = jnp.where(gt_valid[None, :], common / denom, 0.0)

    def body(k, carry):
        used, out = carry
        row = jnp.where(used, 0.0, iou[k])
        best = jnp.argmax(row)
        ok = row[best] > 0.0
        out = out.at[k].set(jnp.where(
            ok, gt_label_ids[best],
            -(2 + frame_idx * k_max + k)).astype(jnp.int32))
        used = used | (jnp.arange(g_max) == best) & ok
        return used, out

    _, out = jax.lax.fori_loop(
        0, k_max, body,
        (jnp.zeros((g_max,), bool), jnp.full((k_max,), -1, jnp.int32)))
    return out


class AssocResult(NamedTuple):
    track_id: jnp.ndarray    # (K,) int32 per curr slot (-1 invalid)
    conf: jnp.ndarray        # (K,) float32 match confidence (0 for new)
    matched_prev: jnp.ndarray  # (K,) int32 prev slot index or -1
    next_id: jnp.ndarray     # () int32 updated counter
    aff: jnp.ndarray         # (K, K) raw affinity matrix (prev × curr)


class MatchStructure(NamedTuple):
    """Temporal-state-free part of the association (parallelizable over
    frames): who matches whom and at what confidence."""
    idx1: jnp.ndarray        # (K,) int32 best prev slot per curr slot
    matched: jnp.ndarray     # (K,) bool mutual-max match
    conf: jnp.ndarray        # (K,) float32 affinity at the match
    col_ok: jnp.ndarray      # (K,) bool curr-slot validity


def match_structure(aff: jnp.ndarray, m: jnp.ndarray, n: jnp.ndarray,
                    alpha: jnp.ndarray, iters: int,
                    sinkhorn_tol: float = 0.0) -> MatchStructure:
    """Sinkhorn + mutual-max matching (sinkhorn_module, track4d.py:135-180).

    Depends only on the affinity matrix and slot counts — NOT on track
    identity — so the pipelined eval path computes it batched over B×T.
    """
    k = aff.shape[0]
    # safe_lse=False is justified HERE: aff entries are sigmoid outputs in
    # (0, 1) and alpha is the 0.9 bin score — the _lse_bounded operand
    # bound holds (see its docstring); arbitrary callers get the safe
    # default on the public API.
    z = log_optimal_transport_masked(aff, m, n, alpha, iters,
                                     tol=sinkhorn_tol, safe_lse=False)
    scores = z[:k, :k]
    row_ok = jnp.arange(k) < m
    col_ok = jnp.arange(k) < n
    s = jnp.where(row_ok[:, None] & col_ok[None, :], scores, _NEG_INF)

    idx0 = jnp.argmax(s, axis=1).astype(jnp.int32)   # best curr per prev
    idx1 = jnp.argmax(s, axis=0).astype(jnp.int32)   # best prev per curr
    mutual1 = jnp.take(idx0, idx1) == jnp.arange(k)
    # reference also requires exp(max) > 0 — true for any finite score;
    # padded -inf rows/cols can't win argmax on valid slots.
    matched = mutual1 & col_ok & (jnp.take(row_ok, idx1))
    conf = aff[idx1, jnp.arange(k)]
    return MatchStructure(idx1, matched, conf, col_ok)


def assign_ids(ms: MatchStructure, prev_track_id: jnp.ndarray,
               next_id: jnp.ndarray, aff: jnp.ndarray,
               conf_thres: float = 0.01) -> AssocResult:
    """ID inheritance from a match structure (association_module,
    track4d.py:143-158): new id when unmatched or conf < conf_thres,
    ids assigned in slot order. The only sequential piece."""
    is_new = ms.col_ok & (~ms.matched | (ms.conf < conf_thres))
    inherit = ms.col_ok & ms.matched & (ms.conf >= conf_thres)

    k = ms.idx1.shape[0]
    new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    track_id = jnp.where(
        inherit, jnp.take(prev_track_id, ms.idx1),
        jnp.where(is_new, next_id + new_rank, -1)).astype(jnp.int32)
    conf_out = jnp.where(inherit, ms.conf, 0.0)
    matched_prev = jnp.where(inherit, ms.idx1, -1).astype(jnp.int32)
    del k
    return AssocResult(track_id, conf_out, matched_prev,
                       next_id + jnp.sum(is_new).astype(jnp.int32), aff)


def associate(aff: jnp.ndarray, m: jnp.ndarray, n: jnp.ndarray,
              prev_track_id: jnp.ndarray, next_id: jnp.ndarray,
              alpha: jnp.ndarray, iters: int,
              conf_thres: float = 0.01,
              sinkhorn_tol: float = 0.0) -> AssocResult:
    """Sinkhorn matching + ID inheritance.

    Mirrors sinkhorn_module + association_module (track4d.py:135-180):
    mutual-max on the (m×n) block of exp(Z), new id when unmatched or
    conf = aff[match, j] < conf_thres, ids assigned in slot order.
    """
    ms = match_structure(aff, m, n, alpha, iters, sinkhorn_tol)
    return assign_ids(ms, prev_track_id, next_id, aff, conf_thres)
