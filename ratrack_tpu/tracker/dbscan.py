"""On-device DBSCAN over a masked fixed-size point set.

Replaces the reference's host round-trip to sklearn DBSCAN
(`src/models/track4d.py:108-126`: detach → .cpu() → sklearn → back to GPU)
with a fully on-device label-propagation algorithm, so clustering stays
inside the single XLA program.

Algorithm (classic parallel connected components):
  * adjacency: pairwise distance ≤ eps among valid points;
  * core points: ≥ min_samples neighbors (the point itself included —
    sklearn semantics, which the reference relies on with min_samples=2);
  * component label = min core index reachable through core-core edges,
    found by min-label propagation with pointer jumping (converges in
    O(log diameter) iterations);
  * border points adopt the label of their minimum-label core neighbor;
  * noise → -1;
  * cluster ids are ranks of component roots in index order, which matches
    sklearn's first-core-visited numbering. (Known benign deviation: a
    border point adjacent to cores of two different clusters takes the
    min-label one; sklearn picks whichever BFS reached it first.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import square_distance


def _take_int_onehot(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """values[idx] for int32 vectors via an exact one-hot matmul.

    XLA TPU row gathers are latency-bound (~30 µs for a batched (8,512)
    int gather inside the eval scan — the single biggest non-kernel op in
    the profile); the one-hot dot is ~1 µs. Exact: 0/1 one-hot times
    integer values accumulates one product per output, at HIGHEST
    precision so the value operand is not truncated to bf16 (values here
    are indices < 2^24).
    """
    n = values.shape[0]
    oh = (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :])
    out = jax.lax.dot(oh.astype(jnp.float32),
                      values.astype(jnp.float32)[:, None],
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
    return out[:, 0].astype(values.dtype)


def compact_dbscan(x: jnp.ndarray, mask: jnp.ndarray, scores: jnp.ndarray,
                   budget: int, eps: float, min_samples: int,
                   max_iters: int = 64) -> jnp.ndarray:
    """DBSCAN over the top-`budget` masked points by score.

    Compacts the masked points into a budget-slot subset before the O(M²)
    adjacency — radar frames have far fewer moving points than the pad
    budget. Selected indices are re-sorted ascending so the
    first-occurrence label numbering matches a full-array `dbscan` run
    exactly: results are identical whenever `sum(mask) <= budget`; beyond
    that the lowest-score extras are dropped (never clustered).
    """
    n = x.shape[0]
    # -inf sentinel: any finite sentinel would outrank masked points whose
    # scores fall below it (e.g. signed logits), silently dropping them
    keys = jnp.where(mask, scores, -jnp.inf)
    _, sel = jax.lax.top_k(keys, budget)
    sel = jnp.sort(sel)
    sel_mask = jnp.take(mask, sel)
    sub = dbscan(jnp.take(x, sel, axis=0), sel_mask, eps, min_samples,
                 max_iters)
    labels = jnp.full((n,), -1, jnp.int32)
    return labels.at[sel].set(jnp.where(sel_mask, sub, -1))


def dbscan(x: jnp.ndarray, mask: jnp.ndarray, eps: float, min_samples: int,
           max_iters: int = 64) -> jnp.ndarray:
    """Cluster valid rows of x.

    Args:
      x: (N, D) features.
      mask: (N,) bool — points to cluster.
      eps: neighborhood radius (euclidean).
      min_samples: core threshold, self included.
      max_iters: propagation bound (≥ log2(N) + margin).
    Returns:
      (N,) int32 labels: cluster id ≥ 0 in first-occurrence order, -1 for
      noise and masked-out points.
    """
    n = x.shape[0]
    sentinel = jnp.int32(n)
    d2 = square_distance(x, x)
    adj = (d2 <= eps * eps) & mask[None, :] & mask[:, None]
    deg = jnp.sum(adj, axis=1)
    core = (deg >= min_samples) & mask
    core_adj = adj & core[None, :] & core[:, None]

    idx = jnp.arange(n, dtype=jnp.int32)
    label0 = jnp.where(core, idx, sentinel)

    def propagate(label):
        # min label among core neighbors, then pointer-jump
        nbr_min = jnp.min(jnp.where(core_adj, label[None, :], sentinel),
                          axis=1)
        label = jnp.minimum(label, nbr_min)
        jumped = jnp.where(label < sentinel,
                           _take_int_onehot(label,
                                            jnp.minimum(label, n - 1)),
                           sentinel)
        return jnp.minimum(label, jumped)

    def cond(state):
        i, label, prev = state
        return (i < max_iters) & jnp.any(label != prev)

    def body(state):
        i, label, _ = state
        return i + 1, propagate(label), label

    _, label, _ = jax.lax.while_loop(
        cond, body, (0, propagate(label0), label0))

    # border points: min-label core neighbor
    border_lbl = jnp.min(
        jnp.where(adj & core[None, :], label[None, :], sentinel), axis=1)
    label = jnp.where(core, label, jnp.where(mask, border_lbl, sentinel))

    # compact component roots to cluster ids in index order
    clustered = label < sentinel
    is_root = clustered & (label == idx)
    rank = jnp.cumsum(is_root.astype(jnp.int32)) - 1          # rank at index
    cluster = jnp.where(clustered,
                        _take_int_onehot(rank.astype(jnp.int32),
                                         jnp.minimum(label, n - 1)), -1)
    return cluster.astype(jnp.int32)
