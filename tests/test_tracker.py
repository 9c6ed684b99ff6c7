"""Tests for on-device DBSCAN, masked Sinkhorn, and association logic."""

import numpy as np
import jax.numpy as jnp

from ratrack_tpu.tracker import (dbscan, log_optimal_transport_masked,
                                 cluster_descriptors, greedy_gt_match,
                                 associate)
from reference_impls import np_dbscan, np_log_sinkhorn


def _labels_equivalent(a, b):
    """Same partition + same numbering order."""
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape
    np.testing.assert_array_equal(a == -1, b == -1)
    # bijection check in both directions
    for x, y in [(a, b), (b, a)]:
        seen = {}
        for u, v in zip(x, y):
            if u == -1:
                continue
            assert seen.setdefault(u, v) == v, f"partition mismatch {u}->{v}"


def test_dbscan_matches_reference_blobs(rng):
    # 3 well-separated blobs + sprinkled noise
    pts = np.concatenate([
        rng.randn(20, 2) * 0.3 + [0, 0],
        rng.randn(15, 2) * 0.3 + [10, 0],
        rng.randn(10, 2) * 0.3 + [0, 10],
        rng.uniform(-30, 30, (5, 2)) + 100,  # isolated noise
    ]).astype(np.float32)
    n = pts.shape[0]
    full = np.zeros((64, 2), np.float32)
    full[:n] = pts
    mask = np.zeros(64, bool)
    mask[:n] = True
    got = np.asarray(dbscan(jnp.asarray(full), jnp.asarray(mask), 1.5, 2))
    want = np_dbscan(pts.astype(np.float64), 1.5, 2)
    _labels_equivalent(got[:n], want)
    assert np.all(got[n:] == -1)
    # numbering order matches sklearn-style first-occurrence order
    np.testing.assert_array_equal(got[:n], want)


def test_dbscan_chain_topology(rng):
    # a long chain (worst case for naive propagation)
    pts = np.stack([np.arange(40, dtype=np.float32), np.zeros(40, np.float32)],
                   axis=1)
    mask = np.ones(40, bool)
    got = np.asarray(dbscan(jnp.asarray(pts), jnp.asarray(mask), 1.1, 2))
    assert np.all(got == 0)


def test_dbscan_min_samples(rng):
    # pair of close points is a cluster at min_samples=2 (self counted)
    pts = np.array([[0, 0], [0.5, 0], [50, 50]], np.float32)
    got = np.asarray(dbscan(jnp.asarray(pts), jnp.asarray(np.ones(3, bool)),
                            1.5, 2))
    np.testing.assert_array_equal(got, [0, 0, -1])


def test_dbscan_all_masked(rng):
    pts = rng.randn(8, 2).astype(np.float32)
    got = np.asarray(dbscan(jnp.asarray(pts), jnp.asarray(np.zeros(8, bool)),
                            1.5, 2))
    np.testing.assert_array_equal(got, -np.ones(8))


def test_sinkhorn_matches_reference(rng):
    m, n, k = 4, 3, 8
    scores = rng.rand(m, n).astype(np.float32)
    padded = np.zeros((k, k), np.float32)
    padded[:m, :n] = scores
    got = np.asarray(log_optimal_transport_masked(
        jnp.asarray(padded), jnp.asarray(m), jnp.asarray(n),
        jnp.float32(0.9), 200))
    want = np_log_sinkhorn(scores.astype(np.float64), 0.9, 200)
    # valid block + the bin row/col at the shifted position
    np.testing.assert_allclose(got[:m, :n], want[:m, :n], atol=2e-3)
    np.testing.assert_allclose(got[:m, k], want[:m, n], atol=2e-3)
    np.testing.assert_allclose(got[k, :n], want[m, :n], atol=2e-3)


def test_sinkhorn_early_exit_matches_full(rng):
    """tol-based early exit lands within tol of the full 500-iter result."""
    m, n, k = 5, 4, 8
    padded = np.zeros((k, k), np.float32)
    padded[:m, :n] = rng.rand(m, n).astype(np.float32) * 2
    full = np.asarray(log_optimal_transport_masked(
        jnp.asarray(padded), jnp.asarray(m), jnp.asarray(n),
        jnp.float32(0.9), 500))
    fast = np.asarray(log_optimal_transport_masked(
        jnp.asarray(padded), jnp.asarray(m), jnp.asarray(n),
        jnp.float32(0.9), 500, tol=1e-5))
    np.testing.assert_allclose(fast[:m, :n], full[:m, :n], atol=1e-3)


def test_sinkhorn_fused_kernel_matches_xla_loop(rng):
    """ops/pallas_sinkhorn.py: the fused-loop solver must reproduce the
    XLA fori_loop bit-for-bit on the interpreter (identical bounded-LSE
    expression; on-chip only reduce-order ulps are expected — the class
    every other kernel documents). Covers single and vmapped dispatch
    (the custom_vmap batch rule is the production eval-scan path)."""
    import jax
    from ratrack_tpu.tracker import sinkhorn as S

    k = 32
    alpha = jnp.float32(0.9)
    aff = jnp.asarray(rng.rand(k, k).astype(np.float32))
    want = np.asarray(log_optimal_transport_masked(
        aff, jnp.asarray(5), jnp.asarray(7), alpha, 500, safe_lse=False))
    old = (S.FORCE_FUSED_ON_CPU, S.USE_FUSED_KERNEL)
    S.FORCE_FUSED_ON_CPU = S.USE_FUSED_KERNEL = True
    try:
        got = np.asarray(log_optimal_transport_masked(
            aff, jnp.asarray(5), jnp.asarray(7), alpha, 500,
            safe_lse=False))
        affb = jnp.asarray(rng.rand(4, k, k).astype(np.float32))
        mb = jnp.asarray([0, 3, 32, 7], np.int32)
        nb = jnp.asarray([2, 1, 32, 7], np.int32)
        f = jax.vmap(lambda a, m, n: log_optimal_transport_masked(
            a, m, n, alpha, 500, safe_lse=False))
        got_b = np.asarray(jax.jit(f)(affb, mb, nb))
    finally:
        S.FORCE_FUSED_ON_CPU, S.USE_FUSED_KERNEL = old
    valid = want > -1e8
    np.testing.assert_array_equal(got[valid], want[valid])
    want_b = np.asarray(f(affb, mb, nb))
    vb = want_b > -1e8
    np.testing.assert_array_equal(got_b[vb], want_b[vb])
    np.testing.assert_array_equal(vb, got_b > -1e8)


def test_sinkhorn_empty_sides():
    k = 4
    z = log_optimal_transport_masked(
        jnp.zeros((k, k)), jnp.asarray(0), jnp.asarray(3),
        jnp.float32(0.9), 50)
    assert np.all(np.isfinite(np.asarray(z)[k, :3]))  # bin row still finite


def test_cluster_descriptors(rng):
    n, k = 32, 4
    feats = rng.randn(n, 139).astype(np.float32)
    labels = np.full(n, -1, np.int32)
    labels[:5] = 0
    labels[5:8] = 1
    desc, valid, sizes, _ = cluster_descriptors(
        jnp.asarray(feats), jnp.asarray(labels), k)
    desc = np.asarray(desc)
    np.testing.assert_array_equal(np.asarray(sizes), [5, 3, 0, 0])
    np.testing.assert_array_equal(np.asarray(valid), [1, 1, 0, 0])
    c0 = feats[:5]
    np.testing.assert_allclose(desc[0, 0:3], c0[:, 3:6].mean(0), rtol=1e-4)
    np.testing.assert_allclose(desc[0, 3:6], c0[:, 3:6].var(0), rtol=1e-3,
                               atol=1e-5)
    np.testing.assert_allclose(desc[0, 6:134], c0[:, 11:139].max(0), rtol=1e-5)
    np.testing.assert_allclose(desc[0, 134:137], c0[:, 6:9].mean(0), rtol=1e-4)
    np.testing.assert_allclose(desc[0, 137:139], c0[:, 9:11].mean(0), rtol=1e-4)
    np.testing.assert_allclose(desc[0, 139:141], c0[:, 9:11].var(0), rtol=1e-3,
                               atol=1e-5)
    np.testing.assert_array_equal(desc[2], np.zeros(141))


def test_greedy_gt_match(rng):
    n, k, g = 20, 4, 4
    labels = np.full(n, -1, np.int32)
    labels[0:6] = 0    # overlaps gt slot 1 fully
    labels[6:10] = 1   # overlaps gt slot 0 partially
    gt_dense = np.full(n, -1, np.int32)
    gt_dense[0:6] = 1
    gt_dense[6:8] = 0
    gt_ids = np.array([101, 202, -1, -1], np.int32)
    gt_valid = np.array([1, 1, 0, 0], bool)
    out = np.asarray(greedy_gt_match(
        jnp.asarray(labels), jnp.asarray(gt_dense), jnp.asarray(gt_ids),
        jnp.asarray(gt_valid), k, jnp.asarray(7)))
    assert out[0] == 202 and out[1] == 101
    assert out[2] < 0 and out[3] < 0 and out[2] != out[3]


def test_greedy_gt_match_no_double_assign(rng):
    # two clusters both overlapping the same single GT: second gets negative
    labels = np.array([0, 0, 1, 1], np.int32)
    gt_dense = np.array([0, 0, 0, -1], np.int32)
    gt_ids = np.array([55, -1], np.int32)
    gt_valid = np.array([1, 0], bool)
    out = np.asarray(greedy_gt_match(
        jnp.asarray(labels), jnp.asarray(gt_dense), jnp.asarray(gt_ids),
        jnp.asarray(gt_valid), 2, jnp.asarray(0)))
    assert out[0] == 55 and out[1] < 0


def test_associate_inherit_and_birth(rng):
    k = 6
    # 2 prev, 3 curr; curr0 matches prev1 strongly, curr1 matches prev0;
    # curr2 is new.
    aff = np.zeros((k, k), np.float32)
    aff[1, 0] = 0.9
    aff[0, 1] = 0.8
    aff[0, 2] = 0.05
    aff[1, 2] = 0.04
    prev_ids = np.array([10, 20, -1, -1, -1, -1], np.int32)
    res = associate(jnp.asarray(aff), jnp.asarray(2), jnp.asarray(3),
                    jnp.asarray(prev_ids), jnp.asarray(30),
                    jnp.float32(0.9), 100)
    tid = np.asarray(res.track_id)
    assert tid[0] == 20 and tid[1] == 10
    assert tid[2] == 30  # newly born id
    assert np.all(tid[3:] == -1)
    assert int(res.next_id) == 31
    conf = np.asarray(res.conf)
    assert conf[0] > 0 and conf[1] > 0 and conf[2] == 0


def test_associate_empty_prev_births_all(rng):
    k = 5
    res = associate(jnp.zeros((k, k)), jnp.asarray(0), jnp.asarray(2),
                    jnp.full((k,), -1, jnp.int32), jnp.asarray(7),
                    jnp.float32(0.9), 50)
    tid = np.asarray(res.track_id)
    np.testing.assert_array_equal(tid[:2], [7, 8])
    assert int(res.next_id) == 9


def test_associate_low_conf_births_new(rng):
    k = 4
    aff = np.zeros((k, k), np.float32)
    aff[0, 0] = 0.005  # mutual best but below conf threshold 0.01
    res = associate(jnp.asarray(aff), jnp.asarray(1), jnp.asarray(1),
                    jnp.asarray(np.array([42, -1, -1, -1], np.int32)),
                    jnp.asarray(100), jnp.float32(0.9), 50)
    assert int(np.asarray(res.track_id)[0]) == 100  # new id, not 42
