"""Parity tests: masked JAX point ops vs NumPy oracles of the CUDA semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from ratrack_tpu import ops
from reference_impls import np_fps, np_ball_query, np_knn, np_three_interpolate


def _padded(rng, n_valid, n_pad, c=3, scale=10.0):
    pts = rng.randn(n_valid, c).astype(np.float32) * scale
    full = np.zeros((n_pad, c), np.float32)
    full[:n_valid] = pts
    mask = np.zeros((n_pad,), bool)
    mask[:n_valid] = True
    return pts, full, mask


def test_square_distance(rng):
    a = rng.randn(17, 3).astype(np.float32)
    b = rng.randn(23, 3).astype(np.float32)
    got = np.asarray(ops.square_distance(jnp.asarray(a), jnp.asarray(b)))
    want = np.sum((a[:, None] - b[None]) ** 2, -1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fps_matches_reference_unmasked(rng):
    pts = rng.randn(64, 3).astype(np.float32) * 5
    got = np.asarray(ops.furthest_point_sample(jnp.asarray(pts), 16))
    want = np_fps(pts.astype(np.float64), 16)
    np.testing.assert_array_equal(got, want)


def test_fps_masked_equals_unmasked_on_valid(rng):
    pts, full, mask = _padded(rng, 40, 64)
    got = np.asarray(ops.furthest_point_sample(
        jnp.asarray(full), 16, jnp.asarray(mask)))
    want = np_fps(pts.astype(np.float64), 16)
    np.testing.assert_array_equal(got, want)
    assert np.all(got < 40)


def test_fps_more_samples_than_points_covers_all(rng):
    pts, full, mask = _padded(rng, 10, 32)
    got = np.asarray(ops.furthest_point_sample(
        jnp.asarray(full), 32, jnp.asarray(mask)))
    assert set(got[:10].tolist()) == set(range(10))  # all valid points picked
    assert np.all(got < 10)  # never selects padding


def test_fps_fused_kernel_matches_xla_loop(rng):
    """pallas_fps_kernel (interpret) ≡ the XLA fori_loop path, which the
    oracle tests above pin; covers unmasked/masked/duplicate regimes."""
    from ratrack_tpu.ops.pallas_fps_kernel import fps_indices_fused

    n = 128
    pts = rng.randn(n, 3).astype(np.float32) * 5
    mask = rng.rand(n) < 0.6
    cases = [
        (jnp.asarray(pts), 16, None),                   # unmasked
        (jnp.asarray(pts), 32, jnp.asarray(mask)),      # masked
        (jnp.asarray(pts), 128, jnp.asarray(rng.rand(n) < 0.1)),
        # duplicates: npoint far beyond the valid count
    ]
    for xyz, npoint, m in cases:
        want = np.asarray(ops.furthest_point_sample(xyz, npoint, m))
        got = np.asarray(fps_indices_fused(xyz, npoint, m,
                                           interpret=True))
        np.testing.assert_array_equal(got, want)


def test_fps_fused_kernel_batched(rng):
    """The custom_vmap grid batching the model's train/eval steps use."""
    from ratrack_tpu.ops.pallas_fps_kernel import fps_indices_fused

    b, n = 3, 128
    pts = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 5)
    mask = jnp.asarray(rng.rand(b, n) < 0.7)
    got = jax.vmap(lambda p, m: fps_indices_fused(
        p, 24, m, interpret=True))(pts, mask)
    for i in range(b):
        want = ops.furthest_point_sample(pts[i], 24, mask[i])
        np.testing.assert_array_equal(np.asarray(got[i]),
                                      np.asarray(want))


def test_identity_sample(rng):
    _, _, mask = _padded(rng, 10, 32)
    got = np.asarray(ops.identity_sample(32, 32, jnp.asarray(mask)))
    np.testing.assert_array_equal(got[:10], np.arange(10))
    np.testing.assert_array_equal(got[10:], np.zeros(22, np.int64))


def test_ball_query_matches_reference(rng):
    pts = rng.randn(50, 3).astype(np.float32) * 2
    centers = pts[np_fps(pts.astype(np.float64), 12)]
    got = np.asarray(ops.ball_query(1.5, 8, jnp.asarray(pts),
                                    jnp.asarray(centers)))
    want = np_ball_query(1.5, 8, pts, centers)
    np.testing.assert_array_equal(got, want)


def test_ball_query_masked(rng):
    pts, full, mask = _padded(rng, 30, 48, scale=2.0)
    centers = pts[:5]
    got = np.asarray(ops.ball_query(2.0, 6, jnp.asarray(full),
                                    jnp.asarray(centers), jnp.asarray(mask)))
    want = np_ball_query(2.0, 6, pts, centers)
    np.testing.assert_array_equal(got, want)


def test_ball_query_no_hit_returns_zero(rng):
    pts = rng.randn(10, 3).astype(np.float32)
    centers = np.full((2, 3), 100.0, np.float32)
    got = np.asarray(ops.ball_query(0.5, 4, jnp.asarray(pts),
                                    jnp.asarray(centers)))
    np.testing.assert_array_equal(got, np.zeros((2, 4)))


def test_knn_set_parity(rng):
    pts, full, mask = _padded(rng, 37, 64)
    q = rng.randn(9, 3).astype(np.float32) * 10
    d2, idx = ops.knn(5, jnp.asarray(q), jnp.asarray(full), jnp.asarray(mask))
    d2, idx = np.asarray(d2), np.asarray(idx)
    want_d, want_i = np_knn(5, q, pts)
    # topk ties may reorder equal distances; compare as sorted sets per row
    for r in range(9):
        assert set(idx[r].tolist()) == set(want_i[r].tolist())
    np.testing.assert_allclose(np.sort(d2, 1), np.sort(want_d, 1),
                               rtol=1e-3, atol=1e-3)
    assert np.all(idx < 37)


def test_knn_fewer_valid_than_k_pads_with_nearest(rng):
    pts, full, mask = _padded(rng, 3, 16)
    q = rng.randn(4, 3).astype(np.float32)
    _, idx = ops.knn(8, jnp.asarray(q), jnp.asarray(full), jnp.asarray(mask))
    idx = np.asarray(idx)
    assert np.all(idx < 3)
    # slots beyond the 3 valid points repeat the nearest neighbor
    np.testing.assert_array_equal(idx[:, 3:], np.repeat(idx[:, :1], 5, 1))


def test_three_nn_and_interpolate(rng):
    known, fullk, maskk = _padded(rng, 20, 32)
    feats = rng.randn(32, 7).astype(np.float32)
    q = rng.randn(11, 3).astype(np.float32) * 10
    dist, idx = ops.three_nn(jnp.asarray(q), jnp.asarray(fullk),
                             jnp.asarray(maskk))
    w = ops.three_interpolate_weights(dist)
    out = np.asarray(ops.three_interpolate(jnp.asarray(feats), idx, w))

    want_d, want_i = np_knn(3, q, known)
    recip = 1.0 / (np.sqrt(want_d) + 1e-8)
    want_w = recip / recip.sum(1, keepdims=True)
    want = np_three_interpolate(feats[:20], want_i, want_w)
    np.testing.assert_allclose(out, want, rtol=1e-3, atol=1e-3)


def test_query_and_group_shape_and_content(rng):
    pts, full, mask = _padded(rng, 25, 32, scale=1.5)
    feats = rng.randn(32, 4).astype(np.float32)
    centers = pts[:6]
    out = np.asarray(ops.query_and_group(
        2.0, 8, jnp.asarray(full), jnp.asarray(centers), jnp.asarray(feats),
        jnp.asarray(mask)))
    assert out.shape == (6, 8, 7)
    idx = np_ball_query(2.0, 8, pts, centers)
    np.testing.assert_allclose(out[..., :3],
                               pts[idx] - centers[:, None], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out[..., 3:], feats[idx], rtol=1e-6)


def test_gather_grad_is_scatter_add(rng):
    import jax
    pts = jnp.asarray(rng.randn(10, 4).astype(np.float32))
    idx = jnp.asarray(np.array([0, 0, 3], np.int32))

    def f(p):
        return jnp.sum(ops.gather(p, idx) * 2.0)

    g = np.asarray(jax.grad(f)(pts))
    want = np.zeros((10, 4), np.float32)
    want[0] = 4.0  # gathered twice
    want[3] = 2.0
    np.testing.assert_allclose(g, want)


class TestOneHotMatmulGather:
    """take_rows_mm must be BIT-exact to jnp.take (fwd and grad): it is
    the TPU train-path route for gather/group/three_interpolate, replacing
    the scatter-add backward (55% of the profiled train step) with MXU
    matmuls."""

    def test_forward_exact_f32(self):
        from ratrack_tpu.ops.sampling import take_rows_mm
        rng = np.random.RandomState(0)
        pts = jnp.asarray(rng.randn(97, 19).astype(np.float32) * 1e3)
        idx = jnp.asarray(rng.randint(0, 97, size=(230,)).astype(np.int32))
        np.testing.assert_array_equal(
            np.asarray(take_rows_mm(pts, idx)),
            np.asarray(jnp.take(pts, idx, axis=0)))

    def test_forward_exact_bf16(self):
        from ratrack_tpu.ops.sampling import take_rows_mm
        rng = np.random.RandomState(1)
        pts = jnp.asarray(rng.randn(64, 8).astype(np.float32)
                          ).astype(jnp.bfloat16)
        idx = jnp.asarray(rng.randint(0, 64, size=(40,)).astype(np.int32))
        got = take_rows_mm(pts, idx)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(got.astype(jnp.float32)),
            np.asarray(jnp.take(pts, idx, axis=0).astype(jnp.float32)))

    def test_gradient_matches_scatter_add(self):
        import jax
        from ratrack_tpu.ops.sampling import take_rows_mm
        rng = np.random.RandomState(2)
        pts = jnp.asarray(rng.randn(31, 5).astype(np.float32))
        # duplicate indices: the backward must ACCUMULATE like scatter-add
        idx = jnp.asarray(np.array([0, 3, 3, 3, 30, 7], np.int32))
        ct = jnp.asarray(rng.randn(6, 5).astype(np.float32))
        g_mm = jax.grad(lambda p: jnp.vdot(take_rows_mm(p, idx), ct))(pts)
        g_tk = jax.grad(
            lambda p: jnp.vdot(jnp.take(p, idx, axis=0), ct))(pts)
        np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_tk),
                                   atol=1e-6, rtol=1e-6)


class TestTopKExtract:
    """Sort-free stable top-k: must match lax.top_k on finite slots."""

    def test_matches_lax_topk_with_ties(self):
        from ratrack_tpu.ops.neighborhood import top_k_extract
        rng = np.random.RandomState(0)
        keys = rng.randint(0, 50, size=(7, 64)).astype(np.float32)  # ties
        for k in (1, 3, 16, 32):
            v1, i1 = jax.lax.top_k(jnp.asarray(keys), k)
            v2, i2 = top_k_extract(jnp.asarray(keys), k)
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
            np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_batched_3d(self):
        from ratrack_tpu.ops.neighborhood import top_k_extract
        rng = np.random.RandomState(1)
        keys = rng.randn(2, 5, 40).astype(np.float32)
        v1, i1 = jax.lax.top_k(jnp.asarray(keys), 4)
        v2, i2 = top_k_extract(jnp.asarray(keys), 4)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_finite_slots_with_neginf_padding(self):
        from ratrack_tpu.ops.neighborhood import top_k_extract
        keys = np.full((3, 16), -np.inf, np.float32)
        keys[0, 5] = 2.0
        keys[0, 9] = 1.0
        keys[2, 0] = 7.0
        v, i = top_k_extract(jnp.asarray(keys), 4)
        v, i = np.asarray(v), np.asarray(i)
        assert (v[0, :2] == [2.0, 1.0]).all() and (i[0, :2] == [5, 9]).all()
        assert v[2, 0] == 7.0 and i[2, 0] == 0
        assert np.all(v[0, 2:] == -np.inf) and np.all(v[1] == -np.inf)

    def test_gradient_routes_to_selected(self):
        import jax as _jax
        from ratrack_tpu.ops.neighborhood import top_k_extract
        keys = jnp.asarray(np.array([[3.0, 1.0, 3.0, 2.0]], np.float32))
        # tie at 3.0: stable order selects index 0 first, then index 2
        g = _jax.grad(lambda x: top_k_extract(x, 2)[0].sum())(keys)
        np.testing.assert_array_equal(np.asarray(g),
                                      [[1.0, 0.0, 1.0, 0.0]])


class TestTopKBlocked:
    """Two-level tournament == lax.top_k exactly (values, indices, stable
    global tie order), incl. non-multiple widths and padding rows."""

    def test_matches_lax_topk(self):
        from ratrack_tpu.ops.neighborhood import top_k_blocked
        rng = np.random.RandomState(0)
        keys = rng.randn(17, 2048).astype(np.float32)
        for k in (3, 16, 32):
            v1, i1 = jax.lax.top_k(jnp.asarray(keys), k)
            v2, i2 = top_k_blocked(jnp.asarray(keys), k)
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
            np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_cross_block_ties_lowest_global_index(self):
        from ratrack_tpu.ops.neighborhood import top_k_blocked
        keys = np.zeros((1, 2048), np.float32)
        # equal maxima in blocks 3, 0, 1 -> indices must come back sorted
        keys[0, 1700] = 5.0
        keys[0, 30] = 5.0
        keys[0, 800] = 5.0
        keys[0, 31] = 4.0
        v, i = top_k_blocked(jnp.asarray(keys), 4)
        np.testing.assert_array_equal(np.asarray(i)[0], [30, 800, 1700, 31])
        np.testing.assert_array_equal(np.asarray(v)[0], [5, 5, 5, 4])

    def test_non_multiple_width(self):
        from ratrack_tpu.ops.neighborhood import top_k_blocked
        rng = np.random.RandomState(1)
        keys = rng.randn(5, 2048 + 300).astype(np.float32)
        v1, i1 = jax.lax.top_k(jnp.asarray(keys), 8)
        v2, i2 = top_k_blocked(jnp.asarray(keys), 8)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_gradient_routes_through_tournament(self):
        from ratrack_tpu.ops.neighborhood import top_k_blocked
        rng = np.random.RandomState(2)
        keys = jnp.asarray(rng.randn(3, 2048).astype(np.float32))
        g1 = jax.grad(lambda x: jax.lax.top_k(x, 5)[0].sum())(keys)
        g2 = jax.grad(lambda x: top_k_blocked(x, 5)[0].sum())(keys)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=1e-6)
