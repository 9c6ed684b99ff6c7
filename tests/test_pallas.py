"""Parity tests for the tiled Pallas kNN kernel (interpreter mode on CPU)
against the dense reference implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from ratrack_tpu.ops.neighborhood import knn as knn_dense
from ratrack_tpu.ops.pallas_knn import knn_tiled, knn_indices_tiled


def _cloud(rng, n, spread=10.0):
    return (rng.randn(n, 3) * spread).astype(np.float32)


@pytest.mark.parametrize("n,m,k", [(64, 96, 4), (200, 130, 8), (256, 256, 16)])
def test_matches_dense_unmasked(rng, n, m, k):
    q, p = _cloud(rng, n), _cloud(rng, m)
    d_ref, i_ref = knn_dense(k, jnp.asarray(q), jnp.asarray(p))
    d_got, i_got = knn_tiled(k, jnp.asarray(q), jnp.asarray(p),
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d_got), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-4)


def test_matches_dense_masked(rng):
    n, m, k = 100, 150, 8
    q, p = _cloud(rng, n), _cloud(rng, m)
    mask = rng.rand(m) > 0.3
    d_ref, i_ref = knn_dense(k, jnp.asarray(q), jnp.asarray(p),
                             jnp.asarray(mask))
    d_got, i_got = knn_tiled(k, jnp.asarray(q), jnp.asarray(p),
                             jnp.asarray(mask), interpret=True)
    np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d_got), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-4)


def test_fewer_valid_than_k_first_hit_padding(rng):
    n, m, k = 40, 64, 8
    q, p = _cloud(rng, n), _cloud(rng, m)
    mask = np.zeros(m, bool)
    mask[[3, 10, 17]] = True       # only 3 valid points, k=8
    i_got = np.asarray(knn_indices_tiled(
        jnp.asarray(q), jnp.asarray(p), jnp.asarray(mask), k=k,
        interpret=True))
    i_ref = np.asarray(knn_dense(k, jnp.asarray(q), jnp.asarray(p),
                                 jnp.asarray(mask))[1])
    np.testing.assert_array_equal(i_got, i_ref)
    # slots beyond the 3 valid repeat the nearest valid index
    assert set(np.unique(i_got)) <= {3, 10, 17}
    for row in i_got:
        assert (row[3:] == row[0]).all()


def test_all_invalid_returns_zero(rng):
    q, p = _cloud(rng, 16), _cloud(rng, 32)
    mask = np.zeros(32, bool)
    i_got = np.asarray(knn_indices_tiled(
        jnp.asarray(q), jnp.asarray(p), jnp.asarray(mask), k=4,
        interpret=True))
    assert (i_got == 0).all()


def test_exact_ties_pick_lowest_index(rng):
    # duplicate points → tie on distance; both paths must pick low index
    q = np.zeros((8, 3), np.float32)
    p = np.zeros((16, 3), np.float32)          # all coincident with queries
    i_got = np.asarray(knn_indices_tiled(
        jnp.asarray(q), jnp.asarray(p), k=4, interpret=True))
    np.testing.assert_array_equal(
        i_got, np.broadcast_to(np.arange(4, dtype=np.int32), (8, 4)))


def test_nonmultiple_tile_sizes(rng):
    """N, M far from the 128/1024 tile multiples exercise padding."""
    n, m, k = 70, 1333, 5
    q, p = _cloud(rng, n), _cloud(rng, m)
    i_ref = np.asarray(knn_dense(k, jnp.asarray(q), jnp.asarray(p))[1])
    i_got = np.asarray(knn_indices_tiled(jnp.asarray(q), jnp.asarray(p),
                                         k=k, interpret=True))
    np.testing.assert_array_equal(i_got, i_ref)


@pytest.mark.parametrize("n,m,k,chunk", [(300, 200, 8, 128),
                                         (512, 512, 16, 512),
                                         (100, 50, 4, 64)])
def test_chunked_matches_dense(rng, n, m, k, chunk):
    from ratrack_tpu.ops.neighborhood import knn_chunked
    q, p = _cloud(rng, n), _cloud(rng, m)
    mask = rng.rand(m) > 0.2
    d_ref, i_ref = knn_dense(k, jnp.asarray(q), jnp.asarray(p),
                             jnp.asarray(mask))
    d_got, i_got = knn_chunked(k, jnp.asarray(q), jnp.asarray(p),
                               jnp.asarray(mask), chunk=chunk)
    np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d_got), np.asarray(d_ref),
                               rtol=1e-4, atol=1e-3)


def test_knn_auto_dispatches_both_ways(rng):
    from ratrack_tpu.ops.neighborhood import knn_auto
    q, p = _cloud(rng, 64), _cloud(rng, 64)
    d_small, i_small = knn_auto(4, jnp.asarray(q), jnp.asarray(p))
    d_ref, i_ref = knn_dense(4, jnp.asarray(q), jnp.asarray(p))
    np.testing.assert_array_equal(np.asarray(i_small), np.asarray(i_ref))
    # large path: force dispatch with a big synthetic cloud
    q2 = _cloud(rng, 3000)
    p2 = _cloud(rng, 2000)
    d_big, i_big = knn_auto(4, jnp.asarray(q2), jnp.asarray(p2))
    d_ref2, i_ref2 = knn_dense(4, jnp.asarray(q2), jnp.asarray(p2))
    np.testing.assert_array_equal(np.asarray(i_big), np.asarray(i_ref2))


def test_gradient_flows_through_tiled_distances(rng):
    """knn_tiled's dist2 is differentiable w.r.t. both clouds."""
    import jax
    q, p = _cloud(rng, 32), _cloud(rng, 48)

    def f(q_, p_):
        d2, _ = knn_tiled(4, q_, p_, interpret=True)
        return jnp.sum(d2)

    gq, gp = jax.grad(f, argnums=(0, 1))(jnp.asarray(q), jnp.asarray(p))
    assert np.isfinite(np.asarray(gq)).all()
    assert np.isfinite(np.asarray(gp)).all()
    assert np.abs(np.asarray(gq)).sum() > 0


@pytest.mark.parametrize("m,n,ns,chunk", [(300, 200, 8, 128),
                                          (512, 512, 32, 256)])
def test_ball_query_chunked_matches_dense(rng, m, n, ns, chunk):
    from ratrack_tpu.ops.neighborhood import ball_query, ball_query_chunked
    pts = _cloud(rng, n, spread=3.0)
    ctr = _cloud(rng, m, spread=3.0)
    mask = rng.rand(n) > 0.2
    i_ref = ball_query(2.5, ns, jnp.asarray(pts), jnp.asarray(ctr),
                       jnp.asarray(mask))
    i_got = ball_query_chunked(2.5, ns, jnp.asarray(pts), jnp.asarray(ctr),
                               jnp.asarray(mask), chunk=chunk)
    np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))


@pytest.mark.parametrize("sortit", [False, True])
def test_indices_tiled_multichunk_gates_bitexact(rng, sortit):
    """Chunk-pruning gates (bounding-sphere + rowmax, pallas_knn.py)
    and the locality-first visit order must never change selections.

    Per-pair key arithmetic is identical for EVERY chunk geometry, so
    different (tq, tp) configs fire the gates completely differently —
    on far-apart clusters gate 1 prunes most chunks at tp=128 and
    nothing at tp=m — yet the outputs must be bit-identical. (A dense-
    path comparison would instead test the documented MXU-vs-VPU
    rounding-freedom class: at 60 m cluster offsets the expanded form
    loses ~4 digits to cancellation and near-ties flip; see the module
    docstring. The moderate-spread dense-parity tests above cover
    that contract.)"""
    n, m, k = 256, 1024, 8
    # 4 tight clusters 60 m apart + 20% invalid padding
    centers = np.array([[0, 0, 0], [60, 0, 0], [0, 60, 0], [60, 60, 0]],
                       np.float32)
    q = (centers[rng.randint(0, 4, n)]
         + rng.randn(n, 3).astype(np.float32))
    p = (centers[rng.randint(0, 4, m)]
         + rng.randn(m, 3).astype(np.float32))
    mask = rng.rand(m) > 0.2
    if sortit:
        from ratrack_tpu.ops import morton
        q = np.asarray(jnp.asarray(q)[morton.morton_perm(jnp.asarray(q))])
        perm = morton.morton_perm(jnp.asarray(p), jnp.asarray(mask))
        p = np.asarray(jnp.asarray(p)[perm])
        mask = np.asarray(jnp.asarray(mask)[perm])
    outs = [np.asarray(knn_indices_tiled(
        jnp.asarray(q), jnp.asarray(p), jnp.asarray(mask), k=k,
        tq=tq, tp=tp, interpret=True))
        for tq, tp in ((128, 128), (256, 512), (128, 1024))]
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])
