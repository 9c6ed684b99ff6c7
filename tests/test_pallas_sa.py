"""Parity tests for the fused set-abstraction Pallas kernel.

The fused kernel (ops/pallas_sa.py) must reproduce the unfused eval chain
ball_query + group + BN-folded MLP + max-pool (reference CUDA semantics:
ball_query_gpu.cu:9-46 first-hit padding / zero-on-no-hit,
group_points_gpu.cu, SharedMLP pytorch_utils.py:5-33). Tests run the
kernel through the Pallas interpreter (CPU suite); the TPU compiled path
is exercised by bench.py and __graft_entry__.

Distance rounding: the fused kernel evaluates d2 on the VPU in expanded
f32 form while the unfused path uses an MXU HIGHEST dot — pairs within
~1e-6 relative of the radius boundary may legitimately select differently
(the reference CUDA kernel is a third rounding of the same quantity), so
test data keeps a margin off the boundary (asserted explicitly).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratrack_tpu.models.layers import PointwiseMLP
from ratrack_tpu.models.pnhead import PNHead
from ratrack_tpu.ops import pallas_sa
from ratrack_tpu.ops.neighborhood import ball_query, square_distance
from ratrack_tpu.ops.pallas_sa import (fold_bn_params, fused_sa_scale,
                                       sa_scale_reference)

HI = jax.lax.Precision.HIGHEST


def _case(seed, n, c, c1=64, c2=64, extra_layer=False, scale=5.0):
    rng = np.random.RandomState(seed)
    xyz = jnp.asarray(rng.randn(n, 3).astype(np.float32) * scale)
    feat = (jnp.asarray(rng.randn(n, c).astype(np.float32))
            if c else None)
    mask = jnp.asarray(rng.rand(n) > 0.3)
    ws = [jnp.asarray(rng.randn(3 + c, c1).astype(np.float32) * 0.2),
          jnp.asarray(rng.randn(c1, c2).astype(np.float32) * 0.2)]
    bs = [jnp.asarray(rng.randn(c1).astype(np.float32) * 0.1),
          jnp.asarray(rng.randn(c2).astype(np.float32) * 0.1)]
    if extra_layer:
        ws.append(jnp.asarray(rng.randn(c2, 32).astype(np.float32) * 0.2))
        bs.append(jnp.asarray(rng.randn(32).astype(np.float32) * 0.1))
    return xyz, feat, mask, tuple(ws), tuple(bs)


def _stable_rows(xyz, mask, radius, margin=1e-4):
    """Centers whose selection cannot flip under distance rounding.

    A center is excluded when any valid point sits within `margin` of its
    radius boundary — there the VPU-expanded and MXU-HIGHEST d2 roundings
    (and the reference CUDA per-coordinate FMA) may legitimately disagree.
    """
    d2 = np.asarray(square_distance(xyz, xyz)).astype(np.float64)
    near = np.abs(d2 - radius * radius) < margin
    if mask is not None:
        near &= np.asarray(mask)[None, :]
    rows = ~near.any(axis=1)
    assert rows.mean() > 0.95     # the comparison must stay meaningful
    return rows


def _fused(xyz, feat, mask, ws, bs, r, ns):
    return fused_sa_scale(xyz, xyz, feat, mask, ws, bs, radius=r,
                          nsample=ns, compute_dtype=jnp.float32,
                          precision=HI, interpret=True)


class TestFusedSAScale:
    @pytest.mark.parametrize("r,ns", [(2.0, 8), (4.0, 16), (8.0, 32),
                                      (16.0, 32), (2.0, 4)])
    def test_parity_vs_unfused(self, r, ns):
        xyz, feat, mask, ws, bs = _case(0, 512, 32)
        rows = _stable_rows(xyz, mask, r)
        ref = np.asarray(sa_scale_reference(xyz, xyz, feat, mask, ws, bs,
                                            radius=r, nsample=ns))
        got = np.asarray(_fused(xyz, feat, mask, ws, bs, r, ns))
        np.testing.assert_allclose(got[rows], ref[rows],
                                   atol=1e-4, rtol=1e-4)

    def test_three_layer_mlp(self):
        xyz, feat, mask, ws, bs = _case(1, 512, 16, c1=16, c2=16,
                                        extra_layer=True)
        ref = sa_scale_reference(xyz, xyz, feat, mask, ws, bs,
                                 radius=4.0, nsample=8)
        got = _fused(xyz, feat, mask, ws, bs, 4.0, 8)
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)

    def test_no_features(self):
        xyz, _, mask, ws, bs = _case(2, 512, 0)
        ref = sa_scale_reference(xyz, xyz, None, mask, ws, bs,
                                 radius=4.0, nsample=16)
        got = _fused(xyz, None, mask, ws, bs, 4.0, 16)
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)

    def test_no_hit_fallback_pairs_with_point_zero(self):
        # centers shifted far outside the radius of every point: CUDA
        # leaves idx 0 -> the pooled value is the MLP of pair (center,
        # point 0). (A tiny radius with centers == points would sit ON the
        # self-distance rounding boundary instead of clear of it.)
        xyz, feat, mask, ws, bs = _case(3, 512, 32)
        centers = xyz + jnp.asarray([100.0, 100.0, 100.0])
        ref = sa_scale_reference(xyz, centers, feat, mask, ws, bs,
                                 radius=0.5, nsample=8)
        got = fused_sa_scale(xyz, centers, feat, mask, ws, bs, radius=0.5,
                             nsample=8, compute_dtype=jnp.float32,
                             precision=HI, interpret=True)
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)

    def test_all_invalid_mask(self):
        xyz, feat, _, ws, bs = _case(4, 512, 32)
        mask0 = jnp.zeros((512,), bool)
        ref = sa_scale_reference(xyz, xyz, feat, mask0, ws, bs,
                                 radius=4.0, nsample=16)
        got = _fused(xyz, feat, mask0, ws, bs, 4.0, 16)
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)

    def test_mask_none(self):
        xyz, feat, _, ws, bs = _case(5, 512, 32)
        ref = sa_scale_reference(xyz, xyz, feat, None, ws, bs,
                                 radius=4.0, nsample=16)
        got = _fused(xyz, feat, None, ws, bs, 4.0, 16)
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)

    def test_multi_chunk_n1024(self):
        # N=1024 runs two CHUNK_N=512 iterations: the prefix-count offset
        # across chunks must keep global first-nsample semantics
        xyz, feat, mask, ws, bs = _case(6, 1024, 16, c1=32, c2=32)
        rows = _stable_rows(xyz, mask, 4.0)
        ref = np.asarray(sa_scale_reference(xyz, xyz, feat, mask, ws, bs,
                                            radius=4.0, nsample=16))
        got = np.asarray(_fused(xyz, feat, mask, ws, bs, 4.0, 16))
        np.testing.assert_allclose(got[rows], ref[rows],
                                   atol=1e-4, rtol=1e-4)
        # truncation across the chunk boundary actually occurred
        d2 = np.asarray(square_distance(xyz, xyz))
        hits = ((d2 < 16.0) & np.asarray(mask)[None, :]).sum(1)
        assert (hits > 16).any()

    def test_distinct_centers(self):
        # centers != points (the exact_fps path gathers real FPS centers)
        xyz, feat, mask, ws, bs = _case(7, 512, 32)
        rng = np.random.RandomState(99)
        centers = jnp.asarray(rng.randn(128, 3).astype(np.float32) * 5)
        ref = sa_scale_reference(xyz, centers, feat, mask, ws, bs,
                                 radius=8.0, nsample=16)
        got = fused_sa_scale(xyz, centers, feat, mask, ws, bs, radius=8.0,
                             nsample=16, compute_dtype=jnp.float32,
                             precision=HI, interpret=True)
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)

    def test_selection_matches_ball_query_sets(self):
        # the kernel's slot set == the CUDA-semantics ball_query index set
        xyz, feat, mask, ws, bs = _case(8, 512, 32)
        r, ns = 8.0, 16
        idx = np.asarray(ball_query(r, ns, xyz, xyz, mask))
        d2 = np.asarray(square_distance(xyz, xyz))
        hit = (d2 < r * r) & np.asarray(mask)[None, :]
        rank = np.cumsum(hit, axis=1)
        sel = hit & (rank <= ns)
        for i in range(512):
            fused_set = set(np.where(sel[i])[0].tolist()) or {0}
            assert fused_set == set(idx[i].tolist())


class TestFoldBN:
    def test_fold_matches_eval_mlp(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(64, 7, 35).astype(np.float32))
        mlp = PointwiseMLP([32, 64], bn=True, dtype=jnp.float32)
        vs = mlp.init(jax.random.PRNGKey(0), x, train=False)
        # nontrivial running stats + affine params
        stats = jax.tree_util.tree_map(
            lambda a: a + jnp.asarray(
                rng.rand(*a.shape).astype(np.float32)) * 0.5,
            vs["batch_stats"])
        params = jax.tree_util.tree_map(
            lambda a: a + jnp.asarray(
                rng.randn(*a.shape).astype(np.float32)) * 0.1, vs["params"])
        vs = {"params": params, "batch_stats": stats}
        ref = mlp.apply(vs, x, train=False)
        ws, bs = fold_bn_params(vs)
        h = x
        for w, b in zip(ws, bs):
            h = jax.nn.relu(h @ w + b)
        np.testing.assert_allclose(np.asarray(h), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


class TestPNHeadFusedIntegration:
    def test_pnhead_fused_matches_unfused_eval(self, monkeypatch):
        monkeypatch.setattr(pallas_sa, "FORCE_FUSED_ON_CPU", True)
        rng = np.random.RandomState(0)
        xyz = jnp.asarray(rng.randn(512, 3).astype(np.float32) * 5)
        feat = jnp.asarray(rng.randn(512, 2).astype(np.float32))
        mask = jnp.asarray(np.arange(512) < 300)
        head_f = PNHead(512, dtype=jnp.float32, fused_eval=True)
        head_u = PNHead(512, dtype=jnp.float32, fused_eval=False)
        vs = head_u.init(jax.random.PRNGKey(0), xyz, feat, mask,
                         train=False)
        _, out_u = head_u.apply(vs, xyz, feat, mask, train=False)
        _, out_f = head_f.apply(vs, xyz, feat, mask, train=False)
        # same param tree, both f32 on CPU: only distance-boundary pairs
        # and sub-ulp accumulation order may differ
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                                   atol=5e-3, rtol=5e-3)

    def test_param_tree_identical(self, monkeypatch):
        monkeypatch.setattr(pallas_sa, "FORCE_FUSED_ON_CPU", True)
        rng = np.random.RandomState(0)
        xyz = jnp.asarray(rng.randn(512, 3).astype(np.float32))
        feat = jnp.asarray(rng.randn(512, 2).astype(np.float32))
        vs_f = PNHead(512, fused_eval=True).init(
            jax.random.PRNGKey(0), xyz, feat, None, train=False)
        vs_u = PNHead(512, fused_eval=False).init(
            jax.random.PRNGKey(0), xyz, feat, None, train=False)
        pf = jax.tree_util.tree_map(jnp.shape, vs_f)
        pu = jax.tree_util.tree_map(jnp.shape, vs_u)
        assert pf == pu
        leaves_f = jax.tree_util.tree_leaves(vs_f["params"])
        leaves_u = jax.tree_util.tree_leaves(vs_u["params"])
        for a, b in zip(leaves_f, leaves_u):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestSmallCloudRegression:
    """N < CHUNK_N clouds (e.g. the 256-pt synthetic config): the kernel
    must slice with the per-call chunk, not the global CHUNK_N constant —
    regression for a shape mismatch that broke every fused N=256 eval."""

    @pytest.mark.parametrize("n", [128, 256, 384])
    def test_parity_small_n(self, n):
        xyz, feat, mask, ws, bs = _case(7, n, 32)
        r, ns = 4.0, 8
        rows = _stable_rows(xyz, mask, r)
        ref = np.asarray(sa_scale_reference(xyz, xyz, feat, mask, ws, bs,
                                            radius=r, nsample=ns))
        got = np.asarray(_fused(xyz, feat, mask, ws, bs, r, ns))
        np.testing.assert_allclose(got[rows], ref[rows],
                                   atol=1e-4, rtol=1e-4)


class TestFusedSAPair:
    """One merged-pair kernel == two single-scale kernels, bit-exact."""

    @pytest.mark.parametrize("cfg", [
        dict(ra=2.0, rb=4.0, na=4, nb=8),       # sa1 shape
        dict(ra=8.0, rb=16.0, na=16, nb=32),    # sa3 shape
    ])
    def test_pair_matches_two_singles(self, cfg):
        from ratrack_tpu.ops.pallas_sa import fused_sa_pair
        xyz, feat, mask, ws, bs = _case(3, 512, 32)
        rng = np.random.RandomState(9)
        c1b, c2b = 24, 16
        ws_b = (jnp.asarray(rng.randn(3 + 32, c1b).astype(np.float32) * .2),
                jnp.asarray(rng.randn(c1b, c2b).astype(np.float32) * .2))
        bs_b = (jnp.asarray(rng.randn(c1b).astype(np.float32) * .1),
                jnp.asarray(rng.randn(c2b).astype(np.float32) * .1))
        a1 = _fused(xyz, feat, mask, ws, bs, cfg["ra"], cfg["na"])
        b1 = fused_sa_scale(xyz, xyz, feat, mask, ws_b, bs_b,
                            radius=cfg["rb"], nsample=cfg["nb"],
                            compute_dtype=jnp.float32, precision=HI,
                            interpret=True)
        a2, b2 = fused_sa_pair(xyz, xyz, feat, mask, ws, bs, ws_b, bs_b,
                               radius_a=cfg["ra"], radius_b=cfg["rb"],
                               nsample_a=cfg["na"], nsample_b=cfg["nb"],
                               compute_dtype=jnp.float32, precision=HI,
                               interpret=True)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))

    def test_pair_small_cloud(self):
        from ratrack_tpu.ops.pallas_sa import fused_sa_pair
        xyz, feat, mask, ws, bs = _case(4, 256, 16, c1=16, c2=16)
        a1 = _fused(xyz, feat, mask, ws, bs, 4.0, 8)
        b1 = _fused(xyz, feat, mask, ws, bs, 8.0, 16)
        a2, b2 = fused_sa_pair(xyz, xyz, feat, mask, ws, bs, ws, bs,
                               radius_a=4.0, radius_b=8.0,
                               nsample_a=8, nsample_b=16,
                               compute_dtype=jnp.float32, precision=HI,
                               interpret=True)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


class TestNonChunkMultipleClouds:
    """n that is a multiple of 128 but NOT of 512 (e.g. 640) must work —
    the gate only checks n % 128 == 0; an assert used to crash these."""

    @pytest.mark.parametrize("n", [640, 768])
    def test_parity_n_not_multiple_of_512(self, n):
        from ratrack_tpu.ops.pallas_sa import fused_sa_pair
        xyz, feat, mask, ws, bs = _case(11, n, 16, c1=16, c2=16)
        r, ns = 4.0, 8
        rows = _stable_rows(xyz, mask, r)
        ref = np.asarray(sa_scale_reference(xyz, xyz, feat, mask, ws, bs,
                                            radius=r, nsample=ns))
        got = np.asarray(_fused(xyz, feat, mask, ws, bs, r, ns))
        np.testing.assert_allclose(got[rows], ref[rows],
                                   atol=1e-4, rtol=1e-4)
        a2, b2 = fused_sa_pair(xyz, xyz, feat, mask, ws, bs, ws, bs,
                               radius_a=r, radius_b=8.0,
                               nsample_a=ns, nsample_b=16,
                               compute_dtype=jnp.float32, precision=HI,
                               interpret=True)
        np.testing.assert_array_equal(np.asarray(a2), got)
