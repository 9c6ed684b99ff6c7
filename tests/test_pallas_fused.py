"""Parity tests for the fused FP-interpolation and correlator kernels.

ops/pallas_fp.py must reproduce three_nn + inverse-distance
three_interpolate (reference interpolate_gpu.cu:81-231 semantics incl.
the knn padding rules); ops/pallas_correlator.py must reproduce the
FeatureCorrelator stages (reference model_utils.py:166-250): kNN + gather
+ leaky MLP + WeightNet-weighted (unnormalized) sums. Kernels run through
the Pallas interpreter on the CPU suite; TPU compiled paths are exercised
by bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratrack_tpu.models.correlator import FeatureCorrelator
from ratrack_tpu.models.pnhead import FeaturePropagation
from ratrack_tpu.ops import pallas_sa
from ratrack_tpu.ops.grouping import interpolate_features
from ratrack_tpu.ops.pallas_fp import fused_three_interpolate

HI = jax.lax.Precision.HIGHEST


def _fp_case(seed, n=512, m=512, c=128):
    rng = np.random.RandomState(seed)
    u = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 5)
    k = jnp.asarray(rng.randn(m, 3).astype(np.float32) * 5)
    f = jnp.asarray(rng.randn(m, c).astype(np.float32))
    return rng, u, k, f


class TestFusedThreeInterpolate:
    def test_parity_no_mask(self):
        _, u, k, f = _fp_case(0)
        ref = interpolate_features(u, k, f)
        got = fused_three_interpolate(u, k, f, compute_dtype=jnp.float32,
                                      precision=HI, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)

    def test_parity_with_mask(self):
        rng, u, k, f = _fp_case(1)
        mask = jnp.asarray(rng.rand(512) > 0.5)
        ref = interpolate_features(u, k, f, mask)
        got = fused_three_interpolate(u, k, f, mask,
                                      compute_dtype=jnp.float32,
                                      precision=HI, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)

    def test_fewer_than_three_valid_repeats_nearest(self):
        rng, u, k, f = _fp_case(2)
        mask = jnp.asarray(np.arange(512) < 2)
        ref = interpolate_features(u, k, f, mask)
        got = fused_three_interpolate(u, k, f, mask,
                                      compute_dtype=jnp.float32,
                                      precision=HI, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)

    def test_all_invalid_falls_back_to_index_zero(self):
        _, u, k, f = _fp_case(3)
        mask = jnp.zeros((512,), bool)
        ref = interpolate_features(u, k, f, mask)
        got = fused_three_interpolate(u, k, f, mask,
                                      compute_dtype=jnp.float32,
                                      precision=HI, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)

    def test_feature_propagation_module_fused(self, monkeypatch):
        monkeypatch.setattr(pallas_sa, "FORCE_FUSED_ON_CPU", True)
        rng, u, k, f = _fp_case(4, c=64)
        uf = jnp.asarray(rng.randn(512, 32).astype(np.float32))
        mod_u = FeaturePropagation([128], jnp.float32, fused_eval=False)
        mod_f = FeaturePropagation([128], jnp.float32, fused_eval=True)
        vs = mod_u.init(jax.random.PRNGKey(0), u, k, uf, f, None,
                        train=False)
        a = np.asarray(mod_u.apply(vs, u, k, uf, f, None, train=False))
        b = np.asarray(mod_f.apply(vs, u, k, uf, f, None, train=False))
        np.testing.assert_allclose(b, a, atol=5e-3, rtol=5e-3)


class TestFusedCorrelator:
    def _case(self, seed, n=512):
        rng = np.random.RandomState(seed)
        pc1 = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 5)
        pc2 = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 5)
        f1 = jnp.asarray(rng.randn(n, 256).astype(np.float32))
        f2 = jnp.asarray(rng.randn(n, 256).astype(np.float32))
        return rng, pc1, pc2, f1, f2

    def _modules(self):
        return (FeatureCorrelator(16, (256, 256, 256), jnp.float32, False),
                FeatureCorrelator(16, (256, 256, 256), jnp.float32, True))

    def test_parity(self, monkeypatch):
        monkeypatch.setattr(pallas_sa, "FORCE_FUSED_ON_CPU", True)
        rng, pc1, pc2, f1, f2 = self._case(0)
        m1 = jnp.asarray(np.arange(512) < 400)
        m2 = jnp.asarray(np.arange(512) < 350)
        mod_u, mod_f = self._modules()
        vs = mod_u.init(jax.random.PRNGKey(0), pc1, pc2, f1, f2, m1, m2,
                        train=False)
        a = np.asarray(mod_u.apply(vs, pc1, pc2, f1, f2, m1, m2,
                                   train=False))
        b = np.asarray(mod_f.apply(vs, pc1, pc2, f1, f2, m1, m2,
                                   train=False))
        scale = np.abs(a).max()
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-5)

    def test_parity_few_valid(self, monkeypatch):
        # < nsample valid candidates: the kNN repeat-nearest padding
        # contributes duplicate terms to the weighted SUM (not max), so
        # the fallback must duplicate feature AND direction exactly
        monkeypatch.setattr(pallas_sa, "FORCE_FUSED_ON_CPU", True)
        rng, pc1, pc2, f1, f2 = self._case(1)
        m1 = jnp.asarray(np.arange(512) < 400)
        m2 = jnp.asarray(np.arange(512) < 5)
        mod_u, mod_f = self._modules()
        vs = mod_u.init(jax.random.PRNGKey(0), pc1, pc2, f1, f2, m1, m2,
                        train=False)
        a = np.asarray(mod_u.apply(vs, pc1, pc2, f1, f2, m1, m2,
                                   train=False))
        b = np.asarray(mod_f.apply(vs, pc1, pc2, f1, f2, m1, m2,
                                   train=False))
        scale = np.abs(a).max()
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-5)

    def test_param_tree_identical(self, monkeypatch):
        monkeypatch.setattr(pallas_sa, "FORCE_FUSED_ON_CPU", True)
        _, pc1, pc2, f1, f2 = self._case(2)
        mod_u, mod_f = self._modules()
        vs_u = mod_u.init(jax.random.PRNGKey(0), pc1, pc2, f1, f2,
                          train=False)
        vs_f = mod_f.init(jax.random.PRNGKey(0), pc1, pc2, f1, f2,
                          train=False)
        assert (jax.tree_util.tree_map(jnp.shape, vs_u)
                == jax.tree_util.tree_map(jnp.shape, vs_f))
        for a, b in zip(jax.tree_util.tree_leaves(vs_u["params"]),
                        jax.tree_util.tree_leaves(vs_f["params"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("n_valid", [350, 5, 0])
    def test_loop_select_matches_unrolled(self, n_valid):
        """The fori_loop selection (routing for M > 4096 — the unrolled
        form VMEM-OOMs there) must produce identical outputs to the
        unrolled path: same extraction order, same repeat-nearest and
        no-hit index-0 rules, same dots."""
        from ratrack_tpu.ops.pallas_correlator import (
            fused_knn_weight_aggregate)

        rng, pc1, pc2, f1, f2 = self._case(4, n=256)
        rngw = np.random.RandomState(7)
        featsp = jnp.asarray(rngw.randn(256, 64).astype(np.float32))
        addq = jnp.asarray(rngw.randn(256, 64).astype(np.float32))
        mlp_ws = [jnp.asarray(rngw.randn(64, 64).astype(np.float32))]
        mlp_bs = [jnp.asarray(rngw.randn(64).astype(np.float32))]
        wn_ws = [jnp.asarray(rngw.randn(3, 16).astype(np.float32)),
                 jnp.asarray(rngw.randn(16, 16).astype(np.float32)),
                 jnp.asarray(rngw.randn(16, 64).astype(np.float32))]
        wn_bs = [jnp.asarray(rngw.randn(c).astype(np.float32))
                 for c in (16, 16, 64)]
        mask = jnp.asarray(np.arange(256) < n_valid)

        kw = dict(mask_p=mask, mlp_ws=mlp_ws, mlp_bs=mlp_bs,
                  wn_ws=wn_ws, wn_bs=wn_bs, k=16)
        a = fused_knn_weight_aggregate(pc1[:256], pc2[:256], featsp,
                                       addq, **kw)
        b = fused_knn_weight_aggregate(pc1[:256], pc2[:256], featsp,
                                       addq, force_loop_select=True,
                                       **kw)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # stage-2 form (no pair MLP, no add_q)
        kw2 = dict(mask_p=mask, mlp_ws=[], mlp_bs=[],
                   wn_ws=wn_ws, wn_bs=wn_bs, k=16)
        a2 = fused_knn_weight_aggregate(pc1[:256], pc2[:256], featsp,
                                        None, **kw2)
        b2 = fused_knn_weight_aggregate(pc1[:256], pc2[:256], featsp,
                                        None, force_loop_select=True,
                                        **kw2)
        np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2))

    @pytest.mark.parametrize("n_valid", [350, 5, 0])
    def test_split_path_matches_all_in_vmem_kernel(self, n_valid):
        """knn_gather_apply (tiled-kNN idx + XLA gather + apply kernel,
        the >4096 routing) must match fused_knn_weight_aggregate exactly:
        identical selection rules (lowest-index ties, repeat-nearest,
        no-hit index 0 — both use the expanded-form distance in the same
        op order), exact f32 gathers either way, and the same MLP/
        WeightNet tail code."""
        from ratrack_tpu.ops.pallas_correlator import (
            fused_knn_weight_aggregate, knn_gather_apply)
        from ratrack_tpu.ops.pallas_knn import knn_indices_tiled

        rng, pc1, pc2, f1, f2 = self._case(5, n=256)
        rngw = np.random.RandomState(11)
        featsp = jnp.asarray(rngw.randn(256, 64).astype(np.float32))
        addq = jnp.asarray(rngw.randn(256, 64).astype(np.float32))
        mlp_ws = [jnp.asarray(rngw.randn(64, 64).astype(np.float32))]
        mlp_bs = [jnp.asarray(rngw.randn(64).astype(np.float32))]
        wn_ws = [jnp.asarray(rngw.randn(3, 16).astype(np.float32)),
                 jnp.asarray(rngw.randn(16, 16).astype(np.float32)),
                 jnp.asarray(rngw.randn(16, 64).astype(np.float32))]
        wn_bs = [jnp.asarray(rngw.randn(c).astype(np.float32))
                 for c in (16, 16, 64)]
        mask = jnp.asarray(np.arange(256) < n_valid)

        a = fused_knn_weight_aggregate(
            pc1[:256], pc2[:256], featsp, addq, mask_p=mask,
            mlp_ws=mlp_ws, mlp_bs=mlp_bs, wn_ws=wn_ws, wn_bs=wn_bs,
            k=16, compute_dtype=jnp.float32)
        idx = knn_indices_tiled(pc1[:256], pc2[:256], mask, k=16,
                                interpret=True)
        b = knn_gather_apply(
            idx, pc1[:256], pc2[:256], featsp, addq, mlp_ws, mlp_bs,
            wn_ws, wn_bs, k=16, compute_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # stage-2 form (no pair MLP, no add_q)
        a2 = fused_knn_weight_aggregate(
            pc1[:256], pc2[:256], featsp, None, mask_p=mask,
            mlp_ws=[], mlp_bs=[], wn_ws=wn_ws, wn_bs=wn_bs, k=16,
            compute_dtype=jnp.float32)
        b2 = knn_gather_apply(
            idx, pc1[:256], pc2[:256], featsp, None, [], [],
            wn_ws, wn_bs, k=16, compute_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2))

    def test_module_routes_split_path_past_4096(self, monkeypatch):
        """FeatureCorrelator at n > 4096 runs the split formulation and
        stays within the hoist-reassociation tolerance class of the
        unfused XLA path."""
        monkeypatch.setattr(pallas_sa, "FORCE_FUSED_ON_CPU", True)
        n = 4224                       # %128 ok, %256 no → TILE_M fallback
        rng = np.random.RandomState(6)
        pc1 = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 5)
        pc2 = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 5)
        f1 = jnp.asarray(rng.randn(n, 64).astype(np.float32))
        f2 = jnp.asarray(rng.randn(n, 64).astype(np.float32))
        m1 = jnp.asarray(np.arange(n) < n - 100)
        m2 = jnp.asarray(np.arange(n) < n - 50)
        mod_u = FeatureCorrelator(16, (64, 64, 64), jnp.float32, False)
        mod_f = FeatureCorrelator(16, (64, 64, 64), jnp.float32, True)
        vs = mod_u.init(jax.random.PRNGKey(0), pc1, pc2, f1, f2, m1, m2,
                        train=False)
        a = np.asarray(mod_u.apply(vs, pc1, pc2, f1, f2, m1, m2,
                                   train=False))
        b = np.asarray(mod_f.apply(vs, pc1, pc2, f1, f2, m1, m2,
                                   train=False))
        scale = np.abs(a).max()
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-5)

    def test_train_path_unchanged_by_flag(self):
        # train=True must never take the fused branch regardless of flag
        _, pc1, pc2, f1, f2 = self._case(3)
        mod_u, mod_f = self._modules()
        vs = mod_u.init(jax.random.PRNGKey(0), pc1, pc2, f1, f2,
                        train=True)
        a = np.asarray(mod_u.apply(vs, pc1, pc2, f1, f2, train=True))
        b = np.asarray(mod_f.apply(vs, pc1, pc2, f1, f2, train=True))
        np.testing.assert_array_equal(a, b)


class TestMortonSplitSort:
    """Z-order sort of the >4096 split path (ops/morton.py).

    Per-pair arithmetic is order-independent (expanded-form distances,
    row-wise hoists/apply), so running kNN + gather + apply on
    Z-sorted rows and unsorting the output must be BIT-IDENTICAL to
    the unsorted pipeline away from exact distance ties (random f32
    clouds have none)."""

    def test_morton_perm_is_permutation_invalid_last(self):
        from ratrack_tpu.ops import morton
        rng = np.random.RandomState(0)
        xyz = jnp.asarray(rng.randn(640, 3).astype(np.float32) * 50)
        mask = jnp.asarray(np.arange(640) % 3 != 1)
        perm = np.asarray(morton.morton_perm(xyz, mask))
        assert sorted(perm.tolist()) == list(range(640))
        n_valid = int(np.asarray(mask).sum())
        assert np.asarray(mask)[perm[:n_valid]].all()
        assert not np.asarray(mask)[perm[n_valid:]].any()

    def test_morton_code_orders_by_locality(self):
        from ratrack_tpu.ops import morton
        # two tight clusters far apart: the sort must not interleave them
        rng = np.random.RandomState(1)
        a = rng.randn(64, 3).astype(np.float32) + 100.0
        b = rng.randn(64, 3).astype(np.float32) - 100.0
        xyz = jnp.asarray(np.concatenate([a, b]))
        perm = np.asarray(morton.morton_perm(xyz))
        side = (perm < 64)
        # all of one cluster before all of the other
        flips = int((side[1:] != side[:-1]).sum())
        assert flips == 1

    def test_invert_perm(self):
        from ratrack_tpu.ops import morton
        rng = np.random.RandomState(2)
        perm = jnp.asarray(rng.permutation(512).astype(np.int32))
        inv = np.asarray(morton.invert_perm(perm))
        np.testing.assert_array_equal(np.asarray(perm)[inv],
                                      np.arange(512))

    @pytest.mark.parametrize("n_valid", [256, 40])
    def test_sorted_pipeline_bitexact_vs_unsorted(self, n_valid):
        from ratrack_tpu.ops import morton
        from ratrack_tpu.ops.pallas_correlator import knn_gather_apply
        from ratrack_tpu.ops.pallas_knn import knn_indices_tiled

        n = 256
        rng = np.random.RandomState(7)
        pc1 = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 5)
        pc2 = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 5)
        rngw = np.random.RandomState(8)
        featsp = jnp.asarray(rngw.randn(n, 64).astype(np.float32))
        addq = jnp.asarray(rngw.randn(n, 64).astype(np.float32))
        mlp_ws = [jnp.asarray(rngw.randn(64, 64).astype(np.float32))]
        mlp_bs = [jnp.asarray(rngw.randn(64).astype(np.float32))]
        wn_ws = [jnp.asarray(rngw.randn(3, 16).astype(np.float32)),
                 jnp.asarray(rngw.randn(16, 16).astype(np.float32)),
                 jnp.asarray(rngw.randn(16, 64).astype(np.float32))]
        wn_bs = [jnp.asarray(rngw.randn(c).astype(np.float32))
                 for c in (16, 16, 64)]
        mask1 = jnp.asarray(np.arange(n) < n_valid)
        mask2 = jnp.asarray(np.arange(n) < n_valid + 30)
        kw = dict(mlp_ws=mlp_ws, mlp_bs=mlp_bs, wn_ws=wn_ws,
                  wn_bs=wn_bs, k=16, compute_dtype=jnp.float32)

        # unsorted pipeline
        idx = knn_indices_tiled(pc1, pc2, mask2, k=16, interpret=True)
        want = knn_gather_apply(idx, pc1, pc2, featsp, addq, **kw)

        # sorted pipeline (what the module's split path does)
        perm1 = morton.morton_perm(pc1, mask1)
        perm2 = morton.morton_perm(pc2, mask2)
        idx_s = knn_indices_tiled(pc1[perm1], pc2[perm2], mask2[perm2],
                                  k=16, interpret=True)
        got_s = knn_gather_apply(idx_s, pc1[perm1], pc2[perm2],
                                 featsp[perm2], addq[perm1], **kw)
        got = got_s.at[morton.invert_perm(perm1)].get(
            mode="promise_in_bounds")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
