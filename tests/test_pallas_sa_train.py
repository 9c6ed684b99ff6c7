"""Fused train-path SA kernel (ops/pallas_sa_train.py) correctness.

Three layers of evidence:
  1. Exact-regime routing tests: small-integer inputs + a single-layer
     MLP make BOTH formulations exact in f32, so any difference would be
     a routing bug (slot compaction, CUDA duplicate padding, no-hit
     fallback, max-pool tie splitting, BN batch backward, dP1 scatter).
     Agreement is ~1e-6 — the divisions/rsqrt in BN are the only
     rounding.
  2. Real-valued forward/gradient bounds vs the unfused train path
     (ball_query + one-hot gather + Dense/train-BN stack): agreement to
     the bf16-matmul-pass class, as documented in the module docstring.
  3. Module-level integration: SetAbstractionMSG fused_train vs unfused
     — outputs, parameter gradients (cosine), and BN running-stat
     updates; plus the batched (vmap) path the train step uses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratrack_tpu.ops.pallas_sa_train import (fused_sa_scale_train,
                                             sa_scale_train_reference)


def _int_setup(seed=2, n=128, c_in=2, c_out=16):
    rng = np.random.RandomState(seed)
    xyz = jnp.asarray(rng.randint(-8, 9, size=(n, 3)).astype(np.float32))
    feats = jnp.asarray(
        rng.randint(-4, 5, size=(n, c_in)).astype(np.float32))
    mask = jnp.asarray(rng.rand(n) < 0.7)
    ws = [jnp.asarray(rng.randint(-2, 3, size=(3 + c_in, c_out))
                      .astype(np.float32) * 0.25)]
    scales = [jnp.asarray(
        1.0 + 0.25 * rng.randint(-2, 3, size=(c_out,)).astype(np.float32))]
    biases = [jnp.asarray(
        0.25 * rng.randint(-2, 3, size=(c_out,)).astype(np.float32))]
    g_out = jnp.asarray(
        rng.randint(-4, 5, size=(n, c_out)).astype(np.float32))
    return xyz, feats, mask, ws, scales, biases, g_out


@pytest.mark.parametrize("radius,nsample", [
    (3.0, 4),      # mixed hits/duplicates
    (0.5, 4),      # mostly no-hit rows (point-0 fallback)
    (100.0, 8),    # everything duplicated past the hit budget
    (5.0, 32),     # multi-block slot loop
])
def test_exact_regime_routing(radius, nsample):
    xyz, feats, mask, ws, scales, biases, g_out = _int_setup()

    def loss(fn):
        def f(x, ft):
            p, _, _ = fn(x, x, ft, mask, ws, scales, biases,
                         radius=radius, nsample=nsample)
            return jnp.vdot(p, g_out)
        return f

    pf, mf, vf = fused_sa_scale_train(xyz, xyz, feats, mask, ws, scales,
                                      biases, radius=radius,
                                      nsample=nsample)
    pr, mr, vr = sa_scale_train_reference(xyz, xyz, feats, mask, ws,
                                          scales, biases, radius=radius,
                                          nsample=nsample)
    assert float(jnp.max(jnp.abs(pf - pr))) < 1e-4
    assert float(jnp.max(jnp.abs(mf[0] - mr[0]))) < 1e-5
    assert float(jnp.max(jnp.abs(vf[0] - vr[0]))) < 1e-4

    gf = jax.grad(loss(fused_sa_scale_train), argnums=(0, 1))(xyz, feats)
    gr = jax.grad(loss(sa_scale_train_reference),
                  argnums=(0, 1))(xyz, feats)
    for a, b in zip(gf, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-4


def test_param_grads_exact_regime():
    xyz, feats, mask, ws, scales, biases, g_out = _int_setup(seed=5)

    def loss(fn):
        def f(ws_, scales_, biases_):
            p, _, _ = fn(xyz, xyz, feats, mask, ws_, scales_, biases_,
                         radius=4.0, nsample=8)
            return jnp.vdot(p, g_out)
        return f

    gf = jax.grad(loss(fused_sa_scale_train),
                  argnums=(0, 1, 2))(ws, scales, biases)
    gr = jax.grad(loss(sa_scale_train_reference),
                  argnums=(0, 1, 2))(ws, scales, biases)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-4


def _real_setup(seed=0, n=256, c_in=2, mlp=(16, 16, 32)):
    rng = np.random.RandomState(seed)
    xyz = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 5)
    feats = jnp.asarray(rng.randn(n, c_in).astype(np.float32))
    mask = jnp.asarray(rng.rand(n) < 0.8)
    ws = [jnp.asarray(
        rng.randn(3 + c_in, mlp[0]).astype(np.float32) * 0.3)]
    for i in range(1, len(mlp)):
        ws.append(jnp.asarray(
            rng.randn(mlp[i - 1], mlp[i]).astype(np.float32) * 0.3))
    scales = [jnp.asarray(1.0 + 0.1 * rng.randn(c).astype(np.float32))
              for c in mlp]
    biases = [jnp.asarray(0.1 * rng.randn(c).astype(np.float32))
              for c in mlp]
    return xyz, feats, mask, ws, scales, biases


def test_multilayer_bound_vs_unfused():
    """Real values, 3 layers: bf16-dot class bound (documented)."""
    xyz, feats, mask, ws, scales, biases = _real_setup()
    pf, mf, vf = fused_sa_scale_train(xyz, xyz, feats, mask, ws, scales,
                                      biases, radius=2.0, nsample=8)
    pr, mr, vr = sa_scale_train_reference(xyz, xyz, feats, mask, ws,
                                          scales, biases, radius=2.0,
                                          nsample=8)
    scale = float(jnp.max(jnp.abs(pr))) + 1e-9
    assert float(jnp.max(jnp.abs(pf - pr))) / scale < 0.03
    # layer-1 stats ride the exact gather path: tight
    assert float(jnp.max(jnp.abs(mf[0] - mr[0]))) < 1e-5

    def loss(fn):
        def f(x, ft, ws_, s_, b_):
            p, _, _ = fn(x, x, ft, mask, ws_, s_, b_,
                         radius=2.0, nsample=8)
            return jnp.sum(p * p)
        return f

    gf = jax.grad(loss(fused_sa_scale_train),
                  argnums=(0, 1, 2, 3, 4))(xyz, feats, ws, scales, biases)
    gr = jax.grad(loss(sa_scale_train_reference),
                  argnums=(0, 1, 2, 3, 4))(xyz, feats, ws, scales, biases)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        na = np.asarray(a).ravel()
        nb = np.asarray(b).ravel()
        cos = float(np.dot(na, nb)
                    / (np.linalg.norm(na) * np.linalg.norm(nb) + 1e-12))
        assert cos > 0.99, cos


@pytest.mark.parametrize("b,mlp,want_pk", [
    (8, (16, 16, 32), 8),   # sa1 class: narrowest layer fills at pk=8
    (4, (64, 64), 2),       # sa3 class: pk=2 fills the 64-ch tile
    (6, (32, 64), 2),       # b with no 4/8 divisor → falls to 2
])
def test_stream_packed_equals_per_stream(b, mlp, want_pk):
    """The lane-packed batched kernels (pk>1) vs per-stream pk=1:
    gathers/selection are per-stream either way (layer-0 stats measured
    exactly equal), and the block-diagonal dots add exact zeros — but a
    wider K regroups the nonzero products into different partial
    accumulators, so layers ≥1 agree to reassociation ulps (measured
    ≤ 2e-9 in stats, ≤ 1.5e-6 in pooled), not bitwise."""
    from ratrack_tpu.ops.pallas_sa_train import _pick_pk

    n = 128
    # selection is insensitive to the gather-parts count at these shapes
    # (the p1cat aux term is KBs vs the 64 MB budget) — pin both the
    # real-TPU (gp=2) and interpret/bit-exact (gp=3) splits
    for gp in (2, 3):
        assert _pick_pk(b, mlp, n, n, 8, gp) == want_pk
    rng = np.random.RandomState(7)
    xyzb = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 5)
    featsb = jnp.asarray(rng.randn(b, n, 2).astype(np.float32))
    maskb = jnp.asarray(rng.rand(b, n) < 0.8)
    _, _, _, ws, scales, biases = _real_setup(n=n, mlp=mlp)
    gouts = jnp.asarray(rng.randn(b, n, mlp[-1]).astype(np.float32))

    def one(x, ft, mk):
        return fused_sa_scale_train(x, x, ft, mk, ws, scales, biases,
                                    radius=2.0, nsample=8)

    pb, mb, vb = jax.vmap(one)(xyzb, featsb, maskb)       # packed
    for i in range(b):
        p1, m1, v1 = one(xyzb[i], featsb[i], maskb[i])    # pk=1
        np.testing.assert_allclose(np.asarray(pb[i]), np.asarray(p1),
                                   rtol=1e-5, atol=1e-5)
        # layer-0 stats ride the bit-exact gather: exact
        np.testing.assert_array_equal(np.asarray(mb[0][i]),
                                      np.asarray(m1[0]))
        for a, r in zip(mb + vb, m1 + v1):
            np.testing.assert_allclose(np.asarray(a[i]), np.asarray(r),
                                       rtol=1e-5, atol=1e-6)

    # gradients: packed-vmap loss vs the sum of per-stream pk=1 losses
    def loss_b(ws_, s_, b_, xb, fb):
        def f(x, ft, mk, g):
            p, _, _ = fused_sa_scale_train(x, x, ft, mk, ws_, s_, b_,
                                           radius=2.0, nsample=8)
            return jnp.vdot(p, g)
        return jnp.sum(jax.vmap(f)(xb, fb, maskb, gouts))

    gb = jax.grad(loss_b, argnums=(0, 1, 2, 3, 4))(
        ws, scales, biases, xyzb, featsb)
    g1 = jax.grad(
        lambda ws_, s_, b_, xb, fb: sum(
            jnp.vdot(fused_sa_scale_train(
                xb[i], xb[i], fb[i], maskb[i], ws_, s_, b_,
                radius=2.0, nsample=8)[0], gouts[i])
            for i in range(b)),
        argnums=(0, 1, 2, 3, 4))(ws, scales, biases, xyzb, featsb)
    for a, r in zip(jax.tree_util.tree_leaves(gb),
                    jax.tree_util.tree_leaves(g1)):
        # reassociation ulps amplify through the BN-backward cancelling
        # sums (measured worst single element ~9e-4 relative)
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-2, atol=1e-4)
        na, nr = np.asarray(a).ravel(), np.asarray(r).ravel()
        cos = float(np.dot(na, nr) / (np.linalg.norm(na)
                                      * np.linalg.norm(nr) + 1e-12))
        assert cos > 0.99999, cos


@pytest.mark.parametrize("mlp_a,mlp_b,ns_a,ns_b,b,want_pk", [
    ((16, 16, 32), (16, 16, 32), 4, 8, 8, 8),   # sa1 class
    ((32, 32), (32, 64), 8, 16, 8, 4),          # sa2 class: lane-sliced L1
    ((64, 64), (64, 64), 16, 32, 4, 2),         # sa3 class
    ((32, 32), (32, 64), 8, 16, 3, 1),          # indivisible → fallback
])
def test_pair_vs_singles(mlp_a, mlp_b, ns_a, ns_b, b, want_pk):
    """Radius-pair kernel ≡ two single-scale kernels.

    The pair shares selection (identical expressions) and runs the same
    per-scale op sequence. On the real TPU the GRADIENTS are measured
    bit-identical (the backward consumes the forward's xhat stash —
    the exact expression the single-scale backward recomputes) while
    the forward differs by ulps: the pair fwd derives activations from
    the stash (unfused (h−mu)·inv then ·scale) where the single-scale
    fwd fuses (inv·scale) — measured loss deltas ≤ 3e-6 relative. On
    CPU interpret, the smaller scale's batch-stat reductions addition-
    ally read a row-slice of the shared (larger) scratch buffer and XLA
    CPU reassociates the sliced reduce → ulp-level stat drift that the
    BN rsqrt amplifies on near-zero variances (measured ≤ 2.3e-3
    scaled on pooled) — the same class as the documented pk>1
    reassociation bounds."""
    from ratrack_tpu.ops.pallas_sa_train import (fused_sa_pair_train,
                                                 _pick_pk_pair)

    n = 128
    for gp in (2, 3):
        assert _pick_pk_pair(b, mlp_a, mlp_b, n, n, ns_a, ns_b,
                             gp) == want_pk
    rng = np.random.RandomState(3)
    xyzb = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 5)
    featsb = jnp.asarray(rng.randn(b, n, 2).astype(np.float32))
    maskb = jnp.asarray(rng.rand(b, n) < 0.8)

    def mk(mlp, seed):
        r = np.random.RandomState(seed)
        ws = [jnp.asarray(r.randn(5, mlp[0]).astype(np.float32) * 0.3)]
        for i in range(1, len(mlp)):
            ws.append(jnp.asarray(
                r.randn(mlp[i - 1], mlp[i]).astype(np.float32) * 0.3))
        scs = [jnp.asarray(1.0 + 0.1 * r.randn(c).astype(np.float32))
               for c in mlp]
        bis = [jnp.asarray(0.1 * r.randn(c).astype(np.float32))
               for c in mlp]
        return ws, scs, bis
    ws_a, sc_a, bi_a = mk(mlp_a, 11)
    ws_b, sc_b, bi_b = mk(mlp_b, 22)
    ra, rb = 2.0, 4.0
    ga = jnp.asarray(rng.randn(b, n, mlp_a[-1]).astype(np.float32))
    gb = jnp.asarray(rng.randn(b, n, mlp_b[-1]).astype(np.float32))

    def pair_out(wa, sa, ba, wb, sb, bb, x, ft):
        def one(xx, ff, mk_):
            return fused_sa_pair_train(
                xx, xx, ff, mk_, wa, sa, ba, wb, sb, bb,
                radius_a=ra, nsample_a=ns_a, radius_b=rb, nsample_b=ns_b)
        return jax.vmap(one)(x, ft, maskb)

    def singles_out(wa, sa, ba, wb, sb, bb, x, ft):
        def one_s(w, s, bi, r, ns):
            return jax.vmap(lambda xx, ff, mk_: fused_sa_scale_train(
                xx, xx, ff, mk_, w, s, bi, radius=r, nsample=ns))(
                x, ft, maskb)
        return (one_s(wa, sa, ba, ra, ns_a), one_s(wb, sb, bb, rb, ns_b))

    op = pair_out(ws_a, sc_a, bi_a, ws_b, sc_b, bi_b, xyzb, featsb)
    os_ = singles_out(ws_a, sc_a, bi_a, ws_b, sc_b, bi_b, xyzb, featsb)
    for got, want in zip(op, os_):
        for a, r in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(want)):
            na, nr = np.asarray(a), np.asarray(r)
            scale = float(np.max(np.abs(nr))) + 1e-9
            assert float(np.max(np.abs(na - nr))) / scale < 5e-3
    # layer-0 stats ride the exact shared-selection gather: tight
    np.testing.assert_allclose(np.asarray(op[0][1][0]),
                               np.asarray(os_[0][1][0]),
                               rtol=1e-5, atol=1e-6)

    def loss_pair(wa, sa, ba, wb, sb, bb, x, ft):
        (pa, _, _), (pb, _, _) = pair_out(wa, sa, ba, wb, sb, bb, x, ft)
        return jnp.vdot(pa, ga) + jnp.vdot(pb, gb)

    def loss_singles(wa, sa, ba, wb, sb, bb, x, ft):
        (pa, _, _), (pb, _, _) = singles_out(wa, sa, ba, wb, sb, bb,
                                             x, ft)
        return jnp.vdot(pa, ga) + jnp.vdot(pb, gb)

    gp = jax.grad(loss_pair, argnums=tuple(range(8)))(
        ws_a, sc_a, bi_a, ws_b, sc_b, bi_b, xyzb, featsb)
    gs = jax.grad(loss_singles, argnums=tuple(range(8)))(
        ws_a, sc_a, bi_a, ws_b, sc_b, bi_b, xyzb, featsb)
    for a, r in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gs)):
        na, nr = np.asarray(a).ravel(), np.asarray(r).ravel()
        scale = float(np.max(np.abs(nr))) + 1e-9
        assert float(np.max(np.abs(na - nr))) / scale < 1e-3
        cos = float(np.dot(na, nr) / (np.linalg.norm(na)
                                      * np.linalg.norm(nr) + 1e-12))
        assert cos > 0.99999, cos


def test_module_integration_and_running_stats():
    from ratrack_tpu.ops import pallas_sa
    from ratrack_tpu.models.pnhead import SetAbstractionMSG

    old = pallas_sa.FORCE_FUSED_ON_CPU
    pallas_sa.FORCE_FUSED_ON_CPU = True
    try:
        rng = np.random.RandomState(0)
        n = 256
        xyz = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 5)
        feats = jnp.asarray(rng.randn(n, 2).astype(np.float32))
        mask = jnp.asarray(rng.rand(n) < 0.8)
        kw = dict(npoint=n, radii=[2., 4.], nsamples=[4, 8],
                  mlps=[[16, 16, 32], [16, 16, 32]])
        m_f = SetAbstractionMSG(**kw, fused_train=True, fused_eval=False)
        m_u = SetAbstractionMSG(**kw, fused_train=False, fused_eval=False)
        v = m_u.init(jax.random.PRNGKey(0), xyz, feats, mask, train=True)
        v = {"params": v["params"], "batch_stats": v["batch_stats"]}

        def flat(t):
            return {jax.tree_util.keystr(k): x for k, x in
                    jax.tree_util.tree_leaves_with_path(t)}

        (nf, of), mutf = m_f.apply(v, xyz, feats, mask, train=True,
                                   mutable=["batch_stats"])
        (nu, ou), mutu = m_u.apply(v, xyz, feats, mask, train=True,
                                   mutable=["batch_stats"])
        assert bool(jnp.all(nf == nu))
        s = float(jnp.max(jnp.abs(ou))) + 1e-9
        assert float(jnp.max(jnp.abs(of - ou))) / s < 0.03
        sf, su = flat(mutf["batch_stats"]), flat(mutu["batch_stats"])
        assert set(sf) == set(su) and len(su) == 12
        for k in su:
            d = (float(jnp.max(jnp.abs(sf[k] - su[k])))
                 / (float(jnp.max(jnp.abs(su[k]))) + 1e-9))
            assert d < 0.02, (k, d)

        # batched (the train-step vmap shape) + parameter gradients
        b = 3
        xyzb = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 5)
        featsb = jnp.asarray(rng.randn(b, n, 2).astype(np.float32))
        maskb = jnp.asarray(rng.rand(b, n) < 0.8)

        def loss(m):
            def f(params):
                def one(x, ft, mk):
                    (nx, out), _ = m.apply(
                        {"params": params,
                         "batch_stats": v["batch_stats"]},
                        x, ft, mk, train=True, mutable=["batch_stats"])
                    return jnp.sum(out * out)
                return jnp.mean(jax.vmap(one)(xyzb, featsb, maskb))
            return f

        gf = flat(jax.grad(loss(m_f))(v["params"]))
        gu = flat(jax.grad(loss(m_u))(v["params"]))
        for k in gu:
            na = np.asarray(gf[k]).ravel()
            nb = np.asarray(gu[k]).ravel()
            cos = float(np.dot(na, nb) / (np.linalg.norm(na)
                                          * np.linalg.norm(nb) + 1e-12))
            assert cos > 0.99, (k, cos)
    finally:
        pallas_sa.FORCE_FUSED_ON_CPU = old
