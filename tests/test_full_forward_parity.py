"""FULL per-frame forward parity: converted torch weights, torch math vs
this framework.

Drives the complete reference forward (PNHead ×2 → local‖global concat →
FeatureCorrelator → FlowDecoder with the 5-layer GRU) in live torch —
index ops (FPS / ball query / kNN / three-NN) via the NumPy oracles that
pin the CUDA kernel semantics, MLPs/BN/GRU via the reconstructed torch
modules — and checks that Track4D.apply with the CONVERTED weights
produces the same flow vectors and moving probabilities. This is the
strongest attainable proxy for "per-frame detections and flow match the
PyTorch reference" without the VoD dataset."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from reference_impls import np_fps, np_ball_query, np_knn
from test_convert import _TorchTrack4D, _randomize_bn_stats

N = 96          # all-valid cloud; npoint == N like the live config


def _shared_mlp_fwd(mod, x):
    """SharedMLP (conv1x1+BN+ReLU per layer): x (M, S, C) → (M, S, C')."""
    t = torch.from_numpy(np.ascontiguousarray(
        x.transpose(2, 0, 1))[None])          # (1, C, M, S)
    with torch.no_grad():
        for layer in mod:
            t = torch.relu(layer.bn.bn(layer.conv(t)))
    return t.numpy()[0].transpose(1, 2, 0)    # (M, S, C')


def _sa_fwd(sa, xyz, feats, npoint, radii, nsamples):
    fps_idx = np_fps(xyz, npoint)
    new_xyz = xyz[fps_idx]
    outs = []
    for s, (r, ns) in enumerate(zip(radii, nsamples)):
        idx = np_ball_query(r, ns, xyz, new_xyz)
        g = xyz[idx] - new_xyz[:, None, :]
        if feats is not None:
            g = np.concatenate([g, feats[idx]], -1)
        h = _shared_mlp_fwd(sa.mlps[s], g.astype(np.float32))
        outs.append(h.max(axis=1))             # max over samples
    return new_xyz, np.concatenate(outs, -1)


def _three_nn(unknown, known):
    d2, idx = np_knn(3, unknown, known)
    return np.sqrt(d2), idx


def _fp_fwd(fp, unknown_xyz, known_xyz, unknown_feats, known_feats):
    dist, idx = _three_nn(unknown_xyz, known_xyz)
    recip = 1.0 / (dist + 1e-8)
    w = recip / recip.sum(-1, keepdims=True)
    interp = (known_feats[idx] * w[..., None]).sum(1)
    cat = (np.concatenate([interp, unknown_feats], -1)
           if unknown_feats is not None else interp)
    return _shared_mlp_fwd(fp.mlp, cat[:, None, :].astype(np.float32))[:, 0]


def _linear(lin, x):
    with torch.no_grad():
        return lin(torch.from_numpy(x)).numpy()


def _pnhead_fwd(head, xyz, feats, npoint):
    l1_xyz, l1 = _sa_fwd(head.sa1, xyz, feats, npoint, [2, 4], [4, 8])
    l1 = _linear(head.linear1, l1)
    l2_xyz, l2 = _sa_fwd(head.sa2, l1_xyz, l1, npoint, [4, 8], [8, 16])
    l2 = _linear(head.linear2, l2)
    l3_xyz, l3 = _sa_fwd(head.sa3, l2_xyz, l2, npoint, [8, 16], [16, 32])
    l3 = _linear(head.linear3, l3)
    l2 = _fp_fwd(head.fp3, l2_xyz, l3_xyz, l2, l3)
    l1 = _fp_fwd(head.fp2, l1_xyz, l2_xyz, l1, l2)
    l0 = _fp_fwd(head.fp1, xyz, l1_xyz, None, l1)
    return l0


def _weightnet_fwd(wn, direction):
    """direction (N, S, 3) → (N, S, C) weights (conv+ReLU, no BN)."""
    t = torch.from_numpy(np.ascontiguousarray(
        direction.transpose(2, 0, 1).astype(np.float32))[None])
    with torch.no_grad():
        for conv in wn.mlp_convs:
            t = torch.relu(conv(t))
    return t.numpy()[0].transpose(1, 2, 0)


def _correlator_fwd(fc, pc1, pc2, f1, f2, nsample=16):
    n = pc1.shape[0]
    _, idx = np_knn(nsample, pc1, pc2)
    direction = pc2[idx] - pc1[:, None, :]
    g = np.concatenate(
        [np.broadcast_to(f1[:, None, :], (n, nsample, f1.shape[-1])),
         f2[idx], direction], -1).astype(np.float32)
    t = torch.from_numpy(np.ascontiguousarray(g.transpose(2, 0, 1))[None])
    with torch.no_grad():
        for conv in fc.mlp_convs:
            t = torch.nn.functional.leaky_relu(conv(t), 0.1)
    feat = t.numpy()[0].transpose(1, 2, 0)       # (N, S, 256)
    cost = (_weightnet_fwd(fc.weightnet1, direction) * feat).sum(1)

    _, idx_s = np_knn(nsample, pc1, pc1)
    direction = pc1[idx_s] - pc1[:, None, :]
    w2 = _weightnet_fwd(fc.weightnet2, direction)
    return (w2 * cost[idx_s]).sum(1)


def _torch_forward(tm, pc1, pc2, ft1, ft2):
    """Reference Track4D backbone+flow forward → (flow (N,3), cls (N,))."""
    npt = pc1.shape[0]
    f1 = _pnhead_fwd(tm.pn_head, pc1, ft1, npt)
    f2 = _pnhead_fwd(tm.pn_head, pc2, ft2, npt)
    f1 = np.concatenate([f1, np.broadcast_to(f1.max(0), f1.shape)], -1)
    f2 = np.concatenate([f2, np.broadcast_to(f2.max(0), f2.shape)], -1)
    cor = _correlator_fwd(tm.fc_layer, pc1, pc2, f1, f2)

    with torch.no_grad():
        cls = tm.fd_layer.cp(torch.from_numpy(
            cor.T.astype(np.float32))[None]).numpy()[0]
    emb = np.concatenate([ft1, f1, cor], -1).astype(np.float32)
    prop = _pnhead_fwd(tm.fd_layer.mse, pc1, emb, pc1.shape[0])
    gfeat = prop.max(0)
    with torch.no_grad():
        g, _ = tm.fd_layer.torchGRU(
            torch.from_numpy(gfeat[None, None]),
            torch.zeros(5, 1, 128))
        gfeat = g.numpy()[0, 0]
        new_feat = np.concatenate(
            [prop, np.broadcast_to(gfeat, prop.shape)], -1)
        flow = tm.fd_layer.fp(torch.from_numpy(
            new_feat.T.astype(np.float32))[None]).numpy()[0].T
    return flow, cls


@pytest.mark.slow
def test_flow_and_cls_match_torch_reference_math():
    from ratrack_tpu.models import Track4D
    from ratrack_tpu.tracker import init_state
    from ratrack_tpu.data.synthetic import synthetic_clip
    from ratrack_tpu.utils.convert import convert_reference_state_dict

    rng = np.random.RandomState(7)
    tm = _TorchTrack4D()
    tm.eval()
    with torch.no_grad():
        _randomize_bn_stats(tm, rng)
    variables, _ = convert_reference_state_dict(tm.state_dict())

    frame = synthetic_clip(5, 1, n_max=N, g_max=8, n_static=N - 16 - 64,
                           n_objects=2, pts_per_obj=8)[0]
    # make the cloud fully valid (no padding) so torch needs no masks
    assert bool(np.asarray(frame.mask1).all()) is False
    pad = ~np.asarray(frame.mask1)
    pc1 = np.asarray(frame.pc1).copy()
    pc2 = np.asarray(frame.pc2).copy()
    # scatter pad rows far apart so they are real, distinct points
    pc1[pad] = rng.uniform(60, 90, (pad.sum(), 3))
    pc2[pad] = pc1[pad] + rng.randn(pad.sum(), 3) * 0.01
    ft1 = np.asarray(frame.ft1)
    ft2 = np.asarray(frame.ft2)
    frame = frame._replace(pc1=pc1, pc2=pc2,
                           mask1=np.ones(N, bool), mask2=np.ones(N, bool))

    want_flow, want_cls = _torch_forward(
        tm, pc1.astype(np.float64), pc2.astype(np.float64), ft1, ft2)

    model = Track4D(npoint=N, k_max=8, sinkhorn_iters=20, exact_fps=True)
    frame_j = jax.tree_util.tree_map(jnp.asarray, frame)
    out, _ = jax.jit(lambda v, f, s: model.apply(v, f, s, train=False))(
        variables, frame_j, init_state(8))

    np.testing.assert_allclose(np.asarray(out["cls"]), want_cls,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["flow"]), want_flow,
                               atol=2e-3)


@pytest.mark.slow
def test_fused_train_forward_matches_torch_train_mode():
    """Directive r3-#7: the TRAIN-mode forward directly against the
    torch reference run in TRAIN mode (batch-stat BatchNorm,
    `src/models/track4d.py:49-106` under `model.train()`), with
    converted weights — closing the fused→unfused→torch chain from the
    eval-mode test above into one direct comparison, at BOTH levels:

    1. unfused train path (fused_train=False) vs torch: max|Δ| measured
       flow 2.5e-5 / cls 4.8e-7 → bound 5e-4. This pins the train-mode
       MATH (batch-stat BN, leaky-relu MLPs, GRU, predictors) exactly.
    2. fused train path (fused_train=True — radius-pair SA kernels +
       fused correlator stages, CPU Pallas interpret) vs torch: the
       delta is ENTIRELY fused-vs-unfused kernel numerics (measured
       decomposition: fused-vs-unfused 0.096 ≈ fused-vs-torch 0.096 on
       flow) — the kernels' designed bf16-pass feature gathers/dots vs
       torch's exact f32, amplified through ~10 stacked modules with
       ReLU/BN boundary flips (same class the grad-anchor test in
       test_train.py documents at cosine 0.80-0.99). Bounds: 0.25
       absolute AND flow-field cosine ≥ 0.99 — structural breakage
       (wrong routing, dead branches) collapses the cosine toward 0,
       while numeric-class drift cannot. Training QUALITY under these
       numerics is pinned end-to-end by the synthetic-world run
       (seg 0.976 / SAMOTA 93.2, README)."""
    from ratrack_tpu.models import Track4D
    from ratrack_tpu.ops import pallas_sa
    from ratrack_tpu.tracker import init_state
    from ratrack_tpu.data.synthetic import synthetic_clip
    from ratrack_tpu.utils.convert import convert_reference_state_dict

    n = 128   # fused-train gating: n % 128 == 0, npoint % 128 == 0
    rng = np.random.RandomState(11)
    tm = _TorchTrack4D()
    tm.train()    # batch-stat BN everywhere, like the reference epoch()
    variables, _ = convert_reference_state_dict(tm.state_dict())

    frame = synthetic_clip(5, 1, n_max=n, g_max=8, n_static=n - 16 - 64,
                           n_objects=2, pts_per_obj=8)[0]
    pad = ~np.asarray(frame.mask1)
    pc1 = np.asarray(frame.pc1).copy()
    pc2 = np.asarray(frame.pc2).copy()
    pc1[pad] = rng.uniform(60, 90, (pad.sum(), 3))
    pc2[pad] = pc1[pad] + rng.randn(pad.sum(), 3) * 0.01
    ft1 = np.asarray(frame.ft1)
    ft2 = np.asarray(frame.ft2)
    frame = frame._replace(pc1=pc1, pc2=pc2,
                           mask1=np.ones(n, bool), mask2=np.ones(n, bool))

    want_flow, want_cls = _torch_forward(
        tm, pc1.astype(np.float64), pc2.astype(np.float64), ft1, ft2)

    frame_j = jax.tree_util.tree_map(jnp.asarray, frame)

    def run(fused):
        model = Track4D(npoint=n, k_max=8, sinkhorn_iters=20,
                        exact_fps=True, fused_eval=False,
                        fused_train=fused)
        old = pallas_sa.FORCE_FUSED_ON_CPU
        pallas_sa.FORCE_FUSED_ON_CPU = True
        try:
            (out, _), _ = jax.jit(
                lambda v, f, s: model.apply(v, f, s, train=True,
                                            mutable=["batch_stats"]))(
                variables, frame_j, init_state(8))
        finally:
            pallas_sa.FORCE_FUSED_ON_CPU = old
        return np.asarray(out["flow"]), np.asarray(out["cls"])

    # level 1: unfused train path pins the train-mode math exactly
    flow_u, cls_u = run(False)
    np.testing.assert_allclose(cls_u, want_cls, atol=5e-4)
    np.testing.assert_allclose(flow_u, want_flow, atol=5e-4)

    # level 2: fused kernels — bf16-pass numeric class, structure-tight
    flow_f, cls_f = run(True)
    np.testing.assert_allclose(cls_f, want_cls, atol=0.05)
    np.testing.assert_allclose(flow_f, want_flow, atol=0.25)
    cos = float(np.dot(flow_f.ravel(), want_flow.ravel())
                / (np.linalg.norm(flow_f) * np.linalg.norm(want_flow)
                   + 1e-12))
    assert cos > 0.99, cos
