"""Reference-checkpoint conversion: torch state_dict → flax variables.

Reconstructs the reference Track4D's weight-bearing torch module tree with
its exact state_dict naming (src/models/track4d.py:25-42 +
model_utils.py/pytorch_utils.py child naming), generates a genuine
state_dict, converts it, and checks (a) the converted tree is shape-exact
against this framework's init tree, (b) module-level forward parity for
the pure-MLP heads, (c) the full converted model runs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn


def _shared_layer(cin, cout):
    m = nn.Sequential()
    m.add_module("conv", nn.Conv2d(cin, cout, 1, bias=False))
    bnw = nn.Sequential()
    bnw.add_module("bn", nn.BatchNorm2d(cout))
    m.add_module("bn", bnw)
    return m


def _shared_mlp(chans):
    m = nn.Sequential()
    for i, (a, b) in enumerate(zip(chans[:-1], chans[1:])):
        m.add_module(f"layer{i}", _shared_layer(a, b))
    return m


class _SA(nn.Module):
    def __init__(self, mlps):
        super().__init__()
        self.mlps = nn.ModuleList([_shared_mlp(c) for c in mlps])


class _FP(nn.Module):
    def __init__(self, chans):
        super().__init__()
        self.mlp = _shared_mlp(chans)


class _PNHead(nn.Module):
    def __init__(self, in_channels):
        super().__init__()
        c = in_channels
        self.sa1 = _SA([[c, 16, 16, 32], [c, 16, 16, 32]])
        self.sa2 = _SA([[35, 32, 32], [35, 32, 64]])
        self.sa3 = _SA([[67, 64, 64], [67, 64, 64]])
        self.fp3 = _FP([128, 128])
        self.fp2 = _FP([160, 128])
        self.fp1 = _FP([128, 128])
        self.linear1 = nn.Linear(64, 32)
        self.linear2 = nn.Linear(96, 64)
        self.linear3 = nn.Linear(128, 64)


class _WeightNet(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.mlp_convs = nn.ModuleList([nn.Conv2d(cin, 8, 1),
                                        nn.Conv2d(8, 8, 1),
                                        nn.Conv2d(8, cout, 1)])


class _FC(nn.Module):
    def __init__(self):
        super().__init__()
        self.mlp_convs = nn.ModuleList([nn.Conv2d(515, 256, 1),
                                        nn.Conv2d(256, 256, 1),
                                        nn.Conv2d(256, 256, 1)])
        self.cls_mlp = nn.Linear(16, 1)        # dead in reference forward
        self.weightnet1 = _WeightNet(3, 256)
        self.weightnet2 = _WeightNet(3, 256)


def _sf_mlp():
    ms = nn.ModuleList()
    for a, b in ((256, 128), (128, 64), (64, 32)):
        ms.append(nn.Sequential(nn.Conv2d(a, b, 1, bias=False),
                                nn.BatchNorm2d(b), nn.ReLU()))
    return ms


class _FlowPredictor(nn.Module):
    def __init__(self):
        super().__init__()
        self.sf_mlp = _sf_mlp()
        self.conv2 = nn.Conv2d(32, 3, 1, bias=False)

    def forward(self, feat):                   # (1, C, N)
        feat = feat.unsqueeze(3)
        for conv in self.sf_mlp:
            feat = conv(feat)
        return self.conv2(feat).squeeze(3)


class _ClsPredictor(nn.Module):
    def __init__(self):
        super().__init__()
        self.sf_mlp = _sf_mlp()
        self.conv2 = nn.Conv2d(32, 3, 1, bias=False)
        self.linear = nn.Linear(3, 1)

    def forward(self, feat):
        feat = feat.unsqueeze(3)
        for conv in self.sf_mlp:
            feat = conv(feat)
        out = self.conv2(feat)
        out = self.linear(out.squeeze(3).permute(0, 2, 1))
        return torch.sigmoid(out).squeeze(2)


class _FD(nn.Module):
    def __init__(self):
        super().__init__()
        self.mse = _PNHead(517)
        self.fp = _FlowPredictor()
        self.cp = _ClsPredictor()
        self.torchGRU = nn.GRU(128, 128, 5)


class _Affinity(nn.Module):
    def __init__(self, e=141):
        super().__init__()
        self.affinity = nn.Sequential(
            nn.Linear(e, e * 4), nn.ReLU(), nn.Linear(e * 4, e * 2),
            nn.ReLU(), nn.Linear(e * 2, e // 2), nn.ReLU(),
            nn.Linear(e // 2, e // 4), nn.ReLU(),
            nn.Linear(e // 4, 1), nn.Sigmoid())

    def forward(self, diff):
        return self.affinity(diff)


class _TorchTrack4D(nn.Module):
    def __init__(self):
        super().__init__()
        self.pn_head = _PNHead(5)
        self.fc_layer = _FC()
        self.fd_layer = _FD()
        self.affinity = _Affinity()
        self.bin_score = nn.Parameter(torch.tensor(1.0))


def _randomize_bn_stats(model, rng):
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(m.num_features).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(
                (rng.rand(m.num_features).astype(np.float32) * 0.5 + 0.7)))


@pytest.fixture(scope="module")
def converted():
    from ratrack_tpu.utils.convert import convert_reference_state_dict
    rng = np.random.RandomState(0)
    tm = _TorchTrack4D()
    with torch.no_grad():
        _randomize_bn_stats(tm, rng)
    variables, leftover = convert_reference_state_dict(tm.state_dict())
    return tm, variables, leftover


def test_leftovers_are_only_dead_modules(converted):
    _, _, leftover = converted
    for key in leftover:
        assert ("cls_mlp" in key or "num_batches_tracked" in key), key


def test_tree_matches_flax_init_shapes(converted):
    from ratrack_tpu.models import Track4D
    from ratrack_tpu.tracker import init_state
    from ratrack_tpu.data.synthetic import synthetic_clip

    _, variables, _ = converted
    model = Track4D(npoint=96, k_max=8, sinkhorn_iters=20)
    frame = jax.tree_util.tree_map(
        jnp.asarray, synthetic_clip(0, 1, n_max=96, g_max=8, n_static=40,
                                    n_objects=2, pts_per_obj=8)[0])
    ref = model.init(jax.random.PRNGKey(0), frame, init_state(8),
                     train=False)

    def flat(tree):
        return {jax.tree_util.keystr(k): np.asarray(v).shape
                for k, v in jax.tree_util.tree_leaves_with_path(tree)}

    for coll in ("params", "batch_stats"):
        want, got = flat(ref[coll]), flat(variables[coll])
        assert want == got, (
            sorted(set(want) ^ set(got))[:8],
            [(k, want[k], got[k]) for k in want
             if k in got and want[k] != got[k]][:8])


def test_affinity_forward_parity(converted):
    from ratrack_tpu.models import Affinity
    tm, variables, _ = converted
    rng = np.random.RandomState(1)
    diff = rng.randn(6, 141).astype(np.float32)
    with torch.no_grad():
        want = tm.affinity(torch.from_numpy(diff)).numpy()[:, 0]
    got = Affinity(141).apply({"params": variables["params"]["affinity"]},
                              jnp.asarray(diff))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_predictor_forward_parity(converted):
    """FlowPredictor / ClsPredictor with converted weights == torch (eval
    mode, running stats)."""
    from ratrack_tpu.models.decoder import FlowPredictor, ClsPredictor
    tm, variables, _ = converted
    rng = np.random.RandomState(2)
    x = rng.randn(40, 256).astype(np.float32)
    tx = torch.from_numpy(x.T[None])          # (1, C, N)
    tm.eval()
    with torch.no_grad():
        want_f = tm.fd_layer.fp(tx).numpy()[0].T        # (N, 3)
        want_c = tm.fd_layer.cp(tx).numpy()[0]          # (N,)
    fd_p = variables["params"]["fd_layer"]
    fd_s = variables["batch_stats"]["fd_layer"]
    got_f = FlowPredictor().apply(
        {"params": fd_p["fp"], "batch_stats": fd_s["fp"]},
        jnp.asarray(x), train=False)
    got_c = ClsPredictor().apply(
        {"params": fd_p["cp"], "batch_stats": fd_s["cp"]},
        jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got_f), want_f, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_c), want_c, atol=2e-5)


def test_full_model_runs_with_converted_weights(converted):
    from ratrack_tpu.models import Track4D
    from ratrack_tpu.tracker import init_state
    from ratrack_tpu.data.synthetic import synthetic_clip

    _, variables, _ = converted
    model = Track4D(npoint=96, k_max=8, sinkhorn_iters=20)
    frame = jax.tree_util.tree_map(
        jnp.asarray, synthetic_clip(1, 1, n_max=96, g_max=8, n_static=40,
                                    n_objects=2, pts_per_obj=8)[0])
    out, state = jax.jit(
        lambda v, f, s: model.apply(v, f, s, train=False))(
        variables, frame, init_state(8))
    assert np.isfinite(np.asarray(out["flow"])).all()
    assert np.isfinite(np.asarray(out["cls"])).all()


def test_reverse_export_round_trip(converted, tmp_path):
    """JAX→torch export (VERDICT r2 #8): flax variables → reference
    state_dict → torch model (strict=False, dead modules keep init) →
    convert back → bit-identical flax variables."""
    from ratrack_tpu.utils.convert import (convert_reference_state_dict,
                                           export_reference_state_dict,
                                           save_reference_checkpoint,
                                           load_reference_checkpoint)
    _, variables, _ = converted

    sd = export_reference_state_dict(variables)
    tm2 = _TorchTrack4D()
    missing, unexpected = tm2.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=False)
    assert not unexpected, unexpected
    assert all("cls_mlp" in k for k in missing), missing

    back, leftover = convert_reference_state_dict(tm2.state_dict())
    for key in leftover:
        assert "cls_mlp" in key or "num_batches_tracked" in key, key

    def flat(tree):
        return {jax.tree_util.keystr(k): np.asarray(v)
                for k, v in jax.tree_util.tree_leaves_with_path(tree)}

    for coll in ("params", "batch_stats"):
        want, got = flat(variables[coll]), flat(back[coll])
        assert set(want) == set(got)
        for k in want:
            assert np.array_equal(want[k], got[k]), k

    # file round trip through the .t7 save/load pair
    path = str(tmp_path / "model.last.t7")
    save_reference_checkpoint(variables, path)
    back2, _ = load_reference_checkpoint(path)
    for coll in ("params", "batch_stats"):
        want, got = flat(variables[coll]), flat(back2[coll])
        for k in want:
            assert np.array_equal(want[k], got[k]), k


def test_reverse_export_torch_forward_parity(converted):
    """Exported weights drive the torch reference modules to the same
    outputs as the flax model they came from (affinity head probe)."""
    from ratrack_tpu.models import Affinity
    from ratrack_tpu.utils.convert import export_reference_state_dict
    _, variables, _ = converted
    sd = export_reference_state_dict(variables)
    tm2 = _TorchTrack4D()
    tm2.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in sd.items()}, strict=False)
    rng = np.random.RandomState(3)
    diff = rng.randn(6, 141).astype(np.float32)
    with torch.no_grad():
        want = tm2.affinity(torch.from_numpy(diff)).numpy()[:, 0]
    got = Affinity(141).apply({"params": variables["params"]["affinity"]},
                              jnp.asarray(diff))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
