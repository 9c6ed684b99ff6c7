"""Losses, metrics, and the jitted train step on synthetic clips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ratrack_tpu.config import Config
from ratrack_tpu.models import Track4D
from ratrack_tpu.tracker import init_state
from ratrack_tpu.data.synthetic import synthetic_clip, stack_frames
from ratrack_tpu.data.frames import FrameBatch
from ratrack_tpu.train import (track4d_loss, flow_loss, motion_seg_loss,
                               affinity_loss, eval_scene_flow,
                               eval_motion_seg, create_train_state,
                               make_optimizer, make_train_step,
                               make_eval_step)

N, K, G = 96, 8, 8


def tiny_model():
    return Track4D(npoint=N, k_max=K, sinkhorn_iters=20)


def tiny_cfg():
    return Config(n_max=N, k_max=K, g_max=G, npoints=N, sinkhorn_iters=20)


def clip(seed=0, n_frames=3):
    return synthetic_clip(seed, n_frames, n_max=N, g_max=G, n_static=40,
                          n_objects=2, pts_per_obj=8)


def test_flow_loss_masked():
    warp = jnp.ones((10, 3))
    gt = jnp.zeros((10, 3))
    mask = jnp.asarray(np.array([True] * 5 + [False] * 5))
    got = float(flow_loss(warp, gt.at[5:].set(100.0), mask))
    np.testing.assert_allclose(got, np.sqrt(3.0), rtol=1e-5)


def test_seg_loss_weighting():
    cls = jnp.full((4,), 0.5)
    gt = jnp.asarray([True, True, False, False])
    mask = jnp.ones(4, bool)
    got = float(motion_seg_loss(cls, gt, mask))
    want = (0.4 + 0.6) * (-np.log(0.5))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # empty positive class → only the negative term (reference NaN-guard)
    got2 = float(motion_seg_loss(cls, jnp.zeros(4, bool), mask))
    np.testing.assert_allclose(got2, 0.6 * (-np.log(0.5)), rtol=1e-5)


def test_affinity_loss_identity_mapping():
    aff = jnp.asarray([[0.9, 0.1], [0.1, 0.9]])
    pid = jnp.asarray([100, 200])
    cid = jnp.asarray([100, 200])
    v = jnp.ones(2, bool)
    got = float(affinity_loss(aff, pid, v, cid, v))
    want = -np.log(0.9)
    np.testing.assert_allclose(got, want, rtol=1e-4)
    # empty prev → 0
    assert float(affinity_loss(aff, pid, jnp.zeros(2, bool), cid, v)) == 0.0


def test_metrics_shapes(rng):
    pc = rng.randn(50, 3).astype(np.float32) + [20, 0, 1]
    pred = pc + 0.05
    gt = pc.copy()
    mask = (rng.rand(50) > 0.5).astype(np.float32)
    valid = np.ones(50, bool)
    sf = eval_scene_flow(pc, pred, gt, mask, valid)
    assert set(sf) == {"rne", "50-50 rne", "mov_rne", "stat_rne", "sas",
                       "ras", "epe"}
    assert np.isfinite(list(sf.values())).all()
    seg = eval_motion_seg(mask, mask, valid)
    assert seg["acc"] > 0.99


@pytest.mark.slow
def test_train_step_reduces_seg_loss():
    model = tiny_model()
    cfg = tiny_cfg().replace(lr=2e-3)
    frames_list = clip(0, 3)
    ts = create_train_state(model, cfg, frames_list[0], init_state(K),
                            steps_per_epoch=3)
    tx = make_optimizer(cfg, 3)
    train_step = make_train_step(model, tx)

    # batch of one clip stream
    def batchify(f):
        return FrameBatch(*[jnp.asarray(np.asarray(x)[None])
                            for x in f])

    tstates = jax.vmap(lambda _: init_state(K))(jnp.arange(1))
    first = None
    last = None
    for ep in range(4):
        for f in frames_list:
            ts, tstates, items = train_step(ts, tstates, batchify(f),
                                            jnp.asarray(True))
            v = float(jnp.mean(items["SegLoss"]))
            if first is None:
                first = v
            last = v
    assert np.isfinite(last)
    assert last < first, (first, last)


@pytest.mark.slow
def test_scan_train_matches_sequential_steps():
    """Fused scan training == per-frame train_step calls.

    At T=1 the two compiled programs are bit-exact. At T>1 XLA compiles
    the scan body with different fusion choices, and discrete selections
    (top_k neighbors, DBSCAN) amplify float noise across steps — so the
    multi-step check asserts threading structure (per-step losses track the
    sequential run, step counter, finiteness) rather than bit equality.
    """
    from ratrack_tpu.train.step import make_scan_train_step

    model = tiny_model()
    cfg = tiny_cfg()
    frames_list = clip(2, 3)
    ts0 = create_train_state(model, cfg, frames_list[0], init_state(K),
                             steps_per_epoch=3)
    tx = make_optimizer(cfg, 3)
    train_step = make_train_step(model, tx)
    scan_train = make_scan_train_step(model, tx)
    b = 2

    def batchify(f):
        return FrameBatch(*[jnp.asarray(
            np.broadcast_to(np.asarray(x)[None], (b,) + np.asarray(x).shape))
            for x in f])

    tstates = jax.vmap(lambda _: init_state(K))(jnp.arange(b))

    # --- T=1: bit-exact equivalence ---
    ts_a, _, items_a = train_step(ts0, tstates, batchify(frames_list[0]),
                                  jnp.asarray(False))
    block1 = jax.tree_util.tree_map(lambda x: x[:, None],
                                    batchify(frames_list[0]))
    ts_b, _, items_b = scan_train(ts0, tstates, block1, jnp.asarray(False))
    np.testing.assert_array_equal(np.asarray(items_a["Loss"]),
                                  np.asarray(items_b["Loss"][0]))
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)),
        ts_a.params, ts_b.params)

    # --- T=3: structural equivalence ---
    ts_seq, tst_seq = ts0, tstates
    seq_losses = []
    for f in frames_list:
        ts_seq, tst_seq, items = train_step(ts_seq, tst_seq, batchify(f),
                                            jnp.asarray(False))
        seq_losses.append(float(jnp.mean(items["Loss"])))

    block = FrameBatch(*[jnp.asarray(
        np.broadcast_to(np.stack([np.asarray(getattr(f, name))
                                  for f in frames_list])[None],
                        (b, len(frames_list))
                        + np.asarray(getattr(frames_list[0], name)).shape))
        for name in FrameBatch._fields])
    ts_scan, _, items_scan = scan_train(ts0, tstates, block,
                                        jnp.asarray(False))
    scan_losses = np.mean(np.asarray(items_scan["Loss"]), axis=1)
    assert np.isfinite(scan_losses).all()
    np.testing.assert_allclose(scan_losses, seq_losses, rtol=0.1)
    assert int(ts_scan.step) == int(ts_seq.step) == len(frames_list)


def test_split_clips_balanced():
    from ratrack_tpu.data.pipeline import split_clips_balanced
    groups = split_clips_balanced(["a", "b", "c", "d"], [10, 1, 5, 6], 2)
    totals = sorted(sum({"a": 10, "b": 1, "c": 5, "d": 6}[c] for c in g)
                    for g in groups)
    assert totals == [11, 11]
    # more groups than clips → empties allowed
    groups = split_clips_balanced(["a"], [3], 3)
    assert sum(len(g) for g in groups) == 1


def test_batched_blocks_shapes_and_wrap():
    from ratrack_tpu.data.pipeline import batched_blocks

    def make_stream(clips):
        def gen():
            for c in clips:
                n = {"long": 5, "short": 2}[c]
                for i, rec in enumerate(
                        synthetic_clip(hash(c) % 100, n, n_max=N, g_max=G,
                                       n_static=40, n_objects=2,
                                       pts_per_obj=8)):
                    yield c, rec
        return list(gen())   # re-iterable

    blocks = list(batched_blocks(make_stream, [["long"], ["short"]],
                                 [5, 2], 2, N, G))
    assert len(blocks) == 3          # ceil(5 / 2)
    for blk in blocks:
        assert blk.pc1.shape == (2, 2, N, 3)
        assert blk.new_seq.shape == (2, 2)
    # the short stream wraps: its records repeat with new_seq=True restarts
    short_new_seq = np.concatenate([np.asarray(b.new_seq[1]) for b in blocks])
    assert short_new_seq.sum() >= 2  # at least 2 restarts in 6 slots
    # empty group → all-padding frames
    blocks = list(batched_blocks(make_stream, [["short"], []], [2, 0],
                                 2, N, G))
    assert not np.asarray(blocks[0].mask1[1]).any()


def test_eval_step_runs_and_is_deterministic():
    model = tiny_model()
    cfg = tiny_cfg()
    frames_list = clip(1, 2)
    ts = create_train_state(model, cfg, frames_list[0], init_state(K),
                            steps_per_epoch=3)
    eval_step = make_eval_step(model)
    variables = {"params": ts.params, "batch_stats": ts.batch_stats}
    batch = FrameBatch(*[jnp.asarray(np.asarray(x)[None])
                         for x in frames_list[0]])
    tstates = jax.vmap(lambda _: init_state(K))(jnp.arange(1))
    out1, s1 = eval_step(variables, tstates, batch)
    out2, s2 = eval_step(variables, tstates, batch)
    np.testing.assert_array_equal(np.asarray(out1["labels"]),
                                  np.asarray(out2["labels"]))
    np.testing.assert_allclose(np.asarray(out1["flow"]),
                               np.asarray(out2["flow"]), atol=0)


@pytest.mark.slow
def test_pipelined_eval_matches_sequential_scan():
    """Phase-parallel eval == sequential scan, bit-exact in eval mode."""
    from ratrack_tpu.train.step import (make_scan_eval_step,
                                        make_pipelined_eval_step)
    from ratrack_tpu.data.synthetic import stack_frames

    b, t = 2, 5
    model = tiny_model()
    clips_ = [clip(s, t) for s in range(b)]
    stacked = [stack_frames(c) for c in clips_]
    frames = FrameBatch(*[jnp.asarray(
        np.stack([np.asarray(getattr(s, f)) for s in stacked]))
        for f in FrameBatch._fields])
    frame0 = jax.tree_util.tree_map(lambda x: x[0, 0], frames)
    state0 = init_state(K)
    variables = jax.jit(
        lambda k: model.init(k, frame0, state0, train=False))(
        jax.random.PRNGKey(0))
    tstates = jax.vmap(lambda _: init_state(K))(jnp.arange(b))

    ts_seq, out_seq = make_scan_eval_step(model)(variables, tstates, frames)
    ts_pipe, out_pipe = make_pipelined_eval_step(model)(variables, tstates,
                                                        frames)
    for key in ["cls", "warp"]:
        np.testing.assert_array_equal(np.asarray(out_seq[key]),
                                      np.asarray(out_pipe[key]))
    for key in ["labels", "track_id", "conf", "n"]:
        np.testing.assert_array_equal(np.asarray(out_seq[key]),
                                      np.asarray(out_pipe[key]))
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_array_equal(np.asarray(a),
                                                    np.asarray(b_)),
        ts_seq, ts_pipe)


def test_all_padding_stream_keeps_gradients_finite():
    """Regression: an all-padding stream (dp > #clips) once produced -inf
    global features whose NaN activations poisoned every parameter through
    the mean-over-streams gradient (NaN x zero-cotangent = NaN)."""
    from ratrack_tpu.data.frames import empty_frame

    model = tiny_model()
    cfg = tiny_cfg()
    real = clip(0, 1)[0]
    pad = empty_frame(N, G)
    ts = create_train_state(model, cfg, real, init_state(K),
                            steps_per_epoch=3)
    tx = make_optimizer(cfg, 3)
    step = make_train_step(model, tx)
    batch = FrameBatch(*[jnp.asarray(
        np.stack([np.asarray(a), np.asarray(b)]))
        for a, b in zip(real, pad)])
    tstates = jax.vmap(lambda _: init_state(K))(jnp.arange(2))
    ts2, _, items = step(ts, tstates, batch, jnp.asarray(False))
    assert float(np.asarray(items["Loss"])[1]) == 0.0
    assert all(bool(np.isfinite(np.asarray(x)).all())
               for x in jax.tree_util.tree_leaves(ts2.params))


def test_prefetcher_propagates_errors_and_preserves_order():
    from ratrack_tpu.data.pipeline import Prefetcher

    assert list(Prefetcher(iter(range(20)), depth=3)) == list(range(20))

    def boom():
        yield 1
        yield 2
        raise ValueError("producer failed")

    it = iter(Prefetcher(boom(), depth=2))
    assert next(it) == 1 and next(it) == 2
    with pytest.raises(ValueError, match="producer failed"):
        next(it)


def test_batched_blocks_all_skipped_group_yields_padding():
    """A group whose stream yields nothing (all frames skipped) must not
    spin forever — it degrades to all-padding frames."""
    from ratrack_tpu.data.pipeline import batched_blocks

    def make_stream(clips):
        if clips == ["empty"]:
            return []
        return [(c, r) for c in clips
                for r in synthetic_clip(0, 2, n_max=N, g_max=G,
                                        n_static=40, n_objects=2,
                                        pts_per_obj=8)]

    blocks = list(batched_blocks(make_stream, [["ok"], ["empty"]],
                                 [2, 0], 2, N, G))
    assert len(blocks) == 1
    assert not np.asarray(blocks[0].mask1[1]).any()   # padding stream
    assert np.asarray(blocks[0].mask1[0]).any()       # real stream


def test_full_model_fused_train_grads_match_unfused():
    """End-to-end structural anchor for the fused TRAIN path: one full
    Track4D train-mode forward + SEG-loss gradient (the pretrain gate's
    continuous path) with fused_train=True (radius-pair SA kernels +
    fused correlator stages, CPU interpret) vs the unfused XLA path.

    Bounds are the composition class, looser than the per-module 0.99:
    on CPU the unfused baseline's dots are exact f32 while the kernels
    keep their TPU bf16-pass numerics, and ~10 stacked modules of
    ~1e-2-class forward deltas shift ReLU/BN boundaries (measured
    per-leaf cosines 0.80-0.99 here; on the real chip both paths are
    bf16-pass and the module tests pin 0.99). The FULL loss is not
    compared: flow/affinity flow through discrete stages (cls>0.5
    masks, DBSCAN labels, GT matching) whose selections flip under any
    forward perturbation, decorrelating gradients by construction —
    the fused path's training QUALITY is instead pinned end-to-end by
    the synthetic-world run (seg acc 0.98 / SAMOTA 93, README). This
    test's job is to catch structural breakage (wrong routing, dead
    grads, tree mismatch), where cosines collapse toward 0."""
    from ratrack_tpu.ops import pallas_sa
    from ratrack_tpu.train import track4d_loss as t4d_loss

    n = 128   # fused_t gating needs n % 128 == 0, npoint % 128 == 0
    c = synthetic_clip(3, 2, n_max=n, g_max=G, n_static=60, n_objects=2,
                       pts_per_obj=8)
    frame = jax.tree_util.tree_map(lambda x: jnp.asarray(x[-1]),
                                   stack_frames(c))
    state = init_state(K)

    old = pallas_sa.FORCE_FUSED_ON_CPU
    pallas_sa.FORCE_FUSED_ON_CPU = True
    try:
        def grads_of(fused):
            model = Track4D(npoint=n, k_max=K, sinkhorn_iters=20,
                            fused_eval=False, fused_train=fused)
            vs = model.init(jax.random.PRNGKey(0), frame, state,
                            train=False)

            def loss_fn(params):
                (out, _), _ = model.apply(
                    {"params": params,
                     "batch_stats": vs.get("batch_stats", {})},
                    frame, state, train=True, mutable=["batch_stats"])
                loss, _ = t4d_loss(out, frame, jnp.asarray(True))
                return loss

            loss, g = jax.value_and_grad(loss_fn)(vs["params"])
            return float(loss), g

        lf, gf = grads_of(True)
        lu, gu = grads_of(False)
    finally:
        pallas_sa.FORCE_FUSED_ON_CPU = old

    assert abs(lf - lu) / (abs(lu) + 1e-9) < 0.01, (lf, lu)
    flat_f = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(gf)}
    flat_u = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(gu)}
    assert set(flat_f) == set(flat_u)
    all_f, all_u = [], []
    for key in flat_u:
        a = np.asarray(flat_f[key]).ravel()
        r = np.asarray(flat_u[key]).ravel()
        nr = float(np.linalg.norm(r))
        if nr < 1e-6:    # structurally-(near-)zero grads: seg loss does
            continue     # not reach the GRU/affinity/redundant biases
        all_f.append(a)
        all_u.append(r)
        cos = float(np.dot(a, r) / (np.linalg.norm(a) * nr + 1e-12))
        assert cos > 0.7, (key, cos)
    af = np.concatenate(all_f)
    au = np.concatenate(all_u)
    gcos = float(np.dot(af, au)
                 / (np.linalg.norm(af) * np.linalg.norm(au) + 1e-12))
    assert gcos > 0.93, gcos
