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
