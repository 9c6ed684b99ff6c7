"""Full Track4D step: shapes, masking invariance, state carry, grads."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ratrack_tpu.models import Track4D
from ratrack_tpu.tracker import init_state
from ratrack_tpu.data.frames import FrameBatch, empty_frame

N, G, K = 128, 8, 8


def make_frame(rng, n_valid=100, moving_block=True):
    f = empty_frame(N, G)._asdict()
    pc1 = np.zeros((N, 3), np.float32)
    pc1[:n_valid] = rng.randn(n_valid, 3) * np.array([10, 8, 1]) + [20, 0, 1]
    pc2 = pc1 + rng.randn(N, 3).astype(np.float32) * 0.05
    mask = np.zeros(N, bool)
    mask[:n_valid] = True
    ft = np.zeros((N, 2), np.float32)
    ft[:n_valid] = rng.randn(n_valid, 2)
    gt_cls = np.zeros(N, bool)
    gt_dense = np.full(N, -1, np.int32)
    if moving_block:
        gt_cls[:10] = True
        gt_dense[:10] = 0
    gt_ids = np.full(G, -1, np.int32)
    gt_ids[0] = 500
    gt_valid = np.zeros(G, bool)
    gt_valid[0] = True
    f.update(pc1=pc1, pc2=pc2, ft1=ft, ft2=ft.copy(), mask1=mask,
             mask2=mask.copy(), pc1_comp=pc1.copy(), gt_cls=gt_cls,
             gt_flow=pc1.copy(), gt_dense=gt_dense, gt_label_ids=gt_ids,
             gt_valid=gt_valid)
    return FrameBatch(**{k: jnp.asarray(v) for k, v in f.items()})


@pytest.fixture(scope="module")
def model_and_params():
    model = Track4D(npoint=N, k_max=K, sinkhorn_iters=50)
    rng = np.random.RandomState(0)
    frame = make_frame(rng)
    state = init_state(K)
    variables = model.init(jax.random.PRNGKey(0), frame, state, train=False)
    return model, variables, frame, state


def test_forward_shapes_and_finiteness(model_and_params):
    model, variables, frame, state = model_and_params
    out, new_state = model.apply(variables, frame, state, train=False)
    assert out["flow"].shape == (N, 3)
    assert out["cls"].shape == (N,)
    assert out["feats"].shape == (N, 139)
    assert out["labels"].shape == (N,)
    assert out["aff"].shape == (K, K)
    valid = np.asarray(frame.mask1)
    for k in ["flow", "cls", "warp"]:
        v = np.asarray(out[k])
        assert np.all(np.isfinite(v[valid])), k
    assert new_state.h.shape == (5, 128)
    assert np.all(np.isfinite(np.asarray(new_state.h)))
    assert bool(jnp.all((out["cls"] >= 0) & (out["cls"] <= 1)))


def test_padding_invariance(model_and_params):
    """Outputs on valid points must not depend on pad-row contents."""
    model, variables, frame, state = model_and_params
    out1, _ = model.apply(variables, frame, state, train=False)

    poisoned = frame._replace(
        pc1=frame.pc1.at[100:].set(77.0),
        pc2=frame.pc2.at[100:].set(-55.0),
        ft1=frame.ft1.at[100:].set(9.0),
        ft2=frame.ft2.at[100:].set(-9.0))
    out2, _ = model.apply(variables, poisoned, state, train=False)
    v = np.asarray(frame.mask1)
    np.testing.assert_allclose(np.asarray(out1["flow"])[v],
                               np.asarray(out2["flow"])[v], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out1["cls"])[v],
                               np.asarray(out2["cls"])[v], atol=1e-5)


def test_state_carries_and_new_seq_resets(model_and_params):
    model, variables, frame, state = model_and_params
    out1, s1 = model.apply(variables, frame, state, train=False)
    # second frame: same scene → the tracker should carry h and desc
    out2, s2 = model.apply(variables, frame, s1, train=False)
    assert not np.allclose(np.asarray(s1.h), 0)
    assert int(s2.frame_idx) == int(s1.frame_idx) + 1
    # new_seq resets h/desc but not next_id
    frame_reset = frame._replace(new_seq=jnp.asarray(True))
    out3, s3 = model.apply(variables, frame_reset, s1, train=False)
    assert int(s3.frame_idx) == 1
    assert int(s3.next_id) >= int(s1.next_id)
    # with reset state, prev slots are empty → all tracks newborn
    tid = np.asarray(out3["track_id"])
    n_val = int(np.asarray(out3["n"]))
    if n_val:
        assert np.all(tid[:n_val] >= int(s1.next_id))


def test_train_mode_updates_batch_stats_and_grads(model_and_params):
    model, variables, frame, state = model_and_params

    def loss(params):
        (out, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            frame, state, train=True, mutable=["batch_stats"])
        return (jnp.sum(out["flow"] ** 2 * frame.mask1[:, None])
                + jnp.sum(out["cls"] * frame.mask1)
                + jnp.sum(out["aff"]))

    g = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    # gradient reaches the backbone and the affinity head
    total = sum(float(jnp.sum(jnp.abs(x))) for x in flat)
    assert total > 0
    aff_g = g["affinity"]
    assert any(float(jnp.sum(jnp.abs(x))) > 0
               for x in jax.tree_util.tree_leaves(aff_g))


@pytest.mark.slow
def test_forward_fps_path_npoint_lt_n():
    """Stretch-shape path: n_max > npoints forces true FPS sampling
    (BASELINE config 4 shape semantics at a CPU-testable scale)."""
    from ratrack_tpu.data.synthetic import synthetic_clip
    model = Track4D(npoint=64, k_max=8, sinkhorn_iters=20, exact_fps=True)
    frame = synthetic_clip(3, 1, n_max=160, g_max=8, n_static=80,
                           n_objects=2, pts_per_obj=8)[0]
    frame = jax.tree_util.tree_map(jnp.asarray, frame)
    state = init_state(8)
    variables = jax.jit(
        lambda k: model.init(k, frame, state, train=False))(
        jax.random.PRNGKey(0))
    out, new_state = jax.jit(
        lambda v, f, s: model.apply(v, f, s, train=False))(
        variables, frame, state)
    assert np.isfinite(np.asarray(out["flow"])).all()
    assert out["cls"].shape == (160,)
    assert int(out["n"]) >= 0


@pytest.mark.slow
def test_forward_bfloat16():
    """bf16 compute dtype: finite outputs, f32 feature tensor preserved."""
    from ratrack_tpu.data.synthetic import synthetic_clip
    model = Track4D(npoint=96, k_max=8, sinkhorn_iters=20,
                    dtype=jnp.bfloat16)
    frame = synthetic_clip(4, 1, n_max=96, g_max=8, n_static=40,
                           n_objects=2, pts_per_obj=8)[0]
    frame = jax.tree_util.tree_map(jnp.asarray, frame)
    state = init_state(8)
    variables = jax.jit(
        lambda k: model.init(k, frame, state, train=False))(
        jax.random.PRNGKey(0))
    out, _ = jax.jit(
        lambda v, f, s: model.apply(v, f, s, train=False))(
        variables, frame, state)
    assert np.isfinite(np.asarray(out["flow"], np.float32)).all()
    assert out["feats"].dtype == jnp.float32   # 139-ch tensor stays f32


@pytest.mark.slow
def test_mov_budget_compacted_dbscan_is_exact():
    """compact_dbscan == dbscan whenever #masked <= budget, and the model
    runs with a budget configured."""
    from ratrack_tpu.tracker.dbscan import dbscan, compact_dbscan
    from ratrack_tpu.data.synthetic import synthetic_clip

    rng = np.random.RandomState(3)
    n = 128
    x = jnp.asarray(np.concatenate(
        [rng.randn(10, 8) * 0.3, rng.randn(12, 8) * 0.3 + 6,
         rng.uniform(-20, 20, (n - 22, 8))]).astype(np.float32))
    mask = np.zeros(n, bool)
    mask[rng.choice(n, 40, replace=False)] = True     # 40 moving <= 48
    mask = jnp.asarray(mask)
    scores = jnp.asarray(rng.rand(n).astype(np.float32))
    want = np.asarray(dbscan(x, mask, 1.5, 2, 64))
    got = np.asarray(compact_dbscan(x, mask, scores, 48, 1.5, 2, 64))
    np.testing.assert_array_equal(got, want)

    # overflow regime: only the budget-many highest scores get clustered
    got_of = np.asarray(compact_dbscan(x, mask, scores, 16, 1.5, 2, 64))
    assert (got_of[~np.asarray(mask)] == -1).all()
    assert np.sum(got_of >= 0) <= 16

    # model path with a budget runs end to end
    frame = jax.tree_util.tree_map(
        jnp.asarray, synthetic_clip(6, 1, n_max=N, g_max=G, n_static=40,
                                    n_objects=2, pts_per_obj=8)[0])
    comp = Track4D(npoint=N, k_max=K, sinkhorn_iters=20, mov_budget=64)
    state = init_state(K)
    variables = jax.jit(
        lambda k: comp.init(k, frame, state, train=False))(
        jax.random.PRNGKey(0))
    out, _ = jax.jit(lambda v, f, s: comp.apply(v, f, s, train=False))(
        variables, frame, state)
    assert np.isfinite(np.asarray(out["flow"])).all()
