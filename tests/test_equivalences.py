"""Equivalence / drift characterization tests (round-1 VERDICT items).

1. `identity_sample` (the production default at npoint == N) must be
   END-TO-END equivalent to true FPS: at npoint == N both select every
   valid point plus seed-duplicates, differing only in center ORDER, and
   every downstream consumer (per-center ball-query MLPs, max-pool,
   3-NN interpolation, global max) is order-invariant over the center
   set. Round 1 argued this; here the full Track4D step asserts it.

2. BN-under-dp drift: the dp-batched trainer updates BN running stats as
   the across-stream mean of per-stream updates and averages gradients
   across streams, while the reference trains strictly sequentially at
   batch 1 (src/main_utils.py:248-251). The trajectories legitimately
   differ (averaged vs sequential SGD); this test QUANTIFIES the
   divergence over a short run and bounds it, so a regression that
   breaks dp semantics (not just reorders updates) is caught.

3. `filter_moving_labels` positional pairing (data/vod.py): the
   reference pairs detection-line moving flags with tracking-label dict
   keys BY POSITION (track4d_utils.py:581-590). Hostile cases pin the
   quirk's exact behavior under count/order mismatches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratrack_tpu.config import Config
from ratrack_tpu.data.frames import FrameBatch
from ratrack_tpu.data.synthetic import synthetic_clip, stack_frames
from ratrack_tpu.data.vod import ObjectLabel, filter_moving_labels
from ratrack_tpu.models import Track4D
from ratrack_tpu.tracker import init_state
from ratrack_tpu.train import create_train_state
from ratrack_tpu.train.step import make_scan_train_step, make_train_step

N_MAX, K_MAX, G_MAX = 64, 8, 8


class TestExactFPSEquivalence:
    def test_track4d_step_identity_equals_exact_fps(self):
        """The production identity-sample path == true FPS at npoint==N."""
        frame = jax.tree_util.tree_map(
            jnp.asarray,
            synthetic_clip(0, 1, n_max=N_MAX, g_max=G_MAX, n_static=40,
                           n_objects=2, pts_per_obj=6)[0])
        state = init_state(K_MAX)
        m_id = Track4D(npoint=N_MAX, k_max=K_MAX, sinkhorn_iters=20,
                       exact_fps=False)
        m_fps = Track4D(npoint=N_MAX, k_max=K_MAX, sinkhorn_iters=20,
                        exact_fps=True)
        vs = jax.jit(lambda k: m_id.init(k, frame, state,
                                         train=False))(jax.random.PRNGKey(0))
        out_id, st_id = jax.jit(
            lambda v, f, s: m_id.apply(v, f, s, train=False))(vs, frame,
                                                              state)
        out_fps, st_fps = jax.jit(
            lambda v, f, s: m_fps.apply(v, f, s, train=False))(vs, frame,
                                                               state)
        for k in ("cls", "flow", "warp"):
            np.testing.assert_allclose(
                np.asarray(out_fps[k]), np.asarray(out_id[k]),
                atol=2e-4, rtol=1e-4,
                err_msg=f"{k} differs between identity and exact FPS")
        np.testing.assert_array_equal(np.asarray(out_fps["labels"]),
                                      np.asarray(out_id["labels"]))
        np.testing.assert_array_equal(np.asarray(st_fps.track_id),
                                      np.asarray(st_id.track_id))

    def test_partial_validity(self):
        """Equivalence holds with heavy padding (few valid points):
        both samplers emit the same duplicate-seed pattern."""
        clip = synthetic_clip(3, 1, n_max=N_MAX, g_max=G_MAX, n_static=10,
                              n_objects=1, pts_per_obj=4)
        frame = jax.tree_util.tree_map(jnp.asarray, clip[0])
        assert int(np.asarray(frame.mask1).sum()) < N_MAX // 2
        state = init_state(K_MAX)
        m_id = Track4D(npoint=N_MAX, k_max=K_MAX, sinkhorn_iters=20,
                       exact_fps=False)
        m_fps = Track4D(npoint=N_MAX, k_max=K_MAX, sinkhorn_iters=20,
                        exact_fps=True)
        vs = jax.jit(lambda k: m_id.init(k, frame, state,
                                         train=False))(jax.random.PRNGKey(1))
        out_id, _ = jax.jit(
            lambda v, f, s: m_id.apply(v, f, s, train=False))(vs, frame,
                                                              state)
        out_fps, _ = jax.jit(
            lambda v, f, s: m_fps.apply(v, f, s, train=False))(vs, frame,
                                                               state)
        np.testing.assert_allclose(np.asarray(out_fps["cls"]),
                                   np.asarray(out_id["cls"]),
                                   atol=2e-4, rtol=1e-4)


class TestBNDpDrift:
    @pytest.mark.slow
    def test_dp_batched_vs_sequential_batch1_bounded(self):
        """dp=4 fused batched training vs reference-style sequential
        batch-1 training on the same frames: quantify the divergence.

        Averaged-gradient SGD and sequential SGD are different
        optimizers, so exact equality is impossible by design. Measured
        structure of the drift (the point of this test):

        * parameters: < 2% relative after the run — the averaged
          gradient closely tracks the sequential trajectory;
        * BN running stats: ORDER-1 relative during burn-in, because
          the batched trainer applies ONE momentum-0.1 update per frame
          position (the across-stream mean) while the sequential
          reference applies n_streams of them — after k updates the
          stats have absorbed 1-0.9^k of the data moments (2 updates:
          19%, 8 updates: 57%), so early-training running stats differ
          by construction, converging as both approach the data
          moments. Eval-mode quality parity after real training is the
          meaningful check (synthetic train/eval configs cover it).
        """
        n_streams, t = 4, 2
        cfg = Config(n_max=N_MAX, k_max=K_MAX, g_max=G_MAX, npoints=N_MAX,
                     sinkhorn_iters=20, lr=1e-3)
        model = Track4D(npoint=N_MAX, k_max=K_MAX, sinkhorn_iters=20)
        clips = [synthetic_clip(s, t, n_max=N_MAX, g_max=G_MAX,
                                n_static=24, n_objects=2, pts_per_obj=6)
                 for s in range(n_streams)]
        frames_bt = FrameBatch(*[
            jnp.asarray(np.stack([np.asarray(getattr(stack_frames(c), f))
                                  for c in clips]))
            for f in FrameBatch._fields])
        tstates = jax.vmap(lambda _: init_state(K_MAX))(
            jnp.arange(n_streams))
        ts0 = create_train_state(model, cfg, clips[0][0], init_state(K_MAX),
                                 steps_per_epoch=100)
        import optax
        tx = optax.adam(1e-3)
        ts0 = ts0._replace(opt_state=tx.init(ts0.params))

        # dp-batched: T fused steps over 4 streams at once
        scan_train = make_scan_train_step(model, tx)
        ts_b, _, items_b = scan_train(ts0, tstates, frames_bt,
                                      jnp.asarray(True))

        # reference-style: batch 1, clip-major sequential frames
        train_step = make_train_step(model, tx)
        ts_s = ts0
        losses_s = []
        for s in range(n_streams):
            tstate1 = jax.tree_util.tree_map(
                lambda x: x[None], init_state(K_MAX))
            for fi in range(t):
                frame1 = jax.tree_util.tree_map(
                    lambda x: x[s:s + 1, fi], frames_bt)
                ts_s, tstate1, items = train_step(ts_s, tstate1, frame1,
                                                  jnp.asarray(True))
                losses_s.append(float(np.mean(np.asarray(items["Loss"]))))

        assert int(ts_b.step) == t            # T fused rounds
        assert int(ts_s.step) == n_streams * t

        # parameter drift: bounded relative to parameter scale
        num = den = 0.0
        for a, b in zip(jax.tree_util.tree_leaves(ts_b.params),
                        jax.tree_util.tree_leaves(ts_s.params)):
            num += float(jnp.sum((a - b) ** 2))
            den += float(jnp.sum(b ** 2))
        rel_params = np.sqrt(num / max(den, 1e-12))
        # order-of-magnitude bound: the dp-vs-sequential BN burn-in
        # difference is real but small (empirically ~2% after this many
        # steps on the synthetic stream; margin for workload drift)
        assert rel_params < 0.03, f"param drift {rel_params:.4f}"

        # BN running-stats drift: burn-in dominated (see docstring); the
        # bound catches sign/scale regressions, not the update-count
        # mismatch that is the documented semantic difference
        num = den = 0.0
        for a, b in zip(jax.tree_util.tree_leaves(ts_b.batch_stats),
                        jax.tree_util.tree_leaves(ts_s.batch_stats)):
            num += float(jnp.sum((a - b) ** 2))
            den += float(jnp.sum(b ** 2))
        rel_stats = np.sqrt(num / max(den, 1e-12))
        assert rel_stats < 1.5, f"BN stats drift {rel_stats:.4f}"

        # both runs actually train
        lb = np.asarray(items_b["Loss"])          # [T, B]
        assert np.isfinite(lb).all() and np.isfinite(losses_s).all()


class TestFilterMovingLabelsQuirk:
    """Hostile cases for the positional det-flag <-> tracking-key pairing
    (reference filter_moving_boxes_det, track4d_utils.py:581-590)."""

    @staticmethod
    def _label(i):
        return ObjectLabel(type="Car", id=i, occ=0, alpha=0,
                           bbox2d=np.zeros(4, np.float32), h=1, w=1, l=1,
                           x=float(i), y=0, z=0, ry=0)

    @staticmethod
    def _det(flag):
        return f"Car {flag} 0 0 0 0 10 10 1 1 1 0 0 0 0"

    def test_pairing_is_positional_not_by_id(self):
        # tracking dict in NON-id order: flags still pair by position
        labels = {7: self._label(7), 3: self._label(3), 9: self._label(9)}
        det = [self._det(1), self._det(0), self._det(1)]
        out = filter_moving_labels(labels, det)
        # position 0 -> key 7 (moving), position 1 -> key 3 (static),
        # position 2 -> key 9 (moving)
        assert set(out) == {7, 9}

    def test_extra_detection_lines_are_dropped(self):
        # more det lines than tracking labels: trailing flags ignored
        labels = {1: self._label(1), 2: self._label(2)}
        det = [self._det(0), self._det(1), self._det(1), self._det(1)]
        out = filter_moving_labels(labels, det)
        assert set(out) == {2}

    def test_missing_detection_lines_leave_objects_static(self):
        # fewer det lines: unpaired tracking labels are never moving
        labels = {1: self._label(1), 2: self._label(2), 3: self._label(3)}
        det = [self._det(1)]
        out = filter_moving_labels(labels, det)
        assert set(out) == {1}

    def test_mismatch_mislabels_silently(self):
        """THE quirk: a dropped tracking line shifts every pairing after
        it — the moving flag lands on the WRONG object. Faithful to the
        reference; this test documents the hazard explicitly."""
        labels = {1: self._label(1), 3: self._label(3)}   # id 2 dropped
        det = [self._det(0), self._det(1), self._det(0)]  # flags for 1,2,3
        out = filter_moving_labels(labels, det)
        # id 2's moving flag (position 1) lands on id 3
        assert set(out) == {3}

    def test_real_frame_alignment(self):
        # on well-formed data (same source file), pairing is trivially
        # consistent: flags from detection labels built from the same
        # objects in the same order select exactly the flagged ids
        labels = {i: self._label(i) for i in range(5)}
        flags = [0, 1, 0, 1, 1]
        det = [self._det(f) for f in flags]
        out = filter_moving_labels(labels, det)
        assert set(out) == {1, 3, 4}


class TestCachedBackboneScan:
    """make_scan_eval_step_cached must be BIT-identical to the plain scan
    on contiguous streams (pc2[t] == pc1[t-1]): the pc2 PNHead is a pure
    function of the cloud in eval mode, so carrying frame t-1's f1 as
    frame t's f2 removes ~1/3 of the backbone work without any numeric
    freedom. The reference recomputes PNHead(pc2) per frame
    (src/models/track4d.py:102-106)."""

    def _setup(self, B=2, T=6, N=128, K=8):
        from ratrack_tpu.train.step import (make_scan_eval_step,
                                            make_scan_eval_step_cached)
        clips = [synthetic_clip(s, T, n_max=N, g_max=K, n_static=60,
                                n_objects=3) for s in range(B)]
        stacked = [stack_frames(c) for c in clips]
        frames = FrameBatch(*[
            jnp.asarray(np.stack([getattr(s, f) for s in stacked]))
            for f in FrameBatch._fields])
        model = Track4D(npoint=N, k_max=K, sinkhorn_iters=50)
        state0 = init_state(K)
        f0 = jax.tree_util.tree_map(lambda x: x[0, 0], frames)
        variables = jax.jit(
            lambda k: model.init(k, f0, state0, train=False))(
                jax.random.PRNGKey(0))
        ts = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), state0)
        return (make_scan_eval_step(model), make_scan_eval_step_cached(model),
                variables, ts, frames)

    def test_synthetic_world_chains(self):
        s = stack_frames(synthetic_clip(3, 5, n_max=64, g_max=8,
                                        n_static=30, n_objects=2))
        for t in range(1, 5):
            assert np.array_equal(s.pc2[t], s.pc1[t - 1])
            assert np.array_equal(s.ft2[t], s.ft1[t - 1])
            assert np.array_equal(s.mask2[t], s.mask1[t - 1])
        # each scan owns its features: within a pair they differ
        assert not np.array_equal(s.ft1[0], s.ft2[0])

    def test_bit_exact_outputs_and_state(self):
        plain, cached, variables, ts, frames = self._setup()
        ref_t, ref_o = plain(variables, ts, frames)
        new_t, new_o = cached(variables, ts, frames)
        for k in ref_o:
            assert np.array_equal(np.asarray(ref_o[k]),
                                  np.asarray(new_o[k])), k
        for a, b in zip(jax.tree_util.tree_leaves(ref_t),
                        jax.tree_util.tree_leaves(new_t)):
            assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_chain_contiguous_gate(self):
        from ratrack_tpu.train.step import chain_contiguous
        assert chain_contiguous([5, 6, 7], [True, False, False])
        assert chain_contiguous([5, 6, 7], [False, False, False])
        assert chain_contiguous([9], [False])                  # single rec
        # a skipped frame breaks the pc2==prev-pc1 chain WITHOUT new_seq
        # (data/pipeline.py skip-and-continue) -> must fall back
        assert not chain_contiguous([5, 6, 8], [False, False, False])
        # mid-block sequence reset -> different clip's cloud
        assert not chain_contiguous([5, 6, 7], [False, True, False])

    def test_cached_f2_equals_fresh_head(self):
        """The carried f1 is exactly what head_stage(pc2) would produce
        next frame — the invariant behind the bit-exactness above."""
        _, _, variables, ts, frames = self._setup(B=1, T=3)
        model = Track4D(npoint=128, k_max=8, sinkhorn_iters=50)
        f1_prev = model.apply(variables, frames.pc1[0, 0], frames.ft1[0, 0],
                              frames.mask1[0, 0], False,
                              method=Track4D.head_stage)
        f2_next = model.apply(variables, frames.pc2[0, 1], frames.ft2[0, 1],
                              frames.mask2[0, 1], False,
                              method=Track4D.head_stage)
        assert np.array_equal(np.asarray(f1_prev), np.asarray(f2_next))
