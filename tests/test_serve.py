"""Online serving (ratrack_tpu.serve) — raw scans in, tracks out.

Pins the service against the offline eval path: feeding the same scan
sequence through RadarTracker must reproduce the scan-fused eval step's
outputs exactly, and streams must be fully isolated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratrack_tpu.data.frames import FrameBatch
from ratrack_tpu.data.synthetic import synthetic_clip, stack_frames
from ratrack_tpu.models import Track4D
from ratrack_tpu.serve import RadarTracker
from ratrack_tpu.tracker import init_state

N, K, T = 128, 8, 5


@pytest.fixture(scope="module")
def model_and_vars():
    model = Track4D(npoint=N, k_max=K, sinkhorn_iters=50)
    clip = synthetic_clip(0, 2, n_max=N, g_max=K, n_static=60, n_objects=3)
    state0 = init_state(K)
    variables = jax.jit(
        lambda k: model.init(k, clip[0], state0, train=False))(
            jax.random.PRNGKey(0))
    return model, variables


def clip_scans(seed, t=T):
    """A synthetic clip as the raw per-frame scan sequence [x y z RCS v_r]:
    scan 0 = the first record's pc2 side, scan t+1 = record t's pc1 side."""
    recs = synthetic_clip(seed, t, n_max=N, g_max=K, n_static=60,
                          n_objects=3)
    s = stack_frames(recs)
    scans = [np.concatenate([s.pc2[0][s.mask2[0]],
                             s.ft2[0][s.mask2[0]]], axis=1)]
    for i in range(t):
        scans.append(np.concatenate([s.pc1[i][s.mask1[i]],
                                     s.ft1[i][s.mask1[i]]], axis=1))
    return scans, s


class TestLifecycle:
    def test_first_scan_none_then_outputs(self, model_and_vars):
        model, variables = model_and_vars
        svc = RadarTracker(model, variables, n_max=N, max_streams=2)
        sid = svc.open_stream()
        scans, _ = clip_scans(0)
        assert svc.track(sid, scans[0]) is None
        out = svc.track(sid, scans[1])
        assert out.labels.shape == (N,)
        assert out.point_track_id.shape == (N,)
        assert out.track_id.shape == (K,)
        assert out.flow.shape == (N, 3)
        assert out.n_points == scans[1].shape[0]
        assert out.n_objects >= 0
        # per-point ids are the slot ids of their cluster
        clustered = out.labels >= 0
        assert np.array_equal(out.point_track_id[clustered],
                              out.track_id[out.labels[clustered]])
        assert np.all(out.point_track_id[~clustered] == -1)

    def test_errors(self, model_and_vars):
        model, variables = model_and_vars
        svc = RadarTracker(model, variables, n_max=N, max_streams=1)
        with pytest.raises(KeyError):
            svc.submit(0, np.zeros((4, 5)))
        sid = svc.open_stream()
        with pytest.raises(RuntimeError):
            svc.open_stream()                    # slots exhausted
        with pytest.raises(ValueError):
            svc.submit(sid, np.zeros((4, 3)))    # too few columns
        svc.submit(sid, np.zeros((4, 5), np.float32))
        svc.submit(sid, np.zeros((4, 5), np.float32))
        with pytest.raises(RuntimeError):
            svc.submit(sid, np.zeros((4, 5), np.float32))  # double stage
        svc.close_stream(sid)
        with pytest.raises(KeyError):
            svc.submit(sid, np.zeros((4, 5), np.float32))
        assert svc.open_stream() == sid          # slot reusable

    def test_step_with_nothing_staged(self, model_and_vars):
        model, variables = model_and_vars
        svc = RadarTracker(model, variables, n_max=N, max_streams=1)
        assert svc.step() == {}

    def test_over_budget_scan_truncates(self, model_and_vars):
        model, variables = model_and_vars
        svc = RadarTracker(model, variables, n_max=N, max_streams=1)
        sid = svc.open_stream()
        big = np.random.RandomState(0).randn(N + 40, 5).astype(np.float32)
        svc.submit(sid, big)
        out = svc.track(sid, big)
        assert out.n_points == N


class TestEquivalenceVsEvalPath:
    def test_serving_matches_scan_eval(self, model_and_vars):
        """The service on raw scans == the offline scan-fused eval on the
        equivalent FrameBatch records (labels/ids/conf/cls bit-exact:
        GT tensors feed only metrics, not the forward)."""
        from ratrack_tpu.train.step import make_scan_eval_step
        model, variables = model_and_vars
        scans, s = clip_scans(1)

        frames = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None], s)
        frames = FrameBatch(*frames)
        ts = jax.tree_util.tree_map(lambda x: x[None], init_state(K))
        _, ref = make_scan_eval_step(model)(variables, ts, frames)

        svc = RadarTracker(model, variables, n_max=N, max_streams=3)
        sid = svc.open_stream()
        assert svc.track(sid, scans[0]) is None
        for t, scan in enumerate(scans[1:]):
            out = svc.track(sid, scan)
            assert np.array_equal(out.labels, np.asarray(ref["labels"][0, t]))
            assert np.array_equal(out.track_id,
                                  np.asarray(ref["track_id"][0, t]))
            assert np.allclose(out.conf, np.asarray(ref["conf"][0, t]),
                               atol=1e-5)
            warp = np.asarray(ref["warp"][0, t])
            pc1 = np.zeros((N, 3), np.float32)
            pc1[:out.n_points] = scan[:, :3]
            # the service dispatches the B=1 bucket here while the
            # reference path compiled its own B=1 program: XLA still
            # fuses the two programs differently, so backbone floats
            # carry compilation-level rounding freedom (discrete
            # labels/ids above must match exactly)
            assert np.allclose(out.flow, warp - pc1, atol=1e-4)

    def test_multi_stream_isolation(self, model_and_vars):
        """Two interleaved streams == each stream run alone."""
        model, variables = model_and_vars
        scans_a, _ = clip_scans(2)
        scans_b, _ = clip_scans(3)

        solo = {}
        for name, scans in (("a", scans_a), ("b", scans_b)):
            svc = RadarTracker(model, variables, n_max=N, max_streams=4)
            sid = svc.open_stream()
            outs = [svc.track(sid, sc) for sc in scans]
            solo[name] = [o for o in outs if o is not None]

        svc = RadarTracker(model, variables, n_max=N, max_streams=4)
        sa, sb = svc.open_stream(), svc.open_stream()
        joint_a, joint_b = [], []
        for sc_a, sc_b in zip(scans_a, scans_b):
            ra = svc.submit(sa, sc_a)
            rb = svc.submit(sb, sc_b)
            if ra or rb:
                res = svc.step()
                if sa in res:
                    joint_a.append(res[sa])
                if sb in res:
                    joint_b.append(res[sb])
        for solo_outs, joint_outs in ((solo["a"], joint_a),
                                      (solo["b"], joint_b)):
            assert len(solo_outs) == len(joint_outs)
            for o1, o2 in zip(solo_outs, joint_outs):
                # solo runs dispatch the B=1 bucket, joint runs B=2 —
                # different XLA programs, so floats carry
                # compilation-level rounding freedom; discrete
                # labels/ids must still match exactly
                assert np.array_equal(o1.labels, o2.labels)
                assert np.array_equal(o1.track_id, o2.track_id)
                assert np.allclose(o1.conf, o2.conf, atol=1e-5)
                assert np.allclose(o1.flow, o2.flow, atol=1e-4)

    def test_inactive_stream_state_frozen(self, model_and_vars):
        """A step for stream 0 must not touch stream 1's carried state."""
        model, variables = model_and_vars
        scans, _ = clip_scans(4)
        svc = RadarTracker(model, variables, n_max=N, max_streams=2)
        s0, s1 = svc.open_stream(), svc.open_stream()
        svc.track(s1, scans[0])
        svc.track(s1, scans[1])                   # s1 now has real state
        before = jax.tree_util.tree_map(
            lambda x: np.asarray(x)[s1].copy(), svc._states)
        svc.track(s0, scans[0])
        svc.track(s0, scans[1])                   # dispatch without s1
        after = jax.tree_util.tree_map(
            lambda x: np.asarray(x)[s1], svc._states)
        for a, b in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(after)):
            assert np.array_equal(a, b)

    def test_reopened_stream_resets_but_ids_stay_unique(self,
                                                        model_and_vars):
        model, variables = model_and_vars
        scans, _ = clip_scans(5)
        svc = RadarTracker(model, variables, n_max=N, max_streams=1)
        sid = svc.open_stream()
        svc.track(sid, scans[0])
        out1 = svc.track(sid, scans[1])
        used = set(out1.track_id[out1.track_id >= 0].tolist())
        svc.close_stream(sid)
        sid2 = svc.open_stream()
        svc.track(sid2, scans[0])
        out2 = svc.track(sid2, scans[1])
        fresh = out2.track_id[out2.track_id >= 0]
        # same clustering (same data), brand-new ids (next_id carries
        # across resets — reference keeps max_id global, track4d.py:45)
        assert np.array_equal(out1.labels, out2.labels)
        assert not (set(fresh.tolist()) & used)


class TestConcurrency:
    def test_threaded_submitters_single_stepper(self, model_and_vars):
        """The documented multi-producer pattern: N threads submit to
        their own streams; one coordinator steps. The lock must keep
        staging consistent and results complete."""
        import threading
        model, variables = model_and_vars
        svc = RadarTracker(model, variables, n_max=N, max_streams=4)
        sids = [svc.open_stream() for _ in range(4)]
        scans = {sid: clip_scans(10 + i)[0] for i, sid in enumerate(sids)}
        got = {sid: [] for sid in sids}

        for t in range(T + 1):
            ready = []

            def submit_one(sid):
                if svc.submit(sid, scans[sid][t]):
                    ready.append(sid)

            threads = [threading.Thread(target=submit_one, args=(sid,))
                       for sid in sids]
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            if ready:
                res = svc.step()
                assert set(res) == set(ready)
                for sid in ready:
                    got[sid].append(res[sid])

        for sid in sids:
            assert len(got[sid]) == T
            for out in got[sid]:
                assert out.labels.shape == (N,)

    def test_solo_equals_threaded(self, model_and_vars):
        """Thread-staged lockstep == solo run (state isolation under the
        coordinator pattern)."""
        import threading
        model, variables = model_and_vars
        scans, _ = clip_scans(11)
        svc1 = RadarTracker(model, variables, n_max=N, max_streams=2)
        s1 = svc1.open_stream()
        solo = [o for o in (svc1.track(s1, sc) for sc in scans) if o]

        svc2 = RadarTracker(model, variables, n_max=N, max_streams=2)
        s2 = svc2.open_stream()
        outs = []
        for sc in scans:
            ready = []
            th = threading.Thread(
                target=lambda: ready.append(svc2.submit(s2, sc)))
            th.start(); th.join()
            if ready[0]:
                outs.append(svc2.step()[s2])
        assert len(solo) == len(outs)
        for a, b in zip(solo, outs):
            assert np.array_equal(a.labels, b.labels)
            assert np.array_equal(a.track_id, b.track_id)


class TestBucketedDispatch:
    def test_bucket_sizes(self, model_and_vars):
        """A lone staged stream dispatches the B=1 program; more streams
        pick the smallest covering power-of-two bucket."""
        model, variables = model_and_vars
        svc = RadarTracker(model, variables, n_max=N, max_streams=8)
        sids = [svc.open_stream() for _ in range(3)]
        scans = [clip_scans(10 + i)[0] for i in range(3)]
        # warm each stream (first scan -> no pair)
        for sid, sc in zip(sids, scans):
            svc.submit(sid, sc[0])
        svc.submit(sids[0], scans[0][1])
        svc.step()
        assert svc.last_bucket == 1
        svc.submit(sids[0], scans[0][2])
        svc.submit(sids[1], scans[1][1])
        svc.step()
        assert svc.last_bucket == 2
        for i, sid in enumerate(sids):
            svc.submit(sid, scans[i][3 if i == 0 else 2])
        svc.step()
        assert svc.last_bucket == 4
