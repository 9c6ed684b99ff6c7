"""Execute the vendored AB3DMOT tracker as an oracle for eval/kalman.py.

Technique as in tests/test_detection_ap.py: load the reference's pure-
Python tracker (`/root/reference/src/AB3DMOT_libs/model.py:459-542`,
`kalman_filter.py:13-64`, `matching.py:51-113`) with small stubs for its
unused heavy deps (numba, cv2-backed vis, the vod loaders) and a
FAITHFUL filterpy.kalman.KalmanFilter stand-in (same predict and
Joseph-form update, same dot orders), then feed the vendored tracker
and ratrack_tpu.eval.kalman.KalmanTracker identical constructed
detection sequences — births, misses beyond max_age, ID churn, near-
threshold pairs, empty frames — and assert per-frame ID + state parity.

Tolerance: 1e-8 on states (not bitwise): the only difference is matmul
association order inside the KF update (H@(P@Hᵀ) vs (H@P)@Hᵀ), a
float64 rounding-class delta.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from ratrack_tpu.eval.kalman import BoxDet, KalmanTracker

REF_DIR = "/root/reference/src/AB3DMOT_libs"


class _FilterpyKF:
    """Faithful filterpy.kalman.KalmanFilter subset (predict/update).

    Mirrors filterpy's attribute defaults and exact dot orders,
    including the Joseph-form covariance update."""

    def __init__(self, dim_x, dim_z):
        self.dim_x, self.dim_z = dim_x, dim_z
        self.x = np.zeros((dim_x, 1))
        self.P = np.eye(dim_x)
        self.Q = np.eye(dim_x)
        self.F = np.eye(dim_x)
        self.H = np.zeros((dim_z, dim_x))
        self.R = np.eye(dim_z)
        self._I = np.eye(dim_x)

    def predict(self):
        self.x = np.dot(self.F, self.x)
        self.P = np.dot(np.dot(self.F, self.P), self.F.T) + self.Q

    def update(self, z):
        z = np.asarray(z, dtype=float).reshape(self.dim_z, 1)
        y = z - np.dot(self.H, self.x)
        pht = np.dot(self.P, self.H.T)
        s = np.dot(self.H, pht) + self.R
        k = np.dot(pht, np.linalg.inv(s))
        self.x = self.x + np.dot(k, y)
        i_kh = self._I - np.dot(k, self.H)
        self.P = (np.dot(np.dot(i_kh, self.P), i_kh.T)
                  + np.dot(np.dot(k, self.R), k.T))


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_model():
    if not os.path.isdir(REF_DIR):
        pytest.skip("reference AB3DMOT absent")
    if "numba" not in sys.modules:
        def _jit(*args, **kwargs):
            if len(args) == 1 and callable(args[0]) and not kwargs:
                return args[0]
            return lambda fn: fn
        _stub("numba", jit=_jit, float32=np.float32)
    _stub("filterpy")
    _stub("filterpy.kalman", KalmanFilter=_FilterpyKF,
          UnscentedKalmanFilter=object, MerweScaledSigmaPoints=object)
    _stub("xinshuo_miscellaneous",
          print_log=lambda *a, **k: None)
    _stub("xinshuo_io", mkdir_if_missing=lambda *a, **k: None,
          fileparts=lambda p: ("", "", ""))
    _stub("vod", FrameDataLoader=object, FrameTransformMatrix=object,
          KittiLocations=object)
    pkg = types.ModuleType("AB3DMOT_libs")
    pkg.__path__ = [REF_DIR]
    sys.modules["AB3DMOT_libs"] = pkg
    _load("AB3DMOT_libs.kitti_oxts", os.path.join(REF_DIR,
                                                  "kitti_oxts.py"))
    _load("AB3DMOT_libs.box", os.path.join(REF_DIR, "box.py"))
    _load("AB3DMOT_libs.dist_metrics",
          os.path.join(REF_DIR, "dist_metrics.py"))
    _load("AB3DMOT_libs.matching", os.path.join(REF_DIR, "matching.py"))
    _load("AB3DMOT_libs.kalman_filter",
          os.path.join(REF_DIR, "kalman_filter.py"))
    _stub("AB3DMOT_libs.vis", vis_obj=lambda *a, **k: None,
          draw_box3d_image=lambda *a, **k: None)
    return _load("AB3DMOT_libs.model", os.path.join(REF_DIR, "model.py"))


def _cfg():
    ns = types.SimpleNamespace()
    ns.dataset = "vod"
    ns.det_name = ""
    ns.ego_com = 0
    ns.vis = False
    ns.affi_pro = False
    return ns


def _ref_track_frames(ref_model, frames_dets):
    """Run the vendored AB3DMOT over det sequences → per-frame
    {id: [x, y, z, theta, l, w, h]}."""
    tracker = ref_model.AB3DMOT(_cfg(), cat="ALL")
    out = []
    for fi, dets in enumerate(frames_dets):
        arr = (np.array([[d.lwh[2], d.lwh[1], d.lwh[0],
                          d.xyz[0], d.xyz[1], d.xyz[2], d.yaw]
                         for d in dets], dtype=float)
               if dets else np.empty((0, 7)))
        info = np.zeros((len(dets), 7))
        results, _ = tracker.track({"dets": arr, "info": info}, fi,
                                   "seq")
        rows = results[0]
        frame = {}
        for r in rows:
            # row = [h, w, l, x, y, z, theta, id, info...]
            frame[int(r[7])] = np.array(
                [r[3], r[4], r[5], r[6], r[2], r[1], r[0]])
        out.append(frame)
    return out


def _our_track_frames(frames_dets, **kw):
    tracker = KalmanTracker(**kw)
    out = []
    for dets in frames_dets:
        frame = {}
        for tid, det, conf in tracker.track(dets):
            frame[tid] = np.concatenate(
                [det.xyz, [det.yaw], det.lwh])
        out.append(frame)
    return out


def _assert_parity(ours, refs):
    assert len(ours) == len(refs)
    for fi, (a, b) in enumerate(zip(ours, refs)):
        assert set(a) == set(b), \
            f"frame {fi}: ids {sorted(a)} vs oracle {sorted(b)}"
        for tid in a:
            np.testing.assert_allclose(
                a[tid], b[tid], atol=1e-8,
                err_msg=f"frame {fi} track {tid}")


def _walk_sequences(seed, n_frames=30, churn=True):
    """Objects walking with noise; staggered births, misses, deaths."""
    rng = np.random.RandomState(seed)
    objs = []
    for i in range(6):
        objs.append(dict(
            born=rng.randint(0, n_frames // 2),
            die=rng.randint(n_frames // 2, n_frames + 5),
            pos=rng.randn(3) * 10,
            vel=rng.randn(3) * 0.3,
            yaw=rng.uniform(-np.pi, np.pi),
            lwh=np.abs(rng.randn(3)) * 0.5 + np.array([3.0, 1.6, 1.5]),
            dropout=rng.rand() * 0.3 if churn else 0.0))
    frames = []
    for f in range(n_frames):
        dets = []
        for o in objs:
            if not (o["born"] <= f < o["die"]):
                continue
            if churn and rng.rand() < o["dropout"]:
                continue                      # missed detection
            p = o["pos"] + o["vel"] * f + rng.randn(3) * 0.05
            dets.append(BoxDet(p, float(o["yaw"] + rng.randn() * 0.05),
                               o["lwh"].copy()))
        rng.shuffle(dets)
        frames.append(dets)
    return frames


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lifecycle_parity_random_walks(ref_model, seed):
    frames = _walk_sequences(seed)
    _assert_parity(_our_track_frames(frames),
                   _ref_track_frames(ref_model, frames))


def test_parity_near_threshold_and_empty_frames(ref_model):
    """Pairs hovering at the 2 m gate + frames with no detections."""
    rng = np.random.RandomState(7)
    base = np.array([5.0, 0.0, 5.0])
    frames = []
    for f in range(20):
        dets = []
        if f not in (6, 7, 13):               # empty frames
            # object A drifts ~2 m per frame: right at the match gate
            dets.append(BoxDet(base + np.array([1.95, 0, 0]) * f
                               + rng.randn(3) * 0.01, 0.3,
                               np.array([3.0, 1.5, 1.4])))
            # object B stationary near A's corridor
            dets.append(BoxDet(base + np.array([0.0, 0.0, 2.1]),
                               -0.2, np.array([3.2, 1.6, 1.5])))
        frames.append(dets)
    _assert_parity(_our_track_frames(frames),
                   _ref_track_frames(ref_model, frames))


def test_parity_orientation_flips(ref_model):
    """Detections with ~π yaw flips exercise the acute-angle
    correction (model.py:180-199)."""
    frames = []
    for f in range(12):
        yaw = 0.1 if f % 2 == 0 else 0.1 + np.pi   # flipping heading
        frames.append([BoxDet(np.array([1.0 * f, 0.0, 3.0]), yaw,
                              np.array([3.0, 1.5, 1.4]))])
    _assert_parity(_our_track_frames(frames),
                   _ref_track_frames(ref_model, frames))


def test_greedy_matching_parity(ref_model):
    """Our greedy pairing == the vendored greedy_matching
    (matching.py:24-50) on random cost matrices."""
    matching = sys.modules["AB3DMOT_libs.matching"]
    rng = np.random.RandomState(3)
    for _ in range(20):
        nd, nt = rng.randint(1, 7), rng.randint(1, 7)
        cost = rng.rand(nd, nt)
        want = {tuple(p) for p in matching.greedy_matching(cost)}
        got = set(KalmanTracker._greedy_pairs(cost))
        assert got == want


# ---------------------------------------------------------------------------
# ego motion compensation (model.py:228-246 ego_from_vod, :489-492 gate)
# ---------------------------------------------------------------------------

def _make_ego_world(n_frames, yaw_rate=0.06, speed=3.0):
    """Static world objects seen from a fast-moving, turning ego.

    Returns (frames of camera-coordinate BoxDets, poses dict frame →
    t_odom_camera). The ego advances `speed` m/frame and turns
    `yaw_rate` rad/frame, so uncompensated frame-to-frame apparent
    motion of a static object is ~3 m — beyond the 2 m match gate —
    while compensated motion is ~0.
    """
    objs = [np.array([6.0, 0.0, 8.0]), np.array([-4.0, 1.0, 12.0]),
            np.array([10.0, -1.0, 20.0])]
    lwh = np.array([3.0, 1.6, 1.5])
    frames, poses = [], {}
    for f in range(n_frames + 2):           # +2: ego_from_vod reads f+1
        th = yaw_rate * f
        rot = np.array([[np.cos(th), 0, np.sin(th)],
                        [0, 1, 0],
                        [-np.sin(th), 0, np.cos(th)]])
        pos = np.array([speed * f, 0.0, 0.5 * speed * f])
        t = np.eye(4)
        t[:3, :3] = rot
        t[:3, 3] = pos
        poses[f] = t                        # camera f → odom
        if f < n_frames:
            inv = np.linalg.inv(t)
            dets = [BoxDet((inv[:3, :3] @ w + inv[:3, 3]), 0.2,
                           lwh.copy()) for w in objs]
            frames.append(dets)
    return frames, poses


def _ref_track_frames_ego(ref_model, frames_dets, poses):
    """Vendored tracker with ego_com=1 and the vod loaders stubbed to
    serve constructed per-frame t_odom_camera poses."""
    ref_model.KittiLocations = lambda **kw: None
    ref_model.FrameDataLoader = \
        lambda kitti_locations, frame_number: frame_number
    ref_model.FrameTransformMatrix = lambda fd: types.SimpleNamespace(
        t_odom_camera=poses[int(fd)])
    # get_ego_traj's result is unpacked then unused (model.py:233-238)
    sys.modules["AB3DMOT_libs.kitti_oxts"].get_ego_traj = \
        lambda *a, **k: (None, None, None, None)
    cfg = _cfg()
    cfg.ego_com = 1
    tracker = ref_model.AB3DMOT(cfg, cat="ALL", oxts=object())
    out = []
    for fi, dets in enumerate(frames_dets):
        arr = (np.array([[d.lwh[2], d.lwh[1], d.lwh[0],
                          d.xyz[0], d.xyz[1], d.xyz[2], d.yaw]
                         for d in dets], dtype=float)
               if dets else np.empty((0, 7)))
        info = np.zeros((len(dets), 7))
        results, _ = tracker.track({"dets": arr, "info": info}, fi,
                                   "seq")
        frame = {}
        for r in results[0]:
            frame[int(r[7])] = np.array(
                [r[3], r[4], r[5], r[6], r[2], r[1], r[0]])
        out.append(frame)
    return out


def _our_track_frames_ego(frames_dets, egos, **kw):
    tracker = KalmanTracker(**kw)
    out = []
    for fi, dets in enumerate(frames_dets):
        frame = {}
        for tid, det, conf in tracker.track(dets, ego_motion=egos[fi]):
            frame[tid] = np.concatenate([det.xyz, [det.yaw], det.lwh])
        out.append(frame)
    return out


def test_ego_compensation_parity_and_outcome(ref_model):
    """Compensation parity vs the vendored ego path, on a sequence where
    it CHANGES the association outcome (fast-turning ego, static world).

    The ego transform fed to KalmanTracker.track mirrors the vendored
    indexing exactly: at frame f>0, T = inv(odom_cam(f)) · odom_cam(f+1)
    and the track position becomes inv(T)·p (model.py:221-223, 238-246).
    """
    frames, poses = _make_ego_world(14)
    egos = [None] + [np.linalg.inv(poses[f]) @ poses[f + 1]
                     for f in range(1, len(frames))]
    ours = _our_track_frames_ego(frames, egos)
    refs = _ref_track_frames_ego(ref_model, frames, poses)
    _assert_parity(ours, refs)

    # outcome check: without compensation the ~3 m/frame apparent motion
    # exceeds the 2 m gate, so tracks churn and (with min_hits=4) nothing
    # ever confirms; with compensation all three objects track steadily.
    plain = _our_track_frames(frames)
    ids_with = {tid for fr in ours for tid in fr}
    ids_without = {tid for fr in plain for tid in fr}
    assert len(ids_with) == 3
    assert sum(len(fr) for fr in plain) < sum(len(fr) for fr in ours)
    assert ids_without != ids_with or not ids_without
