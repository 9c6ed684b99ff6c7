"""Kalman-filter multi-object tracker over 3D box detections.

Re-implementation of the vendored AB3DMOT capability the reference plans
to integrate for its offline metrics (SURVEY.md §2.4, L7;
src/AB3DMOT_libs/model.py:17-542): a constant-velocity Kalman tracker with
hungarian data association and min_hits/max_age lifecycle, configured for
VoD as in the vendored code (model.py:82-84: hungarian matching, 3D
centroid distance, threshold 2 m, min_hits 4, max_age 8).

Written from the AB3DMOT paper's algorithm (10-state CV filter); the code
is an independent implementation.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment

# state: [x, y, z, yaw, l, w, h, vx, vy, vz]
_DIM_X, _DIM_Z = 10, 7


@dataclasses.dataclass
class BoxDet:
    """One 3D box detection: center xyz, yaw, size lwh, confidence."""
    xyz: np.ndarray
    yaw: float
    lwh: np.ndarray
    conf: float = 1.0

    @property
    def z(self) -> np.ndarray:
        return np.concatenate([self.xyz, [self.yaw], self.lwh])


class _Track:
    def __init__(self, det: BoxDet, track_id: int):
        self.x = np.zeros(_DIM_X)
        self.x[:_DIM_Z] = det.z
        self.P = np.eye(_DIM_X) * 10.0
        self.P[7:, 7:] *= 1000.0           # uncertain initial velocity
        self.hits = 1
        self.misses = 0
        self.age = 1
        self.conf = det.conf
        self.id = track_id

    def predict(self) -> None:
        f = np.eye(_DIM_X)
        f[0, 7] = f[1, 8] = f[2, 9] = 1.0
        q = np.eye(_DIM_X) * 0.01
        self.x = f @ self.x
        self.P = f @ self.P @ f.T + q
        self.age += 1

    def update(self, det: BoxDet) -> None:
        h = np.zeros((_DIM_Z, _DIM_X))
        h[:, :_DIM_Z] = np.eye(_DIM_Z)
        r = np.eye(_DIM_Z) * 0.1
        z = det.z.copy()
        # yaw wrap-around correction (AB3DMOT orientation correction)
        dy = z[3] - self.x[3]
        while dy > np.pi:
            z[3] -= 2 * np.pi
            dy = z[3] - self.x[3]
        while dy < -np.pi:
            z[3] += 2 * np.pi
            dy = z[3] - self.x[3]
        y = z - h @ self.x
        s = h @ self.P @ h.T + r
        k = self.P @ h.T @ np.linalg.inv(s)
        self.x = self.x + k @ y
        self.P = (np.eye(_DIM_X) - k @ h) @ self.P
        self.hits += 1
        self.misses = 0
        self.conf = det.conf


class KalmanTracker:
    """Frame-by-frame tracker: track(dets) → [(id, BoxDet-state, conf)]."""

    def __init__(self, match_dist: float = 2.0, min_hits: int = 4,
                 max_age: int = 8):
        self.match_dist = match_dist
        self.min_hits = min_hits
        self.max_age = max_age
        self.tracks: List[_Track] = []
        self.frame = 0
        self._next_id = 0                  # per-tracker id counter (no
                                           # cross-instance leakage)

    def track(self, dets: List[BoxDet],
              ego_motion: Optional[np.ndarray] = None
              ) -> List[Tuple[int, BoxDet, float]]:
        self.frame += 1
        for t in self.tracks:
            if ego_motion is not None:
                # move track state into the current ego frame
                hom = np.concatenate([t.x[:3], [1.0]])
                t.x[:3] = (np.linalg.inv(ego_motion) @ hom)[:3]
            t.predict()

        # hungarian association on 3D centroid distance (vod params)
        matches, un_t, un_d = self._associate(dets)
        for ti, di in matches:
            self.tracks[ti].update(dets[di])
        for ti in un_t:
            self.tracks[ti].misses += 1
        for di in un_d:
            self.tracks.append(_Track(dets[di], self._next_id))
            self._next_id += 1
        self.tracks = [t for t in self.tracks if t.misses <= self.max_age]

        out = []
        for t in self.tracks:
            if t.hits >= self.min_hits or self.frame <= self.min_hits:
                if t.misses == 0:
                    det = BoxDet(t.x[:3].copy(), float(t.x[3]),
                                 t.x[4:7].copy(), t.conf)
                    out.append((t.id, det, t.conf))
        return out

    def _associate(self, dets: List[BoxDet]):
        if not self.tracks or not dets:
            return [], list(range(len(self.tracks))), list(range(len(dets)))
        cost = np.zeros((len(self.tracks), len(dets)))
        for i, t in enumerate(self.tracks):
            for j, d in enumerate(dets):
                cost[i, j] = np.linalg.norm(t.x[:3] - d.xyz)
        rows, cols = linear_sum_assignment(cost)
        matches, un_t, un_d = [], [], []
        matched_t, matched_d = set(), set()
        for i, j in zip(rows, cols):
            if cost[i, j] <= self.match_dist:
                matches.append((i, j))
                matched_t.add(i)
                matched_d.add(j)
        un_t = [i for i in range(len(self.tracks)) if i not in matched_t]
        un_d = [j for j in range(len(dets)) if j not in matched_d]
        return matches, un_t, un_d
