"""Hand-computed oracles for the sAMOTA/AMOTA/CLEAR-MOT scorer.

The reference's published table comes from an UNRELEASED modified-AB3DMOT
evaluation (README.md:174-176); `eval/mot_metrics.py` is an
interpretation of that protocol (see PARITY.md "MOT protocol
interpretation"). These tests pin every interpreted choice against
values derived by hand:

Scenario (all IoUs exact by construction — point_set_iou is
shared-point-count based, and predictions reuse exact GT coordinates):

  GT (both frames): A = 4 points, B = 4 distinct points.
  Frame 1 preds: a1 = (conf .9, id 1, all of A)          -> IoU(A) = 1
                 f1 = (conf .7, id 3, 4 far points)      -> IoU 0 (FP)
                 b1 = (conf .6, id 2, 2 of B + 2 far)    -> IoU(B) = 1/3
  Frame 2 preds: a2 = (conf .9, id 1, all of A)          (B missed)

Operating points (distinct confs 0.9 / 0.7 / 0.6, n_gt = 4):
  thr .9: tp=2 fp=0 fn=2          recall .50  MOTA .50  MOTP 1
  thr .7: tp=2 fp=1 fn=2          recall .50  MOTA .25
  thr .6: tp=3 fp=1 fn=1          recall .75  MOTA .50  MOTP 7/9

Recall sweep (n_recall=40, targets r = k/40): the op chosen for target r
is the HIGHEST-confidence op with recall >= r, so k=1..20 -> thr .9,
k=21..30 -> thr .6, k=31..40 -> none (skipped):
  AMOTA  = (20*.50 + 10*.50)/40                   = 0.375
  AMOTP  = (20*1 + 10*(7/9))/40                   = 0.694444...
  sAMOTA: sMOTA_r = clip(1 - (FP+FN+IDSW - (1-r)*4)/(4r));
    thr .9 (err 2): 1 - (4r-2)/4r = 0.5/r  -> clipped to 1 for r <= .5
    thr .6 (err 2): 0.5/r, r in (.5,.75]   -> sum_{k=21..30} 20/k
  sAMOTA = (20 + sum_{k=21..30} 20/k)/40          = 0.702033...
"""

import numpy as np
import pytest

from ratrack_tpu.eval.mot_metrics import (clear_mot, integrated_mot,
                                          point_set_iou)


def _pts(seed, n):
    return np.random.RandomState(seed).randn(n, 3).astype(np.float32) * 10


A = _pts(1, 4)
B = _pts(2, 4) + 100.0
FAR1 = _pts(3, 4) + 500.0
FAR2 = _pts(4, 2) + 800.0

GT_FRAMES = [{10: A, 20: B}, {10: A, 20: B}]
PRED_FRAMES = [
    [(0.9, 1, A.copy()),
     (0.7, 3, FAR1.copy()),
     (0.6, 2, np.concatenate([B[:2], FAR2]))],
    [(0.9, 1, A.copy())],
]


class TestHandComputedClearMot:
    def test_point_set_iou_values(self):
        assert point_set_iou(A, A) == 1.0
        assert point_set_iou(B, np.concatenate([B[:2], FAR2])) \
            == pytest.approx(1.0 / 3.0)
        assert point_set_iou(A, FAR1) == 0.0

    def test_base_threshold(self):
        m = clear_mot(GT_FRAMES, PRED_FRAMES)
        assert (m["tp"], m["fp"], m["fn"], m["idsw"]) == (3, 1, 1, 0)
        assert m["mota"] == pytest.approx(0.50)
        assert m["moda"] == pytest.approx(0.50)
        assert m["motp"] == pytest.approx(7.0 / 9.0)
        assert m["recall"] == pytest.approx(0.75)
        assert m["precision"] == pytest.approx(0.75)
        # A tracked 2/2 frames (MT at >= 0.8), B 1/2 (neither MT nor ML)
        assert m["mt"] == pytest.approx(0.5)
        assert m["ml"] == pytest.approx(0.0)

    @pytest.mark.parametrize("thr,expect", [
        (0.9, (2, 0, 2, 0.50, 1.0)),
        (0.7, (2, 1, 2, 0.25, 1.0)),
        (0.6, (3, 1, 1, 0.50, 7.0 / 9.0)),
    ])
    def test_forced_thresholds(self, thr, expect):
        tp, fp, fn, mota, motp = expect
        m = clear_mot(GT_FRAMES, PRED_FRAMES, conf_thres=thr)
        assert (m["tp"], m["fp"], m["fn"]) == (tp, fp, fn)
        assert m["mota"] == pytest.approx(mota)
        assert m["motp"] == pytest.approx(motp)

    def test_id_switch_counted(self):
        preds = [
            [(0.9, 1, A.copy())],
            [(0.9, 7, A.copy())],       # same object, new id
        ]
        gts = [{10: A}, {10: A}]
        m = clear_mot(gts, preds)
        assert m["idsw"] == 1
        assert m["mota"] == pytest.approx(1.0 - 1.0 / 2.0)


class TestHandComputedIntegrated:
    def test_amota_amotp_samota(self):
        m = integrated_mot(GT_FRAMES, PRED_FRAMES, n_recall=40)
        assert m["amota"] == pytest.approx(0.375)
        assert m["amotp"] == pytest.approx((20.0 + 10.0 * 7.0 / 9.0) / 40.0)
        samota_expect = (20.0 + sum(20.0 / k for k in range(21, 31))) / 40.0
        assert m["samota"] == pytest.approx(samota_expect)

    def test_recall_targets_skip_unreachable(self):
        # with only the high-conf detection, recall never exceeds 0.5:
        # targets above it contribute nothing
        preds = [[(0.9, 1, A.copy())], [(0.9, 1, A.copy())]]
        m = integrated_mot(GT_FRAMES, preds, n_recall=40)
        # 20 reachable targets, each op: tp=2 fp=0 fn=2 -> mota .5,
        # smota = clip(0.5/r) = 1
        assert m["amota"] == pytest.approx(20 * 0.5 / 40.0)
        assert m["samota"] == pytest.approx(20 * 1.0 / 40.0)
        assert m["amotp"] == pytest.approx(20 * 1.0 / 40.0)

    def test_max_thresholds_cap_keeps_extremes(self):
        # >256 distinct confidences: the rank-uniform cap must keep the
        # sweep covering the full recall range (first + last thresholds)
        rng = np.random.RandomState(0)
        pts = [_pts(100 + i, 3) for i in range(6)]
        gts, preds = [], []
        for f in range(100):
            gts.append({i: pts[i] for i in range(6)})
            preds.append([(float(rng.rand()), i, pts[i].copy())
                          for i in range(6)])
        m = integrated_mot(gts, preds, max_thresholds=256)
        # perfect detections at every threshold: recall 1 reachable, so
        # the scale-adjusted sAMOTA saturates; plain AMOTA averages
        # MOTA(r) = r over the 40 recall targets = ~0.5125 by definition
        # (this is why published AMOTA values sit far below sAMOTA)
        assert m["recall"] == 1.0
        assert m["samota"] == pytest.approx(1.0)
        assert m["amotp"] == pytest.approx(1.0)
        targets = np.mean([(k + 1) / 40.0 for k in range(40)])
        assert m["amota"] == pytest.approx(targets, abs=0.02)


class TestMatchingSensitivity:
    """AB3DMOT's own association is hungarian (matching.py:51-113, vod
    preset model.py:82-84); the scorer defaults to greedy. This case is
    built so the two disagree — documenting the protocol sensitivity."""

    def _frames(self):
        g1 = _pts(11, 20)
        g2 = _pts(12, 20) + 200.0
        # p1 overlaps both GTs; p2 only g1, with lower IoU than (g1, p1)
        p1 = np.concatenate([g1[:16], g2[:8]])       # iou g1: 16/44-16=4/7
        p2 = g1[:10]                                 # iou g1: 10/20 = .5
        gts = [{1: g1, 2: g2}]
        preds = [[(0.9, 1, p1), (0.8, 2, p2)]]
        return gts, preds

    def test_greedy_vs_hungarian_divergence(self):
        gts, preds = self._frames()
        greedy = clear_mot(gts, preds, iou_thres=0.1, match="greedy")
        hung = clear_mot(gts, preds, iou_thres=0.1, match="hungarian")
        # greedy locks (g1, p1) first and strands g2 and p2
        assert (greedy["tp"], greedy["fp"], greedy["fn"]) == (1, 1, 1)
        # hungarian maximizes total IoU: (g1, p2) + (g2, p1)
        assert (hung["tp"], hung["fp"], hung["fn"]) == (2, 0, 0)
        assert hung["mota"] > greedy["mota"]

    def test_methods_agree_on_unambiguous_data(self):
        m_g = integrated_mot(GT_FRAMES, PRED_FRAMES, match="greedy")
        m_h = integrated_mot(GT_FRAMES, PRED_FRAMES, match="hungarian")
        for k in ("samota", "amota", "amotp", "mota", "motp", "idsw"):
            assert m_g[k] == pytest.approx(m_h[k]), k

    def test_unknown_method_raises(self):
        with pytest.raises(ValueError):
            clear_mot(GT_FRAMES, PRED_FRAMES, match="munkres-typo")
