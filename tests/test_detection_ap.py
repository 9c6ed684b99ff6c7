"""Tests for the VoD KITTI-style detection AP evaluation.

Highest-value check: bit parity against the REFERENCE evaluator itself —
the reference's numba-decorated numpy code runs fine in pure Python with
a 2-symbol numba stub, so tests execute
/root/reference/src/vod/evaluation/kitti_official_evaluate.py directly
as the oracle on randomized annotations (reading the reference is study,
not copying; none of its code ships in ratrack_tpu/).

Plus analytic oracles for the geometric primitives and the documented
protocol degeneracies (11-point AP needs >= 41 matched GT to fill the
recall grid).
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from ratrack_tpu.eval.detection_ap import (clean_frame, compute_statistics,
                                           eval_class, get_thresholds,
                                           image_box_overlap,
                                           load_annotations, map_11, map_40,
                                           official_evaluation, rotate_iou)

REF_EVAL_DIR = "/root/reference/src/vod/evaluation"
EXAMPLE_LABELS = ("/root/reference/src/dataset_classes/vod/example_set/"
                  "lidar/training/label_2")


def _synth_annos(rng, n_frames=15, drop=0.2, jitter=0.05, fp_max=3):
    """Randomized GT + perturbed detections in annotation-dict form."""
    gts, dts = [], []
    for _ in range(n_frames):
        n = rng.randint(3, 8)
        names = [rng.choice(["Car", "Pedestrian", "Cyclist", "truck"])
                 for _ in range(n)]
        x0y0 = rng.rand(n, 2) * 800
        wh = np.stack([30 + rng.rand(n) * 100, 45 + rng.rand(n) * 150], 1)
        gt = dict(
            name=np.array(names), truncated=np.zeros(n),
            occluded=np.zeros(n, int), alpha=np.full(n, -10.0),
            bbox=np.concatenate([x0y0, x0y0 + wh], 1),
            dimensions=np.stack([1.5 + rng.rand(n), 1.0 + rng.rand(n),
                                 2.0 + rng.rand(n)], 1),
            location=np.stack([rng.randn(n) * 6, 1.0 + rng.rand(n),
                               5 + rng.rand(n) * 40], 1),
            rotation_y=rng.rand(n) * np.pi - np.pi / 2,
            score=np.zeros(n))
        gts.append(gt)
        keep = rng.rand(n) > drop
        dt = {k: v[keep].copy() for k, v in gt.items()}
        m = int(keep.sum())
        dt["location"] = dt["location"] + rng.randn(m, 3) * jitter
        dt["rotation_y"] = dt["rotation_y"] + rng.randn(m) * jitter / 2
        for _ in range(rng.randint(0, fp_max)):
            dt["name"] = np.append(dt["name"], rng.choice(
                ["Car", "Pedestrian", "Cyclist"]))
            dt["truncated"] = np.append(dt["truncated"], 0)
            dt["occluded"] = np.append(dt["occluded"], 0)
            dt["alpha"] = np.append(dt["alpha"], -10.0)
            dt["bbox"] = np.vstack([dt["bbox"], [100, 100, 200, 260]])
            dt["dimensions"] = np.vstack([dt["dimensions"],
                                          [2.0, 1.5, 1.0]])
            dt["location"] = np.vstack(
                [dt["location"], [rng.randn() * 6, 1.0,
                                  5 + rng.rand() * 40]])
            dt["rotation_y"] = np.append(dt["rotation_y"], rng.rand())
        dt["score"] = rng.rand(len(dt["name"])) * 0.9 + 0.05
        dts.append(dt)
    return gts, dts


class TestGeometry:
    def test_image_iou_analytic(self):
        a = np.array([[0.0, 0.0, 10.0, 10.0]])
        b = np.array([[5.0, 0.0, 15.0, 10.0], [20.0, 20.0, 30.0, 30.0]])
        got = image_box_overlap(a, b)
        np.testing.assert_allclose(got, [[50.0 / 150.0, 0.0]], atol=1e-9)

    def test_rotated_iou_axis_aligned(self):
        b = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
        q = np.array([[1.0, 0.0, 2.0, 2.0, 0.0]])
        np.testing.assert_allclose(rotate_iou(b, q), [[2.0 / 6.0]],
                                   atol=1e-9)

    def test_rotated_iou_self_unity(self):
        b = np.array([[1.0, -2.0, 3.0, 1.5, 0.7]])
        np.testing.assert_allclose(rotate_iou(b, b), [[1.0]], atol=1e-9)

    def test_rotated_iou_45_degrees_analytic(self):
        # unit squares side 2, one rotated 45 deg: octagon intersection
        # 8(sqrt(2)-1)
        b = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
        q = np.array([[0.0, 0.0, 2.0, 2.0, np.pi / 4]])
        inter = 8.0 * (np.sqrt(2.0) - 1.0)
        np.testing.assert_allclose(rotate_iou(b, q),
                                   [[inter / (8.0 - inter)]], atol=1e-7)

    def test_rotated_intersection_criterion(self):
        b = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
        q = np.array([[1.0, 0.0, 2.0, 2.0, 0.0]])
        np.testing.assert_allclose(rotate_iou(b, q, criterion=2), [[2.0]],
                                   atol=1e-9)


class TestProtocol:
    def test_get_thresholds_distinct_scores(self):
        # 50 matched detections over 50 gt: recall steps 1/50 < 1/40,
        # so every ~recall-0.025 target picks one score: 41 thresholds
        scores = np.linspace(0.99, 0.01, 50)
        th = get_thresholds(scores.copy(), 50)
        assert len(th) == 41
        assert th[0] == scores.max()
        assert (np.diff(th) <= 0).all()

    def test_compute_statistics_basic(self):
        gt = dict(name=np.array(["Car", "Car"]),
                  bbox=np.array([[0, 0, 100, 100], [200, 0, 300, 100]]),
                  score=np.zeros(2))
        dt = dict(name=np.array(["Car", "Car", "Car"]),
                  bbox=np.array([[0, 0, 100, 100], [205, 0, 305, 100],
                                 [400, 0, 500, 100.0]]),
                  score=np.array([0.9, 0.8, 0.7]))
        overlaps = image_box_overlap(dt["bbox"], gt["bbox"])
        ig = np.zeros(2, np.int64)
        idt = np.zeros(3, np.int64)
        tp, fp, fn, th = compute_statistics(
            overlaps, gt, dt, ig, idt, np.zeros((0, 4)), 0, 0.5,
            compute_fp=True)
        assert (tp, fp, fn) == (2, 1, 0)
        tp, fp, fn, th = compute_statistics(
            overlaps, gt, dt, ig, idt, np.zeros((0, 4)), 0, 0.5,
            thresh=0.85, compute_fp=True)
        assert (tp, fp, fn) == (1, 0, 1)

    def test_roi_filter_ignores_outside_corridor(self):
        n = 3
        gt = dict(name=np.array(["Car"] * n), truncated=np.zeros(n),
                  occluded=np.zeros(n, int), alpha=np.zeros(n),
                  bbox=np.array([[0, 0, 100, 100]] * n, float),
                  dimensions=np.ones((n, 3)),
                  location=np.array([[0.0, 1.0, 10.0],    # inside
                                     [8.0, 1.0, 10.0],    # |x| > 4
                                     [0.0, 1.0, 30.0]]),  # z > 25
                  rotation_y=np.zeros(n), score=np.zeros(n))
        nv, ig, idt, _ = clean_frame(gt, gt, 0, roi=True)
        assert nv == 1
        assert ig.tolist() == [0, 1, 1]
        # detections outside the corridor are ignored too
        assert idt.tolist() == [0, 1, 1]
        nv_all, ig_all, _, _ = clean_frame(gt, gt, 0, roi=False)
        assert nv_all == 3 and ig_all.tolist() == [0, 0, 0]

    def test_perfect_detector_large_gt_is_100(self):
        # >= 41 valid matched GT with distinct scores fills the recall
        # grid: a perfect detector must score mAP11 == mAP40 == 100
        rng = np.random.RandomState(3)
        gts, dts = _synth_annos(rng, n_frames=40, drop=-1.0, jitter=0.0,
                                fp_max=1)
        for dt in dts:
            dt["score"] = rng.permutation(len(dt["score"])) / max(
                len(dt["score"]), 1) * 0.9 + 0.05
        n_car = sum((np.char.lower(g["name"].astype(str)) == "car").sum()
                    for g in gts)
        assert n_car >= 41
        prec = eval_class(gts, dts, 0, metric=2, roi=False)
        assert map_11(prec) == pytest.approx(100.0)
        assert map_40(prec) == pytest.approx(100.0)

    def test_small_gt_protocol_degeneracy(self):
        # the KITTI 11-pt protocol cannot reach recall grid positions
        # beyond the matched-GT count: a perfect detector on few GT
        # objects scores < 100 by construction (documented quirk)
        rng = np.random.RandomState(4)
        gts, dts = _synth_annos(rng, n_frames=2, drop=-1.0, jitter=0.0,
                                fp_max=1)
        prec = eval_class(gts, dts, 0, metric=2, roi=False)
        n_car = sum((np.char.lower(g["name"].astype(str)) == "car").sum()
                    for g in gts)
        if n_car < 41:
            assert map_11(prec) < 100.0


@pytest.mark.skipif(not os.path.isdir(REF_EVAL_DIR),
                    reason="reference evaluator absent")
class TestReferenceParity:
    @pytest.fixture(scope="class")
    def ref_eval(self):
        """Load the reference evaluator with a 2-symbol numba stub."""
        if "numba" not in sys.modules:
            numba = types.ModuleType("numba")

            def _jit(*args, **kwargs):
                if len(args) == 1 and callable(args[0]) and not kwargs:
                    return args[0]
                return lambda fn: fn

            numba.jit = _jit
            numba.float32 = np.float32
            sys.modules["numba"] = numba

        def load(name, path):
            spec = importlib.util.spec_from_file_location(name, path)
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            spec.loader.exec_module(mod)
            return mod

        pkg = types.ModuleType("refeval")
        pkg.__path__ = [REF_EVAL_DIR]
        sys.modules["refeval"] = pkg
        load("refeval.rotate_iou_cpu",
             os.path.join(REF_EVAL_DIR, "rotate_iou_cpu.py"))
        return load("refeval.kitti_official_evaluate",
                    os.path.join(REF_EVAL_DIR,
                                 "kitti_official_evaluate.py"))

    def test_bit_parity_with_reference_evaluator(self, ref_eval):
        rng = np.random.RandomState(0)
        gts, dts = _synth_annos(rng, n_frames=15)
        mine = official_evaluation(gts, dts)
        ref0 = ref_eval.get_official_eval_result(gts, dts, [0, 1, 2],
                                                 custom_method=0)
        ref3 = ref_eval.get_official_eval_result(gts, dts, [0, 1, 2],
                                                 custom_method=3)
        for area, ref in (("entire_area", ref0["entire_area"]),
                          ("roi", ref3["roi"])):
            for k, v in ref.items():
                if k.endswith("_aos_all"):
                    continue
                assert mine[area][k] == pytest.approx(v, abs=1e-9), \
                    f"{area}/{k}"


@pytest.mark.skipif(not os.path.isdir(EXAMPLE_LABELS),
                    reason="example_set absent")
class TestRealLabels:
    def test_example_set_self_evaluation(self):
        gt, ids = load_annotations(EXAMPLE_LABELS)
        assert ids == ["00549", "01047", "01201"]
        res = official_evaluation(gt, gt)
        # GT-as-DT: perfect matching, but the 16-41 valid objects cap the
        # 11-pt recall grid (see test_small_gt_protocol_degeneracy);
        # values pinned from the committed real labels
        assert res["entire_area"]["Pedestrian_3d_all"] == pytest.approx(
            100.0 * 4 / 11, abs=1e-6)
        assert res["entire_area"]["Cyclist_3d_all"] > 0
        # the self-match never produces false positives: precision-driven
        # AP equals the recall-grid coverage exactly
        for k, v in res["entire_area"].items():
            assert 0.0 <= v <= 100.0


class TestConverter:
    def test_tracks_to_kitti_lines_roundtrip(self, tmp_path):
        example_root = ("/root/reference/src/dataset_classes/vod/"
                        "example_set")
        if not os.path.isdir(example_root):
            pytest.skip("example_set absent")
        from ratrack_tpu.data.vod import FrameData, VodLocations, Transforms
        from ratrack_tpu.data.projection import read_intrinsic
        from ratrack_tpu.eval.run_ap import kitti_lines_from_point_tracks
        from ratrack_tpu.eval.detection_ap import parse_label_file
        loc = VodLocations(example_root)
        fd = FrameData(loc, "00549")
        tr = Transforms(fd)
        k = read_intrinsic(fd, "radar")
        # synthesize a 2-track frame from real radar points
        pts = fd.radar[:, :3]
        preds = [(0.8, 5, pts[10:20]), (0.3, 9, pts[50:70])]
        lines = kitti_lines_from_point_tracks(preds, tr, k, "Pedestrian")
        assert len(lines) == 2
        p = tmp_path / "00549.txt"
        p.write_text("\n".join(lines) + "\n")
        ann = parse_label_file(str(p))
        assert (ann["name"] == "Pedestrian").all()
        np.testing.assert_allclose(ann["score"], [0.8, 0.3], atol=1e-4)
        # locations are in front of the camera and nearby
        assert (ann["location"][:, 2] > 0).all()
        assert (np.abs(ann["location"]) < 150).all()
        assert (ann["bbox"][:, 2] > ann["bbox"][:, 0]).all()
        assert (ann["bbox"][:, 3] > ann["bbox"][:, 1]).all()


class TestReferenceQuirks:
    """Pins the two subtle reference behaviors a side-swap would break."""

    def test_rotation_nudge_lands_on_detections(self):
        """The reference's calculate_iou_partly perturbs its FIRST arg,
        and the :533 call site passes (dt, gt) — so IoU(dt_rot+0.01, gt),
        not IoU(dt, gt_rot+0.01). Construct a BEV pair where the sides
        differ and pin ours to the dt-side value."""
        from ratrack_tpu.eval.detection_ap import frame_overlaps, rotate_iou
        dt = dict(bbox=np.array([[0., 0., 10., 10.]]),
                  location=np.array([[0.0, 1.0, 10.0]]),
                  dimensions=np.array([[1.5, 1.0, 4.0]]),
                  rotation_y=np.array([0.30]))
        gt = dict(bbox=np.array([[0., 0., 10., 10.]]),
                  location=np.array([[0.2, 1.0, 10.1]]),
                  dimensions=np.array([[1.5, 1.1, 4.2]]),
                  rotation_y=np.array([-0.25]))
        def bev(ann, d):
            return np.concatenate(
                [ann["location"][:, [0, 2]], ann["dimensions"][:, [0, 2]],
                 (ann["rotation_y"] + d)[:, None]], axis=1)
        want = rotate_iou(bev(dt, 0.01), bev(gt, 0.0))[0, 0]
        other = rotate_iou(bev(dt, 0.0), bev(gt, 0.01))[0, 0]
        got = frame_overlaps(gt, dt, metric=1)[0, 0]
        assert got == pytest.approx(want, abs=1e-12)
        assert abs(want - other) > 1e-6      # the sides genuinely differ

    def test_dontcare_uses_detection_area_criterion(self):
        """Reference dc suppression: image_box_overlap(dt, dc, 0) =
        intersection / dt area (kitti_official_evaluate.py:308). A small
        detection inside a big DontCare region must be suppressed even
        though its IoU with the region is tiny."""
        from ratrack_tpu.eval.detection_ap import image_box_overlap
        dt = np.array([[10., 10., 20., 20.]])      # 100 px²
        dc = np.array([[0., 0., 200., 200.]])      # 40000 px²
        by_iou = image_box_overlap(dt, dc)[0, 0]
        by_dt_area = image_box_overlap(dt, dc, criterion=0)[0, 0]
        assert by_iou < 0.01                       # IoU would NOT suppress
        assert by_dt_area == pytest.approx(1.0)    # criterion=0 does
