"""3D visualizer (utils/vis3d) — geometry oracles + real-data export.

Pins the k3d-equivalent scene math against hand-computed oracles and the
reference formulas (src/vod/visualization/helpers.py:10-206), and drives
the full Visualization3D export over the reference's real example_set
frames.
"""

import os

import numpy as np
import pytest

from ratrack_tpu.data.vod import FrameData, VodLocations, transform_points
from ratrack_tpu.utils.vis3d import (
    LABEL_COLOR_PALETTE_3D, Scene3D, Visualization3D, default_camera,
    label_corners_3d, parse_detection_labels, parse_scene_html,
    radial_velocity_vectors, track_color, transformed_label_corners)

EXAMPLE_SET = "/root/reference/src/dataset_classes/vod/example_set"
FRAMES = ["00549", "01047", "01201"]

needs_example_set = pytest.mark.skipif(
    not os.path.isdir(EXAMPLE_SET), reason="reference example_set absent")


def _mk_label(**kw):
    from ratrack_tpu.data.vod import ObjectLabel
    base = dict(type="Car", id=0, occ=0.0, alpha=0.0,
                bbox2d=np.zeros(4, np.float32),
                h=1.5, w=2.0, l=4.0, x=0.0, y=0.0, z=0.0, ry=0.0)
    base.update(kw)
    return ObjectLabel(**base)


class TestGeometryOracles:
    def test_label_corners_canonical(self):
        c = label_corners_3d(_mk_label(h=2.0, w=1.0, l=3.0))
        assert c.shape == (8, 3)
        # bottom face at z=0, top at z=h (helpers.py:52-58)
        assert np.allclose(c[:4, 2], 0.0) and np.allclose(c[4:, 2], 2.0)
        assert np.allclose(np.abs(c[:, 0]), 1.5)   # ±l/2
        assert np.allclose(np.abs(c[:, 1]), 0.5)   # ±w/2
        # vertical edges pair bottom i with top i+4
        assert np.allclose(c[:4, :2], c[4:, :2])

    def test_transformed_corners_identity_frames(self):
        # ry = -pi/2 → rotation angle -(ry+pi/2) = 0 → pure translation
        lab = _mk_label(x=1.0, y=2.0, z=3.0, ry=-np.pi / 2)
        out = transformed_label_corners([lab], np.eye(4), np.eye(4))
        assert len(out) == 1 and out[0]["label_class"] == "Car"
        exp = label_corners_3d(lab) + np.array([1.0, 2.0, 3.0])
        assert np.allclose(out[0]["corners"], exp, atol=1e-9)

    def test_transformed_corners_rotation(self):
        # ry = 0 → rotation -(pi/2): x-axis corners land on -y
        lab = _mk_label(l=4.0, w=0.0, h=0.0, ry=0.0)
        out = transformed_label_corners([lab], np.eye(4), np.eye(4))
        c = out[0]["corners"]
        assert np.allclose(np.abs(c[:, 1]), 2.0, atol=1e-9)
        assert np.allclose(c[:, 0], 0.0, atol=1e-9)

    def test_transformed_corners_camera_to_lidar_center(self):
        # center passes through inv(t_camera_lidar) (helpers.py:80-83)
        t_cam_lidar = np.eye(4)
        t_cam_lidar[:3, 3] = [10.0, 0.0, 0.0]
        lab = _mk_label(x=0, y=0, z=0, ry=-np.pi / 2, l=0, w=0, h=0)
        out = transformed_label_corners([lab], np.eye(4), t_cam_lidar)
        assert np.allclose(out[0]["corners"], [[-10.0, 0.0, 0.0]] * 8)

    def test_radial_velocity_vectors(self):
        pc = np.array([[3.0, 4.0, 0.0], [0.0, 0.0, 2.0]])
        v = np.array([5.0, -1.0])
        out = radial_velocity_vectors(pc, v)
        assert np.allclose(out[0], [3.0, 4.0, 0.0])     # 5 * unit(3,4,0)
        assert np.allclose(out[1], [0.0, 0.0, -1.0])

    def test_radial_velocity_zero_norm_safe(self):
        out = radial_velocity_vectors(np.zeros((1, 3)), np.array([2.0]))
        assert np.all(np.isfinite(out))

    def test_default_camera_identity(self):
        cam = default_camera()
        assert np.allclose(cam["eye"], [-10, 0, 20])
        assert np.allclose(cam["target"], [10, 0, 1])
        up = np.array([10, 0, 70.0])
        assert np.allclose(cam["up"], up / np.linalg.norm(up))

    def test_default_camera_translated_frame(self):
        t = np.eye(4)
        t[:3, 3] = [5.0, -2.0, 1.0]
        cam = default_camera(t)
        assert np.allclose(cam["eye"], [-5, -2, 21])
        assert np.allclose(cam["target"], [15, -2, 2])


class TestSceneRoundTrip:
    def test_points_lines_texts_roundtrip(self, tmp_path):
        sc = Scene3D(title="t")
        pts = np.arange(12, dtype=np.float64).reshape(4, 3)
        sc.add_points(pts, color=0x123456, size=0.3, name="radar")
        sc.add_vectors(pts, np.ones_like(pts), color=0xFF0000)
        sc.add_text([1, 2, 3], "radar", 0xFF0000)
        path = sc.to_html(str(tmp_path / "scene.html"))
        data = parse_scene_html(path)
        assert data["title"] == "t"
        p = data["points"][0]
        assert p["name"] == "radar" and p["color"] == 0x123456
        assert np.allclose(np.array(p["xyz"]).reshape(4, 3), pts)
        ln = data["lines"][0]
        seg = np.array(ln["xyz"]).reshape(-1, 2, 3)
        assert seg.shape == (4, 2, 3)
        assert np.allclose(seg[:, 1] - seg[:, 0], 1.0)
        assert data["texts"][0]["text"] == "radar"
        assert data["texts"][0]["color"] == "#ff0000"

    def test_box_topology_12_edges(self, tmp_path):
        sc = Scene3D()
        corners = label_corners_3d(_mk_label())
        sc.add_box(corners, color=0xFF0000, width=0.05)
        segs = np.array(sc.lines[0]["xyz"]).reshape(-1, 2, 3)
        assert segs.shape[0] == 12
        # every edge has exactly one varying coordinate axis on this
        # axis-aligned box
        diffs = np.abs(segs[:, 1] - segs[:, 0])
        assert np.all(np.sum(diffs > 1e-9, axis=1) == 1)
        # 4 vertical edges of height h
        assert np.sum(diffs[:, 2] > 1e-9) == 4

    def test_axes_triads(self):
        sc = Scene3D()
        t = np.eye(4)
        t[:3, 3] = [1.0, 1.0, 1.0]
        sc.add_axes(t, length=2.0)
        assert len(sc.lines) == 3
        tips = [np.array(l["xyz"]).reshape(2, 3)[1] for l in sc.lines]
        assert np.allclose(tips[0], [3, 1, 1])
        assert np.allclose(tips[1], [1, 3, 1])
        assert np.allclose(tips[2], [1, 1, 3])
        assert [l["color"] for l in sc.lines] == [0xFF0000, 0x00FF00,
                                                  0x0000FF]

    def test_track_points_palette_and_filtering(self):
        sc = Scene3D()
        pts = np.zeros((5, 3))
        tid = np.array([0, 1, -1, 0, 21])
        valid = np.array([True, True, True, False, True])
        sc.add_track_points(pts, tid, valid)
        entry = sc.points[0]
        assert len(entry["xyz"]) == 3 * 3          # -1 and invalid dropped
        assert entry["colors"][0] == track_color(0)
        assert entry["colors"][2] == track_color(21)
        assert track_color(21) == track_color(1)   # palette wraps at 20

    def test_html_is_standalone(self, tmp_path):
        path = Scene3D().add_points(np.zeros((1, 3))).to_html(
            str(tmp_path / "s.html"))
        html = open(path).read()
        assert "<script src=" not in html          # no external resources
        assert "http://" not in html and "https://" not in html
        assert "webgl" in html


@needs_example_set
class TestVisualization3DRealData:
    @pytest.fixture(scope="class")
    def frame(self):
        return FrameData(VodLocations(EXAMPLE_SET), FRAMES[0])

    def test_full_export_camera_origin(self, frame, tmp_path):
        vis = Visualization3D(frame, origin="camera")
        out = vis.draw_plot(
            radar_origin_plot=True, lidar_origin_plot=True,
            camera_origin_plot=True, lidar_points_plot=True,
            radar_points_plot=True, radar_velocity_plot=True,
            annotations_plot=True, write_to_html=True,
            html_name=str(tmp_path / "frame"))
        data = parse_scene_html(out)
        names = [p["name"] for p in data["points"]]
        assert "radar" in names and "lidar" in names
        radar = next(p for p in data["points"] if p["name"] == "radar")
        assert len(radar["xyz"]) == 3 * frame.radar.shape[0]
        assert radar["color"] == 0xFF0000
        n_det = len(parse_detection_labels(frame.detection_labels))
        boxes = [l for l in data["lines"] if l["name"].startswith("label:")]
        assert n_det > 0 and len(boxes) == n_det
        vel = [l for l in data["lines"] if l["name"] == "radar_velocity"]
        assert len(vel) == 1
        texts = {t["text"] for t in data["texts"]}
        assert {"radar", "lidar", "camera"} <= texts

    def test_radar_origin_identity_vs_camera_transform(self, frame):
        vr = Visualization3D(frame, origin="radar")
        vr.plot_radar_points()
        raw = frame.radar[:, :3].astype(np.float64)
        got = np.array(vr.scene.points[0]["xyz"]).reshape(-1, 3)
        assert np.allclose(got, np.round(raw, 4), atol=1e-4)

        vc = Visualization3D(frame, origin="camera")
        vc.plot_radar_points()
        exp = transform_points(raw, vc.transforms.t_camera_radar)
        got_c = np.array(vc.scene.points[0]["xyz"]).reshape(-1, 3)
        assert np.allclose(got_c, exp, atol=1e-3)
        assert not np.allclose(got, got_c, atol=1e-2)

    def test_annotation_box_edges_match_label_dims(self, frame):
        vis = Visualization3D(frame, origin="lidar")
        vis.plot_annotations()
        labels = parse_detection_labels(frame.detection_labels)
        for lab, entry in zip(labels, vis.scene.lines):
            segs = np.array(entry["xyz"]).reshape(-1, 2, 3)
            lens = np.linalg.norm(segs[:, 1] - segs[:, 0], axis=1)
            # 4 vertical edges of length h; ring edges alternate l, w
            assert np.isclose(np.sort(lens)[-1],
                              max(lab.h, lab.w, lab.l), atol=0.02)
            assert entry["name"].split(":")[1] == lab.type
            expected = LABEL_COLOR_PALETTE_3D.get(lab.type, 0xAAAAAA)
            assert entry["color"] == expected

    def test_bad_origin_raises(self, frame):
        with pytest.raises(ValueError):
            Visualization3D(frame, origin="map")

    def test_detection_parser_keeps_all_lines(self, frame):
        lines = frame.detection_labels
        parsed = parse_detection_labels(lines)
        n_valid = sum(1 for l in lines if len(l.split(" ")) >= 15)
        assert len(parsed) == n_valid
        assert [p.id for p in parsed] == list(range(len(parsed)))


GOLDEN_DIR = "/root/reference/src/result/4dmot_runthis/delft_1"


@needs_example_set
class TestCLI:
    def test_cli_frame_with_golden_tracks(self, tmp_path):
        from ratrack_tpu.utils.vis3d import main
        out = str(tmp_path / "f.html")
        args = ["--dataset", EXAMPLE_SET, "--frame", FRAMES[0],
                "--out", out, "--origin", "radar", "--velocity"]
        golden = os.path.join(GOLDEN_DIR, "00010.txt")
        if os.path.exists(golden):
            args += ["--results", golden]
        main(args)
        data = parse_scene_html(out)
        names = [p["name"] for p in data["points"]]
        assert "radar" in names
        if os.path.exists(golden):
            tracks = [p for p in data["points"]
                      if p["name"].startswith("track:")]
            assert tracks
            # in the radar origin the dump coordinates pass through
            # an identity transform
            from ratrack_tpu.eval.export import parse_frame_results
            ref = parse_frame_results(golden)
            got = np.array(tracks[0]["xyz"]).reshape(-1, 3)
            assert np.allclose(got, ref[0][2], atol=1e-4)
