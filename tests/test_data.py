"""Data layer: VoD parsing, GT assembly, pipeline records on a fixture tree."""

import numpy as np
import pytest

from ratrack_tpu.config import Config
from ratrack_tpu.data.fixture import make_vod_fixture
from ratrack_tpu.data.vod import (VodLocations, FrameData, Transforms,
                                  parse_tracking_labels,
                                  filter_moving_labels, ego_motion_radar,
                                  compensate_ego)
from ratrack_tpu.data.gt import (box_from_label, points_in_obb,
                                 build_frame_gt, rigid_gt_flow)
from ratrack_tpu.data.pipeline import VodTrackStream, CLIP_RANGES


@pytest.fixture(scope="module")
def vod_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vod"))
    make_vod_fixture(root, range(0, 6))
    return root


def test_radar_parsing(vod_root):
    fd = FrameData(VodLocations(vod_root), "00000")
    assert fd.radar.shape[1] == 7
    assert fd.lidar.shape[1] == 4
    assert np.isfinite(fd.radar).all()


def test_labels_and_moving_filter(vod_root):
    fd = FrameData(VodLocations(vod_root), "00001")
    labels = parse_tracking_labels(fd.tracking_labels)
    assert set(labels) == {7, 9}
    assert labels[7].type == "Car" and labels[9].type == "Pedestrian"
    mov = filter_moving_labels(labels, fd.detection_labels)
    assert set(mov) == {7, 9}


def test_transforms_identity_fixture(vod_root):
    fd = FrameData(VodLocations(vod_root), "00000")
    tr = Transforms(fd)
    np.testing.assert_allclose(tr.t_camera_radar, np.eye(4), atol=1e-6)
    np.testing.assert_allclose(tr.t_radar_lidar, np.eye(4), atol=1e-6)
    ego = ego_motion_radar(tr, tr)
    np.testing.assert_allclose(ego, np.eye(4), atol=1e-6)
    pts = np.array([[1.0, 2.0, 3.0]], np.float32)
    np.testing.assert_allclose(compensate_ego(pts, ego), pts, atol=1e-6)


def test_obb_in_box(vod_root):
    fd = FrameData(VodLocations(vod_root), "00000")
    tr = Transforms(fd)
    labels = parse_tracking_labels(fd.tracking_labels)
    box = box_from_label(labels[7], tr)
    # fixture uses ry=-π/2 → identity rotation; center from the label
    np.testing.assert_allclose(box.rot, np.eye(3), atol=1e-6)
    inside = points_in_obb(box.center[None, :].astype(np.float32), box)
    assert inside[0]
    far = points_in_obb(box.center[None, :] + 100.0, box)
    assert not far[0]
    # half-extent boundary is inside (closed test)
    edge = box.center + np.array([labels[7].l / 2, 0, 0])
    assert points_in_obb(edge[None, :], box)[0]


def test_build_frame_gt(vod_root):
    fd = FrameData(VodLocations(vod_root), "00000")
    tr = Transforms(fd)
    labels = parse_tracking_labels(fd.tracking_labels)
    gt = build_frame_gt(labels, fd.radar[:, :3], tr, min_obj_points=2)
    # the 12 car points and 8 ped points were generated inside the boxes
    assert gt.cls[:12].all(), "car points flagged moving"
    assert (gt.point_obj_id[:12] == 7).all()
    assert set(gt.objs) == {7, 9}
    assert not gt.cls[30:].any() or gt.cls[30:].mean() < 0.2  # clutter mostly out


def test_rigid_gt_flow(vod_root):
    loc = VodLocations(vod_root)
    fd1, fd2 = FrameData(loc, "00001"), FrameData(loc, "00000")
    tr1, tr2 = Transforms(fd1), Transforms(fd2)
    l1 = parse_tracking_labels(fd1.tracking_labels)
    l2 = parse_tracking_labels(fd2.tracking_labels)
    pc1 = fd1.radar[:, :3]
    gt1 = build_frame_gt(l1, pc1, tr1, 2)
    gt2 = build_frame_gt(l2, fd2.radar[:, :3], tr2, 2)
    comp = pc1.copy()  # stationary ego
    flow = rigid_gt_flow(pc1, comp, gt1, gt2)
    # car moved +0.3 in x per frame → gt position steps BACK 0.3
    delta = flow[:12] - pc1[:12]
    np.testing.assert_allclose(delta[:, 0], -0.3, atol=1e-4)
    # static clutter outside every box: flow == compensated position
    clutter = ~gt1.cls
    clutter[:20] = False
    np.testing.assert_allclose(flow[clutter], comp[clutter], atol=1e-6)


def _write_clip(root):
    import os
    d = os.path.join(root, "clips")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "delft_1.txt"), "w") as f:
        f.write("\n".join(str(i) for i in range(0, 6)))
    return d


def test_pipeline_records(vod_root):
    cfg = Config(dataset_path=vod_root, n_max=128, g_max=8,
                 clips_dir=_write_clip(vod_root), eval=True)
    stream = VodTrackStream(cfg, split="val")
    stream.clips = ["delft_1"]
    recs = list(stream)
    assert len(recs) == 5  # frames 0..4 paired with +1
    assert not stream.skipped
    clip0, r0 = recs[0]
    assert bool(r0.new_seq) and not bool(recs[1][1].new_seq)
    assert r0.pc1.shape == (128, 3)
    n_valid = int(r0.mask1.sum())
    assert n_valid == 80
    assert r0.gt_cls[:20].sum() == 20       # both objects moving
    assert set(np.unique(r0.gt_dense[:20])) == {0, 1}
    assert r0.gt_label_ids[0] == 7 and r0.gt_label_ids[1] == 9
    assert int(r0.frame_number) == 1
    # gt flow of car points steps back 0.3 in x
    np.testing.assert_allclose(
        (r0.gt_flow - r0.pc1)[:12, 0], -0.3, atol=1e-4)


def test_clip_ranges_cover_reference_counts():
    # spot totals from the reference clips files
    assert CLIP_RANGES["delft_1"] == (0, 543)
    total = sum(b - a + 1 for a, b in CLIP_RANGES.values())
    assert total == 8682  # sum of entries across the reference clips files


class TestProjection:
    """Devkit camera-projection parity (transformations.py:296-388)."""

    def test_project_pinhole_center(self):
        from ratrack_tpu.data.projection import project_pcl_to_image
        # identity extrinsics, f=100 intrinsics centred at (320, 240)
        # KITTI P-matrix convention: cx/cy in the 3rd column (scale by z)
        p = np.array([[100.0, 0, 320, 0], [0, 100.0, 240, 0],
                      [0, 0, 1.0, 0]], np.float32)
        pts = np.array([[0.0, 0.0, 5.0],      # on axis → principal point
                        [1.0, 0.0, 5.0],      # 100/5 = 20 px right
                        [0.0, 0.0, -5.0],     # behind camera → dropped
                        [50.0, 0.0, 5.0]],    # off canvas → dropped
                       np.float32)
        uvs, depth = project_pcl_to_image(pts, np.eye(4, dtype=np.float32),
                                          p, (480, 640))
        np.testing.assert_array_equal(uvs, [[320, 240], [340, 240]])
        np.testing.assert_allclose(depth, [5.0, 5.0])

    def test_extrinsic_applied_before_projection(self):
        from ratrack_tpu.data.projection import project_pcl_to_image
        p = np.array([[100.0, 0, 320, 0], [0, 100.0, 240, 0],
                      [0, 0, 1.0, 0]], np.float32)
        t = np.eye(4, dtype=np.float32)
        t[2, 3] = 3.0                          # push points 3 m deeper
        uvs, depth = project_pcl_to_image(
            np.array([[0.0, 0.0, 2.0]], np.float32), t, p, (480, 640))
        np.testing.assert_allclose(depth, [5.0])

    def test_intrinsic_from_fixture_calib(self, tmp_path):
        from ratrack_tpu.data.fixture import make_vod_fixture
        from ratrack_tpu.data.projection import read_intrinsic
        from ratrack_tpu.data.vod import VodLocations, FrameData
        root = str(tmp_path / "vod")
        make_vod_fixture(root, range(3575, 3577))
        fd = FrameData(VodLocations(root), "03575")
        intr = read_intrinsic(fd, "radar")
        assert intr.shape == (3, 4)
        np.testing.assert_allclose(intr, np.eye(3, 4))


class TestMotionThresholdFilter:
    """filter_moving_labels_by_motion (reference filter_moving_boxes,
    the motion-threshold alternative to the detection-flag filter)."""

    def test_moving_vs_static_classification(self, tmp_path):
        from ratrack_tpu.data.fixture import make_vod_fixture
        from ratrack_tpu.data.vod import (VodLocations, FrameData,
                                          Transforms,
                                          parse_tracking_labels)
        from ratrack_tpu.data.gt import filter_moving_labels_by_motion

        root = str(tmp_path / "vod")
        # fixture: Car moves 0.3 m/frame (> 0.15 thres), Pedestrian moves
        # ~0.15 m/frame of clip_motion*0.5 (> 0.06); ego stationary
        make_vod_fixture(root, range(100, 103), clip_motion=0.3)
        loc = VodLocations(root)
        fd0, fd1 = FrameData(loc, "00100"), FrameData(loc, "00101")
        l0 = parse_tracking_labels(fd0.tracking_labels)
        l1 = parse_tracking_labels(fd1.tracking_labels)
        mov = filter_moving_labels_by_motion(l0, l1, Transforms(fd0),
                                             Transforms(fd1))
        assert set(mov) == {7, 9}      # both fixture objects move

        # slow world: everything under thresholds → nothing moving
        root2 = str(tmp_path / "vod_slow")
        make_vod_fixture(root2, range(100, 103), clip_motion=0.01)
        loc2 = VodLocations(root2)
        fd0, fd1 = FrameData(loc2, "00100"), FrameData(loc2, "00101")
        l0 = parse_tracking_labels(fd0.tracking_labels)
        l1 = parse_tracking_labels(fd1.tracking_labels)
        mov = filter_moving_labels_by_motion(l0, l1, Transforms(fd0),
                                             Transforms(fd1))
        assert mov == {}

    def test_object_absent_in_prev_frame_skipped(self, tmp_path):
        from ratrack_tpu.data.fixture import make_vod_fixture
        from ratrack_tpu.data.vod import (VodLocations, FrameData,
                                          Transforms,
                                          parse_tracking_labels)
        from ratrack_tpu.data.gt import filter_moving_labels_by_motion
        root = str(tmp_path / "vod")
        make_vod_fixture(root, range(100, 102), clip_motion=0.5)
        loc = VodLocations(root)
        fd0, fd1 = FrameData(loc, "00100"), FrameData(loc, "00101")
        l1 = parse_tracking_labels(fd1.tracking_labels)
        mov = filter_moving_labels_by_motion({}, l1, Transforms(fd0),
                                             Transforms(fd1))
        assert mov == {}
