"""Parity tests: native C++ data path vs the NumPy implementations.

Skipped when the shared library is unavailable AND cannot be built
(no compiler in the environment)."""

import numpy as np
import pytest

from ratrack_tpu.data import native


needs_lib = pytest.mark.skipif(not native.available(),
                               reason="libvod_native.so not available")


@needs_lib
def test_decode_scan_matches_fromfile(tmp_path, rng):
    arr = rng.randn(133, 7).astype(np.float32)
    p = tmp_path / "scan.bin"
    arr.tofile(str(p))
    got = native.decode_scan(str(p), 7)
    np.testing.assert_array_equal(got, arr)


@needs_lib
def test_decode_scan_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        native.decode_scan(str(tmp_path / "missing.bin"), 7)
    p = tmp_path / "bad.bin"
    p.write_bytes(b"\x00" * 13)     # not a multiple of 7 floats
    with pytest.raises(ValueError):
        native.decode_scan(str(p), 7)


@needs_lib
def test_decode_scan_truncates_at_max(tmp_path, rng):
    arr = rng.randn(50, 4).astype(np.float32)
    p = tmp_path / "scan.bin"
    arr.tofile(str(p))
    got = native.decode_scan(str(p), 4, max_pts=20)
    np.testing.assert_array_equal(got, arr[:20])


@needs_lib
def test_transform_points_matches_numpy(rng):
    pts = rng.randn(200, 3).astype(np.float32) * 10
    t = np.eye(4)
    t[:3, :3] = _rot(rng)
    t[:3, 3] = [1.0, -2.0, 0.5]
    want = (t @ np.concatenate(
        [pts, np.ones((200, 1), np.float32)], axis=1).T).T[:, :3]
    got = native.transform_points(pts, t)
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-4)


@needs_lib
def test_compensate_ego_matches_reference_formula(rng):
    from ratrack_tpu.data.vod import compensate_ego as np_comp
    pts = rng.randn(150, 3).astype(np.float32) * 5
    t = np.eye(4)
    t[:3, :3] = _rot(rng)
    t[:3, 3] = [0.8, 0.1, 0.0]
    np.testing.assert_allclose(native.compensate_ego(pts, t),
                               np_comp(pts, t.astype(np.float32)),
                               atol=1e-4)


@needs_lib
def test_points_in_obb_matches_gt_module(rng):
    from ratrack_tpu.data.gt import OrientedBox, points_in_obb as np_obb
    pts = rng.randn(500, 3).astype(np.float32) * 3
    box = OrientedBox(center=np.array([0.5, -0.2, 0.1]),
                      rot=_rot(rng), extent=np.array([4.0, 2.0, 1.5]))
    want = np_obb(pts, box)
    got = native.points_in_obb(pts, box.center, box.rot, box.extent)
    np.testing.assert_array_equal(got, want)
    assert want.sum() > 0          # scenario must exercise both branches
    assert want.sum() < len(pts)


@needs_lib
def test_pad_cloud(rng):
    src = rng.randn(10, 5).astype(np.float32)
    out, mask, n = native.pad_cloud(src, 16)
    assert n == 10 and mask.sum() == 10
    np.testing.assert_array_equal(out[:10], src)
    assert (out[10:] == 0).all()
    # truncation
    out, mask, n = native.pad_cloud(src, 4)
    assert n == 4 and mask.all()
    np.testing.assert_array_equal(out, src[:4])


def _rot(rng):
    from scipy.spatial.transform import Rotation
    return Rotation.from_euler("xyz", rng.rand(3)).as_matrix()
