"""Query-and-group and 3-NN feature interpolation.

TPU-native equivalents of `QueryAndGroup` (src/lib/pointnet2_utils.py:259-292)
and `three_interpolate` (src/lib/src/interpolate_gpu.cu:149-231).
"""

from __future__ import annotations

import jax.numpy as jnp

from .neighborhood import ball_query_auto, three_nn
from .sampling import group


def query_and_group(radius: float, nsample: int, xyz: jnp.ndarray,
                    centers: jnp.ndarray, features: jnp.ndarray | None,
                    xyz_mask: jnp.ndarray | None = None,
                    use_xyz: bool = True) -> jnp.ndarray:
    """Ball query + gather + center-relative xyz concat.

    Reference `QueryAndGroup.forward` (pointnet2_utils.py:269-292): returns
    grouped `[xyz - center, features]` of shape (B, 3+C, npoint, nsample);
    here (npoint, nsample, 3+C), points-major.

    Args:
      radius, nsample: ball parameters (static).
      xyz: (N, 3) source points.
      centers: (M, 3) query centers.
      features: optional (N, C) per-point features.
      xyz_mask: optional (N,) bool validity of source points.
    Returns:
      (M, nsample, 3+C) grouped tensor (or (M, nsample, 3) without features).
    """
    idx = ball_query_auto(radius, nsample, xyz, centers, xyz_mask)  # (M, S)
    grouped_xyz = group(xyz, idx) - centers[:, None, :]        # (M, S, 3)
    if features is None:
        assert use_xyz, "need features or use_xyz"
        return grouped_xyz
    grouped_feat = group(features, idx)                        # (M, S, C)
    if use_xyz:
        return jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)
    return grouped_feat


def three_interpolate_weights(dist: jnp.ndarray) -> jnp.ndarray:
    """Inverse-distance weights, reference PointnetFPModule (pointnet2_modules.py:141-144)."""
    recip = 1.0 / (dist + 1e-8)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)


def three_interpolate(features: jnp.ndarray, idx: jnp.ndarray,
                      weight: jnp.ndarray) -> jnp.ndarray:
    """Weighted 3-point interpolation: (M, C) × (N, 3) × (N, 3) -> (N, C).

    Backward (scatter-add into features, interpolate_gpu.cu:195-231) is
    supplied by autodiff — on TPU through the one-hot matmul route
    (ops.sampling.group), keeping both directions on the MXU.
    """
    from .sampling import group as _group
    gathered = _group(features, idx)                  # (N, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=1)


def interpolate_features(query_xyz: jnp.ndarray, known_xyz: jnp.ndarray,
                         known_feats: jnp.ndarray,
                         known_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """three_nn + inverse-distance-weighted interpolation in one call."""
    dist, idx = three_nn(query_xyz, known_xyz, known_mask)
    w = three_interpolate_weights(dist)
    return three_interpolate(known_feats, idx, w)
