"""Multi-task loss: scene flow + affinity + motion segmentation.

Reference: `src/losses/loss.py:8-146`.
  total = 0.5·flow + 0.5·affinity + 1.0·seg      (loss.py:22)
  pretrain (epoch < pretrain_epochs) → seg only   (loss.py:23-24)
  NaN components are zeroed                       (loss.py:15-20)

All terms are masked fixed-shape equivalents of the reference's
variable-size computations:
  * flow_loss (loss.py:85-89): mean over valid points of
    ‖warp − gt_flow_positions‖₂;
  * affinity_loss (loss.py:48-72): BCE between the (m×n) affinity block and
    the GT identity mapping (prev_gt_id[i] == curr_gt_id[j]); 0 when either
    side is empty;
  * motion_seg_loss (loss.py:124-146): class-weighted BCE,
    0.4·positives + 0.6·negatives.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

_EPS = 1e-7


def _bce(p, y):
    p = jnp.clip(p, _EPS, 1.0 - _EPS)
    return -(y * jnp.log(p) + (1.0 - y) * jnp.log1p(-p))


def _masked_mean(x, mask):
    s = jnp.sum(jnp.where(mask, x, 0.0))
    c = jnp.sum(mask.astype(jnp.float32))
    return jnp.where(c > 0, s / jnp.maximum(c, 1.0), 0.0)


def flow_loss(warp, gt_flow, mask):
    err = jnp.sqrt(jnp.sum(jnp.square(warp - gt_flow), axis=-1) + 1e-20)
    return _masked_mean(err, mask)


def motion_seg_loss(cls, gt_cls, mask):
    gt = gt_cls.astype(jnp.float32)
    bce = _bce(cls, gt)
    pos = _masked_mean(bce, mask & gt_cls)
    neg = _masked_mean(bce, mask & ~gt_cls)
    return 0.4 * pos + 0.6 * neg


def affinity_loss(aff, prev_gt_id, prev_valid, curr_gt_id, curr_valid):
    pair_ok = prev_valid[:, None] & curr_valid[None, :]
    gt = (prev_gt_id[:, None] == curr_gt_id[None, :]) & pair_ok
    loss = _masked_mean(_bce(aff, gt.astype(jnp.float32)), pair_ok)
    any_pairs = jnp.any(pair_ok)
    return jnp.where(any_pairs, loss, 0.0)


def track4d_loss(outputs: Dict[str, jnp.ndarray], frame,
                 pretrain) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total multi-task loss from a Track4D step's outputs.

    `pretrain` may be a traced bool scalar (epoch gate).
    """
    sf = flow_loss(outputs["warp"], frame.gt_flow, frame.mask1)
    seg = motion_seg_loss(outputs["cls"], frame.gt_cls, frame.mask1)
    trk = affinity_loss(outputs["aff"], outputs["prev_gt_id"],
                        outputs["prev_valid"], outputs["curr_gt_id"],
                        outputs["curr_valid"])
    sf = jnp.nan_to_num(sf)
    seg = jnp.nan_to_num(seg)
    trk = jnp.nan_to_num(trk)
    full = 0.5 * sf + 0.5 * trk + 1.0 * seg
    total = jnp.where(jnp.asarray(pretrain), seg, full)
    items = {"Loss": total, "SceneFlowLoss": sf, "TrackingLoss": trk,
             "SegLoss": seg}
    return total, items
