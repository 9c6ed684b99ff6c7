"""Fixed-shape frame-pair records fed to the model.

One record = the padded equivalent of what the reference epoch loop
assembles per frame (`src/main_utils.py:66-126`): radar clouds of frames
t+1 ("pc1") and t ("pc2"), their [RCS, v_r] features, the ego-compensated
pc1, and the GT tensors built from tracking labels. GT object identity is
carried two ways: a dense per-frame slot (for one-hot math) and the
original persistent label id (for cross-frame mapping).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class FrameBatch(NamedTuple):
    pc1: jnp.ndarray         # (N, 3) radar xyz, frame t+1
    pc2: jnp.ndarray         # (N, 3) radar xyz, frame t
    ft1: jnp.ndarray         # (N, 2) [RCS, v_r] of pc1
    ft2: jnp.ndarray         # (N, 2) of pc2
    mask1: jnp.ndarray       # (N,) bool
    mask2: jnp.ndarray       # (N,) bool
    pc1_comp: jnp.ndarray    # (N, 3) ego-motion-compensated pc1
    gt_cls: jnp.ndarray      # (N,) bool — moving point (in a moving GT box)
    gt_flow: jnp.ndarray     # (N, 3) GT warped POSITIONS (not displacement)
    gt_dense: jnp.ndarray    # (N,) int32 dense GT slot per point, -1 none
    gt_label_ids: jnp.ndarray  # (G,) int32 persistent GT label id per slot
    gt_valid: jnp.ndarray    # (G,) bool
    new_seq: jnp.ndarray     # () bool — reset recurrent state first
    frame_number: jnp.ndarray  # () int32 — dataset frame index (t+1)


def empty_frame(n_max: int, g_max: int) -> FrameBatch:
    z3 = np.zeros((n_max, 3), np.float32)
    z2 = np.zeros((n_max, 2), np.float32)
    zb = np.zeros((n_max,), bool)
    return FrameBatch(
        pc1=z3, pc2=z3.copy(), ft1=z2, ft2=z2.copy(),
        mask1=zb, mask2=zb.copy(), pc1_comp=z3.copy(),
        gt_cls=zb.copy(), gt_flow=z3.copy(),
        gt_dense=np.full((n_max,), -1, np.int32),
        gt_label_ids=np.full((g_max,), -1, np.int32),
        gt_valid=np.zeros((g_max,), bool),
        new_seq=np.asarray(False),
        frame_number=np.asarray(0, np.int32),
    )
