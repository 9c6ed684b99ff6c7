"""BEV visualization of tracking output.

Reference: the eval path renders a per-frame bird's-eye-view matplotlib
figure to results_vis/seq<idx>.png (src/main_utils.py:211-246): static
points in grey, moving points colored, per-object track-id annotations,
and scene-flow arrows. matplotlib imports are deferred so headless / test
environments never pay for it.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def plot_projection_2d(path: str, points: np.ndarray,
                       t_camera_sensor: np.ndarray,
                       projection_matrix: np.ndarray,
                       image_shape=(1216, 1936),
                       image: Optional[np.ndarray] = None,
                       title: str = "") -> str:
    """Project a sensor-frame cloud into the camera canvas and render it.

    The devkit-visualizer capability (reference Visualization2D,
    src/vod/visualization/vis_2d.py): points colored by depth over the
    camera image (or a blank canvas when no image is available).
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..data.projection import project_pcl_to_image

    uvs, depth = project_pcl_to_image(points, t_camera_sensor,
                                      projection_matrix, image_shape)
    fig, ax = plt.subplots(figsize=(10, 6))
    if image is not None:
        ax.imshow(image)
    else:
        ax.set_xlim(0, image_shape[1])
        ax.set_ylim(image_shape[0], 0)
        ax.set_facecolor("0.1")
    if uvs.shape[0]:
        sc = ax.scatter(uvs[:, 0], uvs[:, 1], c=depth, s=8, cmap="turbo")
        fig.colorbar(sc, ax=ax, label="depth (m)")
    ax.set_title(title)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_frame_bev(path: str, pc1: np.ndarray, mask: np.ndarray,
                   cls: np.ndarray, labels: np.ndarray,
                   track_ids: np.ndarray, flow: Optional[np.ndarray] = None,
                   mov_thres: float = 0.5, title: str = "") -> str:
    """Render one frame's tracking state to `path` (PNG).

    Args:
      pc1: (N, 3) points (x forward, y left — VoD radar frame).
      mask: (N,) validity.
      cls: (N,) moving probability.
      labels: (N,) cluster slot per point (-1 none).
      track_ids: (K,) persistent id per slot.
      flow: optional (N, 3) scene flow, drawn as arrows on moving points.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    valid = np.asarray(mask, bool)
    pts = np.asarray(pc1)[valid]
    mov = np.asarray(cls)[valid] > mov_thres
    lbl = np.asarray(labels)[valid]

    fig, ax = plt.subplots(figsize=(8, 8))
    ax.scatter(-pts[~mov, 1], pts[~mov, 0], s=4, c="0.75", label="static")
    if mov.any():
        # color moving points by track id (stable across frames)
        ids = np.asarray(track_ids)
        pt_tid = np.where(lbl >= 0, ids[np.clip(lbl, 0, len(ids) - 1)], -1)
        cmap = plt.get_cmap("tab20")
        colors = [cmap(int(t) % 20) if t >= 0 else (0, 0, 0, 1)
                  for t in pt_tid[mov]]
        ax.scatter(-pts[mov, 1], pts[mov, 0], s=14, c=colors, label="moving")
        if flow is not None:
            fl = np.asarray(flow)[valid]
            ax.quiver(-pts[mov, 1], pts[mov, 0], -fl[mov, 1], fl[mov, 0],
                      angles="xy", scale_units="xy", scale=0.5, width=2e-3,
                      color="tab:red", alpha=0.6)
        # annotate object centres with their track id
        for k in np.unique(lbl[mov & (lbl >= 0)]):
            sel = lbl == k
            c = pts[sel].mean(axis=0)
            tid = int(pt_tid[sel][0])
            ax.annotate(str(tid), (-c[1], c[0]), fontsize=9,
                        fontweight="bold")
    ax.set_xlabel("-y (m)")
    ax.set_ylabel("x (m)")
    ax.set_title(title)
    ax.set_aspect("equal")
    ax.legend(loc="upper right", fontsize=8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path
