"""Track4D: the full radar moving-object tracking network, one XLA program.

Reference: `src/models/track4d.py:13-223`. The reference's forward leaves
the device twice per frame (CPU sklearn DBSCAN at :111, python M×N affinity
loops at :182-223); here clustering, descriptor pooling, affinity, Sinkhorn
and ID assignment are all traced into the same jit as the backbone.

Per-point feature tensor F (N, 139) mirrors track4d.py:53-54:
  [warp(3) | pc1(3) | flow(3) | RCS,v_r(2) | prop_features(128)].
Clustering features are F[:, 3:9] ∪ F[:, 10:12] — the reference indexes
10:12, i.e. v_r plus the FIRST prop feature channel (a quirk kept for
parity; 9:11 was presumably intended).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..data.frames import FrameBatch
from ..tracker.dbscan import dbscan, compact_dbscan
from ..tracker.state import TrackState, init_state, reset_where
from ..tracker.association import (cluster_descriptors, greedy_gt_match,
                                   associate)
from .pnhead import PNHead
from .correlator import FeatureCorrelator
from .decoder import FlowDecoder
from .affinity import Affinity


def _masked_max(x: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
    """Max over valid rows; 0 when no row is valid.

    The all-invalid guard matters: empty dp-padding frames otherwise
    produce -inf global features → NaN activations, and NaN × the zeroed
    loss cotangent is NaN — one batched train step would poison every
    parameter through the mean-over-streams gradient.
    """
    if mask is None:
        return jnp.max(x, axis=0)
    v = jnp.max(jnp.where(mask[:, None], x, -jnp.inf), axis=0)
    return jnp.where(jnp.any(mask), v, 0.0)


class Track4D(nn.Module):
    """Flagship model. One instance == reference Track4D(args)."""
    npoint: int = 512
    k_max: int = 32
    feat_dim: int = 128
    gru_layers: int = 5
    min_obj_points: int = 2
    dbscan_eps: float = 1.5
    dbscan_max_iters: int = 64
    sinkhorn_iters: int = 500
    sinkhorn_tol: float = 0.0
    sinkhorn_alpha: float = 0.9   # track4d.py:167 passes fixed 0.9
    match_conf_thres: float = 0.01
    mov_thres: float = 0.5
    mov_budget: int = 0           # >0: compact moving pts before DBSCAN
    exact_fps: bool = False
    dtype: Any = jnp.float32
    fused_eval: bool = True   # Pallas fused SA scales on the eval path
    fused_train: bool = True  # custom-VJP fused SA/correlator train path

    def setup(self):
        self.pn_head = PNHead(self.npoint, self.exact_fps, self.dtype,
                              self.fused_eval, self.fused_train)
        self.fc_layer = FeatureCorrelator(16, (256, 256, 256), self.dtype,
                                          self.fused_eval,
                                          self.fused_train)
        self.fd_layer = FlowDecoder(self.npoint, self.feat_dim,
                                    self.gru_layers, self.exact_fps,
                                    self.dtype, self.fused_eval,
                                    self.fused_train)
        self.affinity = Affinity(141, self.dtype)
        # registered-but-unused learnable bin score, as in the reference
        # (track4d.py:41-42 registers it; :167 uses the constant 0.9).
        self.bin_score = self.param("bin_score",
                                    lambda key: jnp.ones((), jnp.float32))

    # ---- stage methods -----------------------------------------------------
    # The per-frame step splits into temporally-independent stages
    # (frame_stage, output_stage, affinity_stage — batchable over B×T by
    # the pipelined eval path) and the serial carries (GRU via gru_stage,
    # ID assignment via tracker.association.assign_ids).

    def head_stage(self, pc: jnp.ndarray, ft: jnp.ndarray,
                   mask: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """ONE cloud through the PNHead backbone → (N, 128) local features.

        In eval mode (frozen BN) this is a pure function of (params,
        cloud): frame t's pc2 is frame t-1's pc1 whenever the stream is
        contiguous, so scan drivers carry this result forward instead of
        recomputing it (make_scan_eval_step_cached) — the reference
        recomputes PNHead(pc2) every frame (track4d.py:102-106)."""
        _, f = self.pn_head(pc, ft, mask, train)
        return f

    def _frame_stage_from_heads(self, frame: FrameBatch, f1: jnp.ndarray,
                                f2: jnp.ndarray, train: bool):
        """Cost volume + decoder pre-GRU given both clouds' head features."""
        m1, m2 = frame.mask1, frame.mask2
        g1 = jnp.broadcast_to(_masked_max(f1, m1), f1.shape)
        g2 = jnp.broadcast_to(_masked_max(f2, m2), f2.shape)
        f1 = jnp.concatenate([f1, g1], axis=-1)   # (N, 256) local‖global
        f2 = jnp.concatenate([f2, g2], axis=-1)
        cor = self.fc_layer(frame.pc1, frame.pc2, f1, f2, m1, m2, train)
        return self.fd_layer.pre_gru(frame.pc1, frame.ft1, f1, cor, m1,
                                     train)

    def frame_stage(self, frame: FrameBatch, train: bool = True):
        """Everything before the GRU: (cls (N,), prop (N,128),
        gfeat_in (128,)). Reference track4d.py:67-106 minus the GRU."""
        f1 = self.head_stage(frame.pc1, frame.ft1, frame.mask1, train)
        f2 = self.head_stage(frame.pc2, frame.ft2, frame.mask2, train)
        return self._frame_stage_from_heads(frame, f1, f2, train)

    def gru_stage(self, gfeat_in: jnp.ndarray, h: jnp.ndarray):
        """One GRU step (the decoder's sole temporal dependency)."""
        return self.fd_layer.gru_apply(gfeat_in, h)

    def output_stage(self, frame: FrameBatch, cls, prop, gfeat_out,
                     frame_idx, train: bool = True):
        """Flow + clustering + descriptors + GT match for one frame
        (track4d.py:53-57,108-126). No temporal state."""
        flow = self.fd_layer.post_gru(prop, gfeat_out, frame.mask1, train)
        warp = frame.pc1 + flow
        feats = jnp.concatenate(
            [warp, frame.pc1, flow, frame.ft1, prop], axis=-1)  # (N, 139)
        feats = feats.astype(jnp.float32)

        mov = (cls > self.mov_thres) & frame.mask1
        db_in = jnp.concatenate([feats[:, 3:9], feats[:, 10:12]], axis=-1)
        if 0 < self.mov_budget < db_in.shape[0]:
            labels = compact_dbscan(db_in, mov, cls, self.mov_budget,
                                    self.dbscan_eps, self.min_obj_points,
                                    self.dbscan_max_iters)
        else:
            labels = dbscan(db_in, mov, self.dbscan_eps,
                            self.min_obj_points, self.dbscan_max_iters)
        labels = jnp.where(labels < self.k_max, labels, -1)

        desc, curr_valid, sizes, _ = cluster_descriptors(
            feats, labels, self.k_max)
        curr_gt = greedy_gt_match(labels, frame.gt_dense,
                                  frame.gt_label_ids, frame.gt_valid,
                                  self.k_max, frame_idx)
        return dict(flow=flow, warp=warp, feats=feats, labels=labels,
                    desc=desc, curr_valid=curr_valid, sizes=sizes,
                    curr_gt=curr_gt,
                    n=jnp.sum(curr_valid.astype(jnp.int32)))

    def affinity_stage(self, desc_prev: jnp.ndarray,
                       desc_curr: jnp.ndarray) -> jnp.ndarray:
        """(K_prev, K_curr) affinity on descriptor differences."""
        diff = desc_curr[None, :, :] - desc_prev[:, None, :]
        return self.affinity(diff)

    # ---- full step: forward + clustering + association ----
    def __call__(self, frame: FrameBatch, state: TrackState,
                 train: bool = True) -> Tuple[Dict[str, jnp.ndarray],
                                              TrackState]:
        f1 = self.head_stage(frame.pc1, frame.ft1, frame.mask1, train)
        f2 = self.head_stage(frame.pc2, frame.ft2, frame.mask2, train)
        return self._step_from_heads(frame, state, f1, f2, train)

    def step_cached(self, frame: FrameBatch, state: TrackState,
                    f2_local: jnp.ndarray, train: bool = False):
        """Full step with the pc2 head carried from the previous frame.

        Eval-only: valid when pc2 is bit-identical to the previous frame's
        pc1 (contiguous stream, frozen BN). Returns (outputs, new_state,
        f1_local) so the caller can carry f1 forward as the next f2.
        Under training semantics the reference recomputes PNHead(pc2)
        with CURRENT (per-frame-updated) params, so caching would be
        stale — drivers only use this in eval."""
        f1 = self.head_stage(frame.pc1, frame.ft1, frame.mask1, train)
        out, new_state = self._step_from_heads(frame, state, f1, f2_local,
                                               train)
        return out, new_state, f1

    def _step_from_heads(self, frame: FrameBatch, state: TrackState,
                         f1: jnp.ndarray, f2: jnp.ndarray, train: bool):
        # sequence-boundary reset (main_utils.py:70-74); next_id carries on
        state = reset_where(frame.new_seq, state,
                            init_state(self.k_max, self.gru_layers,
                                       self.feat_dim))

        cls, prop, gfeat_in = self._frame_stage_from_heads(frame, f1, f2,
                                                           train)
        gfeat_out, h_new = self.gru_stage(gfeat_in, state.h)
        o = self.output_stage(frame, cls, prop, gfeat_out, state.frame_idx,
                              train)
        m = jnp.sum(state.valid.astype(jnp.int32))
        n = o["n"]
        aff = self.affinity_stage(state.desc, o["desc"])
        res = associate(aff, m, n, state.track_id, state.next_id,
                        jnp.float32(self.sinkhorn_alpha),
                        self.sinkhorn_iters, self.match_conf_thres,
                        sinkhorn_tol=self.sinkhorn_tol)

        new_state = TrackState(
            h=h_new,
            # main_utils.py:158-161 detach
            desc=jax.lax.stop_gradient(o["desc"]),
            valid=o["curr_valid"],
            track_id=res.track_id,
            gt_id=o["curr_gt"],
            next_id=res.next_id,
            frame_idx=state.frame_idx + 1,
        )
        outputs = dict(
            flow=o["flow"], warp=o["warp"], cls=cls, feats=o["feats"],
            labels=o["labels"], track_id=res.track_id, conf=res.conf,
            aff=aff, m=m, n=n, sizes=o["sizes"],
            prev_gt_id=state.gt_id, prev_valid=state.valid,
            curr_gt_id=o["curr_gt"], curr_valid=o["curr_valid"],
        )
        return outputs, new_state


def model_from_config(cfg) -> Track4D:
    return Track4D(
        npoint=cfg.npoints, k_max=cfg.k_max, feat_dim=cfg.feat_dim,
        gru_layers=cfg.gru_layers, min_obj_points=cfg.min_obj_points,
        dbscan_eps=cfg.dbscan_eps, dbscan_max_iters=cfg.dbscan_max_iters,
        sinkhorn_iters=cfg.sinkhorn_iters, sinkhorn_alpha=cfg.sinkhorn_alpha,
        sinkhorn_tol=cfg.sinkhorn_tol,
        match_conf_thres=cfg.match_conf_thres, mov_thres=cfg.mov_thres,
        mov_budget=cfg.mov_budget, exact_fps=cfg.exact_fps,
        fused_eval=cfg.fused_sa,
        dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32,
    )
