"""Cost-volume feature correlator (point-to-patch + patch-to-patch).

Reference: FeatureCorrelator (`src/utils/model_utils/model_utils.py:166-250`).
  1. kNN(nsample) of pc1 in pc2; concat [f1 tiled, f2 grouped, direction];
     MLP (no BN, LeakyReLU 0.1); WeightNet(direction)-weighted sum over
     neighbors (unnormalized).
  2. kNN(nsample) of pc1 in pc1; WeightNet-weighted sum of step-1 features
     over self-neighborhood.

The reference's `knn_point` materializes the dense N×N distance matrix via
torch.topk; here the same dense form is used (one MXU matmul + top_k) but
masked for padding — at the stretch configs (4k–16k points) this is the op
the Pallas tiled kernel replaces.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import knn_auto as knn, group
from ..ops import morton
from ..ops import pallas_sa
from ..ops.pallas_correlator import (TILE_M, fused_knn_weight_aggregate,
                                     knn_gather_apply)
from ..ops.pallas_correlator_train import fused_knn_weight_aggregate_train
from ..ops.pallas_knn import knn_indices_tiled
from .layers import PointwiseMLP, WeightNet


def _wn_params(wn_vars):
    """WeightNet variables -> ([w...], [b...]) for the fused kernel."""
    p = wn_vars["params"]
    names = ["dense_0", "dense_1", "dense_out"]
    return ([p[n]["kernel"].astype(jnp.float32) for n in names],
            [p[n]["bias"].astype(jnp.float32) for n in names])


class FeatureCorrelator(nn.Module):
    nsample: int = 16
    mlp: Sequence[int] = (256, 256, 256)
    dtype: jnp.dtype = jnp.float32
    fused_eval: bool = True
    fused_train: bool = True

    @nn.compact
    def __call__(self, pc1, pc2, f1, f2, mask1=None, mask2=None,
                 train: bool = True):
        """pc1 (N,3), pc2 (N,3), f1 (N,D1), f2 (N,D2) → (N, mlp[-1])."""
        n = pc1.shape[0]
        mlp_mod = PointwiseMLP(self.mlp, bn=False, act="leaky_relu",
                               dtype=self.dtype, name="mlp")
        wn1 = WeightNet(self.mlp[-1], dtype=self.dtype, name="weightnet1")
        wn2 = WeightNet(self.mlp[-1], dtype=self.dtype, name="weightnet2")

        d1, d2c = f1.shape[-1], f2.shape[-1]
        # n <= 4096: the all-in-VMEM kernel (selection + exact one-hot
        # gathers in one program). Past that its one-hot MXU gathers cost
        # k·N·M·C FLOPs, quadratic in cloud size (measured round 3: 15.1
        # vs 13.9 ms/frame at 8k eval, 51.5 vs 30.0 at 16k) — large
        # clouds instead run the SPLIT formulation `knn_gather_apply`:
        # tiled-kNN selection kernel + ONE XLA row gather per stage +
        # a fused MLP/WeightNet/weighted-sum kernel (round 4).
        fused = (not train and self.fused_eval
                 and pallas_sa.fused_available() and n % TILE_M == 0)
        if fused:
            # materialize identical param trees, then read them for the
            # layer-1 factorization (dummy applies are dead-code removed)
            _ = mlp_mod(jnp.zeros((1, 1, d1 + d2c + 3), self.dtype),
                        train=False)
            _ = wn1(jnp.zeros((1, 1, 3), self.dtype))
            _ = wn2(jnp.zeros((1, 1, 3), self.dtype))
            mp = mlp_mod.variables["params"]
            w1 = mp["dense_0"]["kernel"].astype(jnp.float32)
            b1 = mp["dense_0"]["bias"].astype(jnp.float32)
            w_f1, w_f2, w_dir = w1[:d1], w1[d1:d1 + d2c], w1[d1 + d2c:]
            f1_32 = f1.astype(jnp.float32)
            f2_32 = f2.astype(jnp.float32)
            add_q = f1_32 @ w_f1 - pc1.astype(jnp.float32) @ w_dir
            feats_p = (f2_32 @ w_f2 + pc2.astype(jnp.float32) @ w_dir
                       + b1[None, :])
            mlp_ws = [mp[f"dense_{i}"]["kernel"].astype(jnp.float32)
                      for i in range(1, len(self.mlp))]
            mlp_bs = [mp[f"dense_{i}"]["bias"].astype(jnp.float32)
                      for i in range(1, len(self.mlp))]
            wn1_ws, wn1_bs = _wn_params(wn1.variables)
            wn2_ws, wn2_bs = _wn_params(wn2.variables)
            if n <= 4096:
                cost = fused_knn_weight_aggregate(
                    pc1, pc2, feats_p, add_q, mask2, mlp_ws, mlp_bs,
                    wn1_ws, wn1_bs, k=self.nsample,
                    compute_dtype=self.dtype)
                cost = fused_knn_weight_aggregate(
                    pc1, pc1, cost, None, mask1, [], [], wn2_ws, wn2_bs,
                    k=self.nsample, compute_dtype=self.dtype)
            else:
                interp = jax.default_backend() != "tpu"
                pc1_32 = pc1.astype(jnp.float32)
                pc2_32 = pc2.astype(jnp.float32)
                if morton.SPLIT_SPATIAL_SORT:
                    # Z-order BOTH clouds so the kNN kernel's per-chunk
                    # pruning gate fires (ops/morton.py): query tiles
                    # become spatially compact and most candidate chunks
                    # skip their 2k extraction passes. Row-wise math is
                    # order-independent; only kNN TIE order changes
                    # (lowest sorted index). A/B vs unsorted recorded in
                    # NOTES_ROUND5 (16k eval device ms/frame).
                    perm1 = morton.morton_perm(pc1_32, mask1)
                    perm2 = morton.morton_perm(pc2_32, mask2)
                    gq = lambda a: a[perm1] if a is not None else None
                    gp = lambda a: a[perm2] if a is not None else None
                    pc1_32, add_q, mask1s = gq(pc1_32), gq(add_q), gq(mask1)
                    pc2_32, feats_p, mask2s = gp(pc2_32), gp(feats_p), gp(mask2)
                else:
                    mask1s, mask2s = mask1, mask2
                idx1 = knn_indices_tiled(pc1_32, pc2_32, mask2s,
                                         k=self.nsample, interpret=interp)
                cost = knn_gather_apply(
                    idx1, pc1_32, pc2_32, feats_p, add_q, mlp_ws, mlp_bs,
                    wn1_ws, wn1_bs, k=self.nsample,
                    compute_dtype=self.dtype)
                idx2 = knn_indices_tiled(pc1_32, pc1_32, mask1s,
                                         k=self.nsample, interpret=interp)
                cost = knn_gather_apply(
                    idx2, pc1_32, pc1_32, cost, None, [], [], wn2_ws,
                    wn2_bs, k=self.nsample, compute_dtype=self.dtype)
                if morton.SPLIT_SPATIAL_SORT:
                    # one unsort back to the input row order (in-bounds
                    # by construction — skips the fill-select pass)
                    inv1 = morton.invert_perm(perm1)
                    cost = cost.at[inv1].get(mode="promise_in_bounds")
            return cost.astype(self.dtype)

        # TRAIN path: both stages as custom-VJP fused kernels
        # (ops/pallas_correlator_train.py) — the 256-channel grouped
        # gathers and their HIGHEST scatter-add backwards were the
        # second-largest block of the profiled train step
        fused_t = (train and self.fused_train
                   and pallas_sa.fused_available()
                   and n % 128 == 0 and n <= 1024)
        if fused_t:
            _ = mlp_mod(jnp.zeros((1, 1, d1 + d2c + 3), self.dtype),
                        train=False)
            _ = wn1(jnp.zeros((1, 1, 3), self.dtype))
            _ = wn2(jnp.zeros((1, 1, 3), self.dtype))
            mp = mlp_mod.variables["params"]
            w1 = mp["dense_0"]["kernel"].astype(jnp.float32)
            b1 = mp["dense_0"]["bias"].astype(jnp.float32)
            w_f1, w_f2, w_dir = w1[:d1], w1[d1:d1 + d2c], w1[d1 + d2c:]
            # HIGHEST hoists: the absolute-coordinate Wdir terms cancel
            # only inside the kernel's add — a bf16-pass rounding here
            # would dwarf the pair-relative values
            hp = jax.lax.Precision.HIGHEST
            f1_32 = f1.astype(jnp.float32)
            f2_32 = f2.astype(jnp.float32)
            # coordinate term stays OUT of the hoists: the kernel adds
            # dir @ W_dir from its exact gathered directions, so the
            # bf16 feature gather never rounds absolute coordinates
            add_q = jnp.dot(f1_32, w_f1, precision=hp)
            feats_p = jnp.dot(f2_32, w_f2, precision=hp) + b1[None, :]
            mlp_ws = [mp[f"dense_{i}"]["kernel"].astype(jnp.float32)
                      for i in range(1, len(self.mlp))]
            mlp_bs = [mp[f"dense_{i}"]["bias"].astype(jnp.float32)
                      for i in range(1, len(self.mlp))]
            wn1_ws, wn1_bs = _wn_params(wn1.variables)
            wn2_ws, wn2_bs = _wn_params(wn2.variables)
            cost = fused_knn_weight_aggregate_train(
                pc1, pc2, feats_p, add_q, mask2, mlp_ws, mlp_bs,
                wn1_ws, wn1_bs, w_dir=w_dir, k=self.nsample)
            cost = fused_knn_weight_aggregate_train(
                pc1, pc1, cost, None, mask1, [], [], wn2_ws, wn2_bs,
                k=self.nsample)
            return cost.astype(self.dtype)

        # --- point-to-patch cost volume over pc2 ---
        _, idx = knn(self.nsample, pc1, pc2, mask2)          # (N, S)
        nbr_xyz = group(pc2, idx)                            # (N, S, 3)
        direction = nbr_xyz - pc1[:, None, :]                # (N, S, 3)
        g2 = group(f2, idx)                                  # (N, S, D2)
        g1 = jnp.broadcast_to(f1[:, None, :],
                              (n, self.nsample, f1.shape[-1]))
        feat = jnp.concatenate([g1, g2, direction], axis=-1)
        feat = mlp_mod(feat, train=train)
        w1 = wn1(direction)
        cost = jnp.sum(w1 * feat, axis=1)                    # (N, C)

        # --- patch-to-patch smoothing over pc1 ---
        _, idx_s = knn(self.nsample, pc1, pc1, mask1)
        nbr_xyz = group(pc1, idx_s)
        direction = nbr_xyz - pc1[:, None, :]
        w2 = wn2(direction)
        cost = jnp.sum(w2 * group(cost, idx_s), axis=1)      # (N, C)
        return cost
