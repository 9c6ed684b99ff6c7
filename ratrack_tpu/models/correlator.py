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

import jax.numpy as jnp
import flax.linen as nn

from ..ops import knn_auto as knn, group
from .layers import PointwiseMLP, WeightNet


class FeatureCorrelator(nn.Module):
    nsample: int = 16
    mlp: Sequence[int] = (256, 256, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pc1, pc2, f1, f2, mask1=None, mask2=None,
                 train: bool = True):
        """pc1 (N,3), pc2 (N,3), f1 (N,D1), f2 (N,D2) → (N, mlp[-1])."""
        n = pc1.shape[0]

        # --- point-to-patch cost volume over pc2 ---
        _, idx = knn(self.nsample, pc1, pc2, mask2)          # (N, S)
        nbr_xyz = group(pc2, idx)                            # (N, S, 3)
        direction = nbr_xyz - pc1[:, None, :]                # (N, S, 3)
        g2 = group(f2, idx)                                  # (N, S, D2)
        g1 = jnp.broadcast_to(f1[:, None, :],
                              (n, self.nsample, f1.shape[-1]))
        feat = jnp.concatenate([g1, g2, direction], axis=-1)
        feat = PointwiseMLP(self.mlp, bn=False, act="leaky_relu",
                            dtype=self.dtype, name="mlp")(feat, train=train)
        w1 = WeightNet(self.mlp[-1], dtype=self.dtype,
                       name="weightnet1")(direction)
        cost = jnp.sum(w1 * feat, axis=1)                    # (N, C)

        # --- patch-to-patch smoothing over pc1 ---
        _, idx_s = knn(self.nsample, pc1, pc1, mask1)
        nbr_xyz = group(pc1, idx_s)
        direction = nbr_xyz - pc1[:, None, :]
        w2 = WeightNet(self.mlp[-1], dtype=self.dtype,
                       name="weightnet2")(direction)
        cost = jnp.sum(w2 * group(cost, idx_s), axis=1)      # (N, C)
        return cost
