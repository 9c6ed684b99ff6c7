"""Flow decoder: motion classification + embedding propagation + GRU + flow.

Reference: FlowDecoder / FlowPredictor / ClsPredictor
(`src/utils/model_utils/model_utils.py:253-357`).

Channel flow (fc_inch = 256):
  cls        = ClsPredictor(cor_features 256) → (N,) moving prob
  embeddings = [ft1 (2) ‖ pc1_feats (256) ‖ cor (256)] = 514 → PNHead → 128
  gfeat      = masked max over points (128) → 5-layer GRU(128) → 128
  flow       = FlowPredictor([prop ‖ gfeat] = 256) → (N, 3)
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from .layers import PointwiseMLP, StackedGRU
from .pnhead import PNHead


class FlowPredictor(nn.Module):
    """Conv stack [128,64,32] (BN+ReLU) → Conv(→3), reference model_utils.py:308-329."""
    mlp: Sequence[int] = (128, 64, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, mask=None, train: bool = True):
        h = PointwiseMLP(self.mlp, bn=True, dtype=self.dtype,
                         name="mlp")(feat, mask=mask, train=train)
        return nn.Dense(3, use_bias=False, dtype=self.dtype, name="out")(h)


class ClsPredictor(nn.Module):
    """Conv stack → Conv(→3) → Linear(3→1) → sigmoid, reference model_utils.py:332-357."""
    mlp: Sequence[int] = (128, 64, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, mask=None, train: bool = True):
        h = PointwiseMLP(self.mlp, bn=True, dtype=self.dtype,
                         name="mlp")(feat, mask=mask, train=train)
        h = nn.Dense(3, use_bias=False, dtype=self.dtype, name="conv_out")(h)
        h = nn.Dense(1, dtype=self.dtype, name="linear")(h)
        return nn.sigmoid(h)[..., 0]


class FlowDecoder(nn.Module):
    """Reference FlowDecoder.forward (model_utils.py:281-305)."""
    npoint: int
    feat_dim: int = 128
    gru_layers: int = 5
    exact_fps: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pc1, ft1, pc1_feats, cor_feats, h, mask1=None,
                 train: bool = True):
        """Returns (flow (N,3), h' (layers,128), prop (N,128), cls (N,))."""
        cls = ClsPredictor(dtype=self.dtype, name="cp")(
            cor_feats, mask=mask1, train=train)

        emb = jnp.concatenate([ft1, pc1_feats, cor_feats], axis=-1)
        _, prop = PNHead(self.npoint, self.exact_fps, self.dtype,
                         name="mse")(pc1, emb, mask1, train)

        # global feature: masked max over valid points
        if mask1 is not None:
            masked = jnp.where(mask1[:, None], prop, -jnp.inf)
        else:
            masked = prop
        gfeat = jnp.max(masked, axis=0)                        # (128,)
        gfeat, h_new = StackedGRU(self.feat_dim, self.gru_layers,
                                  self.dtype, name="gru")(gfeat[None, :],
                                                          h[:, None, :])
        h_new = h_new[:, 0, :]
        gfeat = jnp.broadcast_to(gfeat[0], (prop.shape[0], self.feat_dim))
        flow = FlowPredictor(dtype=self.dtype, name="fp")(
            jnp.concatenate([prop, gfeat], axis=-1), mask=mask1, train=train)
        return flow, h_new, prop, cls
