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
    """Reference FlowDecoder.forward (model_utils.py:281-305).

    Split into three stage methods so the pipelined eval path
    (train/step.py:make_pipelined_eval_step) can batch the heavy
    per-frame stages over B×T and keep only `gru_apply` in the temporal
    scan — the GRU carry is the decoder's sole serial dependency.
    """
    npoint: int
    feat_dim: int = 128
    gru_layers: int = 5
    exact_fps: bool = False
    dtype: jnp.dtype = jnp.float32
    fused_eval: bool = True
    fused_train: bool = True

    def setup(self):
        self.cp = ClsPredictor(dtype=self.dtype)
        self.mse = PNHead(self.npoint, self.exact_fps, self.dtype,
                          self.fused_eval, self.fused_train)
        self.gru = StackedGRU(self.feat_dim, self.gru_layers, self.dtype)
        self.fp = FlowPredictor(dtype=self.dtype)

    def pre_gru(self, pc1, ft1, pc1_feats, cor_feats, mask1=None,
                train: bool = True):
        """Per-frame (no temporal state): (cls (N,), prop (N,128),
        gfeat_in (128,))."""
        cls = self.cp(cor_feats, mask=mask1, train=train)
        emb = jnp.concatenate([ft1, pc1_feats, cor_feats], axis=-1)
        _, prop = self.mse(pc1, emb, mask1, train)
        # global feature: masked max over valid points. All-invalid frames
        # (dp-padding) must yield a FINITE feature: -inf here becomes NaN
        # downstream, and NaN x zero-loss-cotangent poisons the gradients
        # of every stream in a batched step.
        if mask1 is not None:
            masked = jnp.where(mask1[:, None], prop, -jnp.inf)
            gfeat_in = jnp.where(jnp.any(mask1),
                                 jnp.max(masked, axis=0), 0.0)
        else:
            gfeat_in = jnp.max(prop, axis=0)                   # (128,)
        return cls, prop, gfeat_in

    def gru_apply(self, gfeat_in, h):
        """One GRU step: (128,), (layers, 128) → (128,), (layers, 128)."""
        g, h_new = self.gru(gfeat_in[None, :], h[:, None, :])
        return g[0], h_new[:, 0, :]

    def post_gru(self, prop, gfeat_out, mask1=None, train: bool = True):
        """Per-point flow from propagated + GRU-global features."""
        g = jnp.broadcast_to(gfeat_out, (prop.shape[0], self.feat_dim))
        return self.fp(jnp.concatenate([prop, g], axis=-1), mask=mask1,
                       train=train)

    def __call__(self, pc1, ft1, pc1_feats, cor_feats, h, mask1=None,
                 train: bool = True):
        """Returns (flow (N,3), h' (layers,128), prop (N,128), cls (N,))."""
        cls, prop, gfeat_in = self.pre_gru(pc1, ft1, pc1_feats, cor_feats,
                                           mask1, train)
        gfeat_out, h_new = self.gru_apply(gfeat_in, h)
        flow = self.post_gru(prop, gfeat_out, mask1, train)
        return flow, h_new, prop, cls
