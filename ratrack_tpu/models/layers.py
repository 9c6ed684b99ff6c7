"""Core neural building blocks: masked batch norm, pointwise MLPs, GRU stack.

These are channels-last re-designs of the reference's Conv2d(1x1)+BN2d
stacks (`src/lib/pytorch_utils.py:5-33`, SharedMLP): a 1x1 conv over a
points axis is just a Dense over the channel axis, which XLA maps straight
onto the MXU as one large (positions × channels) matmul.

Masked batch norm: the reference normalizes over all point positions; with
fixed-shape padding we must exclude pad positions from the statistics or
they would bias mean/var. `MaskedBatchNorm` computes masked moments and
keeps torch-style running stats (momentum 0.1, eps 1e-5, unbiased running
variance).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all non-channel axes with an optional validity mask.

    Equivalent to torch BatchNorm2d on (1, C, *spatial) when mask is None.
    """
    momentum: float = 0.1
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None,
                 use_running_average: bool = False,
                 override_stats=None) -> jnp.ndarray:
        """`override_stats=(mean, var, count)` feeds externally computed
        batch statistics (e.g. from a fused train kernel that never
        materializes the normalized tensor here): normalization of `x`
        and the running-average update use them instead of moments of
        `x`. Ignored when `use_running_average` is set."""
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        elif override_stats is not None:
            mean, var, count = override_stats
            mean = mean.astype(jnp.float32)
            var = jnp.maximum(var.astype(jnp.float32), 0.0)
            count = jnp.asarray(count, jnp.float32)
            if not self.is_initializing():
                unbias = count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * var * unbias)
        else:
            xf = x.astype(jnp.float32)
            red = tuple(range(x.ndim - 1))
            if mask is None:
                import math
                n = float(math.prod(x.shape[:-1]))
                mean = jnp.mean(xf, axis=red)
                var = jnp.mean(jnp.square(xf), axis=red) - jnp.square(mean)
                count = jnp.asarray(n, jnp.float32)
            else:
                m = mask.astype(jnp.float32)
                while m.ndim < x.ndim:
                    m = m[..., None]
                count = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(xf * m, axis=red) / count
                var = jnp.sum(jnp.square(xf) * m, axis=red) / count \
                    - jnp.square(mean)
            var = jnp.maximum(var, 0.0)
            if not self.is_initializing():
                # torch-style running stats with unbiased variance
                unbias = count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * var * unbias)

        inv = jax.lax.rsqrt(var + self.eps) * scale
        out = (x.astype(jnp.float32) - mean) * inv + bias
        return out.astype(self.dtype)


class PointwiseMLP(nn.Module):
    """Stack of Dense(+BN)(+act) over the channel axis.

    Reference SharedMLP (pytorch_utils.py:5-33): Conv2d 1x1 (bias off when
    BN on) → BatchNorm2d → ReLU per layer.
    """
    features: Sequence[int]
    bn: bool = True
    act: str = "relu"         # "relu" | "leaky_relu" | "none"
    last_act: bool = True     # apply act after final layer too
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True,
                 override_stats=None):
        """`override_stats=(means, vars, count)` registers externally
        computed per-layer batch statistics on each BN's running
        averages (fused-train path); `x` should then be a dummy of the
        right channel count — the returned activations are meaningless
        and the caller uses the fused kernel's output instead."""
        n_layers = len(self.features)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, use_bias=not self.bn, dtype=self.dtype,
                         name=f"dense_{i}")(x)
            if self.bn:
                ov = None
                if override_stats is not None:
                    ov = (override_stats[0][i], override_stats[1][i],
                          override_stats[2])
                x = MaskedBatchNorm(dtype=self.dtype, name=f"bn_{i}")(
                    x, mask=mask, use_running_average=not train,
                    override_stats=ov)
            if self.last_act or i < n_layers - 1:
                if self.act == "relu":
                    x = nn.relu(x)
                elif self.act == "leaky_relu":
                    x = nn.leaky_relu(x, negative_slope=0.1)
        return x


class WeightNet(nn.Module):
    """Direction → aggregation weights MLP.

    Reference WeightNet (model_utils.py:359-390): Conv2d chain 3→8→8→out,
    plain ReLU after every layer (bn=False in the live path).
    """
    out_dim: int
    hidden: Sequence[int] = (8, 8)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, d):
        for i, h in enumerate(self.hidden):
            d = nn.relu(nn.Dense(h, dtype=self.dtype, name=f"dense_{i}")(d))
        return nn.relu(nn.Dense(self.out_dim, dtype=self.dtype,
                                name="dense_out")(d))


class GRUCell(nn.Module):
    """Single GRU cell with torch gate semantics.

    r = σ(W_ir x + b_ir + W_hr h + b_hr)
    z = σ(W_iz x + b_iz + W_hz h + b_hz)
    n = tanh(W_in x + b_in + r ⊙ (W_hn h + b_hn))
    h' = (1 - z) ⊙ n + z ⊙ h
    """
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h):
        gi = nn.Dense(3 * self.hidden, dtype=self.dtype, name="ih")(x)
        gh = nn.Dense(3 * self.hidden, dtype=self.dtype, name="hh")(h)
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = nn.sigmoid(i_r + h_r)
        z = nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h


class StackedGRU(nn.Module):
    """`num_layers` stacked GRU cells applied to a single time step.

    Reference: nn.GRU(128, 128, num_layers=5) driven with seq_len=1
    (model_utils.py:279,294-297). Hidden state shape here: (layers, hidden).
    """
    hidden: int
    num_layers: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h):
        outs = []
        inp = x
        for l in range(self.num_layers):
            new_h = GRUCell(self.hidden, dtype=self.dtype,
                            name=f"cell_{l}")(inp, h[l])
            outs.append(new_h)
            inp = new_h
        return inp, jnp.stack(outs, axis=0)
