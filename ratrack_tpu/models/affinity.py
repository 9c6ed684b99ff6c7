"""Affinity MLP over object-descriptor differences.

Reference: Affinity (`src/models/track4d.py:226-246`) — Linear chain
141 → 564 → 282 → 70 → 35 → 1 with ReLU, sigmoid output, applied to
(curr_descriptor − prev_descriptor).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


class Affinity(nn.Module):
    emb_dims: int = 141
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, diff: jnp.ndarray) -> jnp.ndarray:
        """diff (..., emb_dims) → (...,) affinity in (0, 1)."""
        e = self.emb_dims
        x = diff
        for i, f in enumerate([e * 4, e * 2, e // 2, e // 4]):
            x = nn.relu(nn.Dense(f, dtype=self.dtype, name=f"dense_{i}")(x))
        x = nn.Dense(1, dtype=self.dtype, name="dense_out")(x)
        return nn.sigmoid(x)[..., 0]
