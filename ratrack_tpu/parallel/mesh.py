"""Device mesh + sharding helpers.

Parallelism design (SURVEY.md §2.3): the reference's only parallelism is a
nominal single-process nn.DataParallel (src/models/model.py:38-40) that
never splits work at batch_size=1. The TPU-native equivalent is data
parallelism over *independent clip streams*: the clip-batch axis is sharded
over the 'dp' mesh axis, parameters are replicated, and the mean-over-clips
loss makes XLA insert the gradient all-reduce (psum) over ICI — the
collective DataParallel implied.

Frames within a clip are serially dependent (GRU hidden + prev-object
state) and cannot be parallelized; throughput scales by adding clips, which
is how `bench.py` and the multi-clip streaming config (BASELINE config 5)
are shaped. TP/PP/EP do not apply at this model size (~3M params).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None) -> Mesh:
    devs = jax.devices()
    dp = dp or len(devs)
    if dp > len(devs):
        raise ValueError(f"dp={dp} > available devices {len(devs)}")
    return Mesh(np.array(devs[:dp]), ("dp",))


def shard_clips(mesh: Mesh, tree):
    """Place a pytree with leading clip-batch axis sharded over 'dp'.

    The clip-batch must divide evenly over the mesh: padding silently
    would corrupt the mean-over-streams loss (inactive pad streams would
    enter the gradient), so a non-divisible batch is an explicit error —
    the caller drops or pads streams with full knowledge (the epoch
    drivers in main.py group streams in dp-sized blocks).
    """
    dp = mesh.shape["dp"]
    b = jax.tree_util.tree_leaves(tree)[0].shape[0]
    if b % dp != 0:
        raise ValueError(
            f"clip batch {b} does not divide over dp={dp}; drop or pad "
            f"streams to a multiple of dp before sharding")

    def put(x):
        spec = P("dp", *([None] * (x.ndim - 1))) if x.ndim > 0 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (parameters) across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
