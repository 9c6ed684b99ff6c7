"""Fused farthest-point-sampling Pallas kernel.

TPU counterpart of the reference's flagship CUDA kernel —
furthest_point_sampling with its block-parallel argmax reduction
(`src/lib/src/sampling_gpu.cu:94-251`). The XLA formulation in
ops/sampling.py lowers the npoint-iteration selection loop to
2·npoint tiny fusions (distance-update + argmax) whose ~4 µs
per-launch overhead dominates: ~8 ms of a profiled 8k-train trace
(tools/profile_train_ops.py, `multiply_reduce_fusion` ×1022). This
kernel runs the SAME sequential loop inside one program with the
running min-distance rows resident in vector registers.

Batching is vectorized INSIDE the single program — all B streams'
(B, N) rows advance together each iteration with per-row (keepdims)
reduces — NOT via the kernel grid: a grid serializes B×npoint
iterations and measured SLOWER than the batched XLA loop at the live
(512, B=8) shape (4.6 vs 3.5 ms), while this formulation amortizes the
serialized reduce/extract latency chains across streams (measured
0.6 ms at that shape; 2.4 vs 5.3 ms at 8192×512 B=1).

Exact-parity notes (pinned by tests vs the XLA path and the NumPy
oracle):
  * identical op order for the distance — (x-cx)² + (y-cy)² + (z-cz)²,
    f32 — so near-tie selections match bitwise;
  * argmax's first-max tie rule via the min-id extraction (Mosaic has
    no fast argmax): m = max(temp); id = min(where(temp == m, iota,
    BIG)) — exactly jnp.argmax's lowest-index-of-max;
  * seed at the first valid index (reference seeds raw index 0,
    sampling_gpu.cu:113-115; with tail padding these coincide), 0 when
    nothing is valid — identical to jnp.argmax(mask);
  * invalid points pinned to -1 so they are never selected while any
    valid point remains; duplicate pattern at npoint > n_valid follows
    (selected points sit at temp == 0, the running max).

Mosaic-specific structure:
  * the selection loop bound rides in as an SMEM scalar so it is
    UNKNOWN at lowering time — a static-trip-count fori_loop would be
    fully unrolled (511 iterations of stack-allocated temporaries);
  * each winner's coordinates are extracted with per-row masked sums
    (no dynamic lane indexing);
  * the output rows are a loop-carried (B, npoint) f32 value written
    via one-hot jnp.where (no dynamic_update_slice on values), cast to
    int32 once at the end;
  * streams reach the batched program via custom_vmap (plain vmap
    trips batched tiling rules).

Indices only — no VJP (integer outputs, like the reference CUDA op);
the wrapper stops gradients at the kernel boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e10


def _fps_kernel(xb_ref, yb_ref, zb_ref, maskf_ref, nlim_ref, out_ref, *,
                npoint: int):
    maskf = maskf_ref[...]                              # (B, n)
    b, n = maskf.shape
    xs = xb_ref[...]
    ys = yb_ref[...]
    zs = zb_ref[...]
    valid = maskf > 0.0
    # tpu.iota must be integer (Mosaic); ids carried as exact f32
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, n),
                                    1).astype(jnp.float32)
    np_iota = jax.lax.broadcasted_iota(jnp.int32, (1, npoint),
                                       1).astype(jnp.float32)

    def coord(sel, v):
        return jnp.sum(jnp.where(sel, v, 0.0), axis=1, keepdims=True)

    seed = jnp.min(jnp.where(valid, iota, _BIG), axis=1, keepdims=True)
    seed = jnp.where(seed >= _BIG, 0.0, seed)           # no valid → 0
    sel0 = iota == seed                                 # (B, n)
    temp0 = jnp.where(valid, jnp.float32(1e10), jnp.float32(-1.0))
    out0 = jnp.where(np_iota == 0.0, seed, 0.0)         # (B, npoint)

    def body(j, carry):
        temp, cx, cy, cz, out = carry
        dx = xs - cx
        dy = ys - cy
        dz = zs - cz
        d = dx * dx + dy * dy + dz * dz
        temp = jnp.where(valid, jnp.minimum(temp, d), -1.0)
        m = jnp.max(temp, axis=1, keepdims=True)
        newid = jnp.min(jnp.where(temp == m, iota, _BIG), axis=1,
                        keepdims=True)
        out = jnp.where(np_iota == j.astype(jnp.float32), newid, out)
        sel = iota == newid
        return (temp, coord(sel, xs), coord(sel, ys), coord(sel, zs),
                out)

    init = (temp0, coord(sel0, xs), coord(sel0, ys), coord(sel0, zs),
            out0)
    carry = jax.lax.fori_loop(1, nlim_ref[0], body, init)
    out_ref[...] = carry[4].astype(jnp.int32)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _full():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def _make_core(n: int, npoint: int, interpret: bool):
    """Build the (batched) kernel entry for one static (n, npoint)."""
    np_pad = _round_up(npoint, 128)

    def _run(b, xb, yb, zb, maskfb):
        nlim = jnp.full((1,), npoint, jnp.int32)
        out = pl.pallas_call(
            functools.partial(_fps_kernel, npoint=np_pad),
            in_specs=[_full()] * 4
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=_full(),
            out_shape=jax.ShapeDtypeStruct((b, np_pad), jnp.int32),
            interpret=interpret,
        )(xb, yb, zb, maskfb, nlim)
        return out[:, :npoint]

    def _bcast(x, batched, b):
        return x if batched else jnp.broadcast_to(x[None], (b,) + x.shape)

    @jax.custom_batching.custom_vmap
    def call(xr, yr, zr, maskf):
        return _run(1, xr[None], yr[None], zr[None], maskf[None])[0]

    @call.def_vmap
    def _vmap(axis_size, in_batched, xr, yr, zr, maskf):
        b = axis_size
        args = [_bcast(x, bt, b) for x, bt in
                zip((xr, yr, zr, maskf), in_batched)]
        return _run(b, *args), True

    return call


def fps_indices_fused(xyz: jnp.ndarray, npoint: int,
                      mask: jnp.ndarray | None = None, *,
                      interpret: bool | None = None) -> jnp.ndarray:
    """(N, 3) points → (npoint,) int32 FPS indices, whole loop fused.

    Drop-in for the XLA loop in ops.sampling.furthest_point_sample
    (same selection, bit-matched distances); requires N % 128 == 0.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = xyz.shape[0]
    if n % 128 != 0:
        raise ValueError(f"fps_indices_fused: N={n} not lane-aligned")
    xyz = jax.lax.stop_gradient(jnp.asarray(xyz, jnp.float32))
    maskf = (jnp.ones((n,), jnp.float32) if mask is None
             else mask.astype(jnp.float32))
    return _make_core(n, int(npoint), bool(interpret))(
        xyz[:, 0], xyz[:, 1], xyz[:, 2], maskf)
