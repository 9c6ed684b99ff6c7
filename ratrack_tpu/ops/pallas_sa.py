"""Fused set-abstraction scale: ball query + group + MLP + max-pool.

One VMEM-resident Pallas kernel per SA scale replacing the eval-path chain

    idx = ball_query(r, ns, xyz, centers, mask)        # XLA: full sort
    g   = concat([xyz[idx] - centers, features[idx]])  # XLA: row gathers
    g   = relu(BN(Dense(g))) x L                       # XLA: small fusions
    out = max over samples

(reference CUDA chain: ball_query_gpu.cu:9-46 + group_points_gpu.cu:8-86 +
SharedMLP pytorch_utils.py:5-33 + max-pool, launched per SA scale from
pointnet2_modules.py:58-94). Profiled on v5e, that chain is ~28% sort and
~50% gather-bound fusions of the whole tracking step; the MXU sits idle.

TPU-native formulation (no sort, no gather):

  * the CUDA "first nsample points within radius, in index order" selection
    is a dense boolean mask: hit = d2 < r2 (valid points only) and
    rank = inclusive-prefix-count(hit) along the point axis; the point in
    sample slot s is the one with rank == s+1. The prefix count is a 0/1
    upper-triangular matmul (f32 accumulation --> exact).
  * slot gathering is a one-hot matmul: G[s] = (rank == s+1 & hit) @ P1.
    0/1 one-hot times values accumulates exactly one product per output,
    so the gather is exact at the operand dtype even at default MXU
    precision.
  * layer 1 of the shared MLP factorizes through the pair structure:
    W1 @ concat([x_j - c_i, f_j]) = (X @ W1_xyz + F @ W1_feat + b1)_j
    - (C @ W1_xyz)_i = P1_j - CW_i. P1 (N, C1) and CW (M, C1) are two
    small hoisted XLA matmuls; the kernel only ever materializes the
    compacted (nsample, TILE_M, C) slot tensor in VMEM.
  * remaining MLP layers run on the MXU over (nsample*TILE_M, C) tiles;
    the slot-masked max never leaves VMEM and reduces over the *leading*
    axis (plain elementwise maximums, no cross-lane shuffles).
  * eval-mode batch norm folds into the Dense weights (fold_bn_params), so
    each layer is matmul + bias + relu.
  * CUDA padding parity: slots past the hit count repeat the first hit -->
    max-pool unchanged (slots past hits are masked here); no hit at all
    --> index 0 --> the kernel computes the pair (center, point 0) value
    as the fallback (ball_query_gpu.cu zero-init + first-hit fill).

Distances use the same expanded form as ops.neighborhood.square_distance
(max(|c|^2 + |x|^2 - 2 c.x, 0)) in plain f32 VPU arithmetic; the unfused
path evaluates the dot on the MXU at HIGHEST precision, so pairs within
~1e-6 relative of the radius boundary may select differently — the same
class of rounding freedom the reference CUDA kernel (per-coordinate FMA)
has vs either. Parity tests keep a margin off the boundary.

Train mode keeps the unfused path: batch-norm batch statistics are taken
over the *grouped* tensor including duplicate padding slots, which this
formulation deliberately does not materialize.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 128     # center-tile granularity (gating: npoint % TILE_M == 0)
MAX_TILE_M = 512  # preferred tile: fewer programs amortize shared loads
CHUNK_N = 512    # candidate points per inner iteration


def _pick_tile(m: int) -> int:
    """Largest 128-multiple tile <= MAX_TILE_M dividing m."""
    for t in (MAX_TILE_M, 256, TILE_M):
        if m % t == 0:
            return t
    raise ValueError(f"npoint {m} not a multiple of {TILE_M}")


def _pick_chunk(n: int) -> int:
    """Largest 128-multiple candidate chunk <= CHUNK_N dividing n.

    Any n % 128 == 0 cloud gets a working chunk (e.g. n=640 -> 128), so
    the model gate's `n % 128 == 0` check is sufficient — an assert here
    used to crash 128-multiples that are not 512-multiples."""
    for c in (CHUNK_N, 256, TILE_M):
        if n % c == 0:
            return c
    raise ValueError(f"cloud size {n} not a multiple of {TILE_M}")

# test hook: lets the CPU suite route SetAbstractionMSG through the fused
# (interpreted) path; on TPU the model uses it whenever `fused_eval` is set
FORCE_FUSED_ON_CPU = False


def fused_available() -> bool:
    """True when the model's eval path should use the fused kernel."""
    return jax.default_backend() == "tpu" or FORCE_FUSED_ON_CPU


def fold_bn_params(mlp_vars: dict, eps: float = 1e-5):
    """PointwiseMLP variables -> per-layer (weight, bias) with BN folded.

    relu(BN(x @ W)) with running stats == relu(x @ (W * k) + (b - m * k)),
    k = scale / sqrt(var + eps). Returns lists of f32 arrays.
    """
    params = mlp_vars["params"]
    stats = mlp_vars["batch_stats"]
    ws, bs = [], []
    for i in range(len([k for k in params if k.startswith("dense_")])):
        w = params[f"dense_{i}"]["kernel"].astype(jnp.float32)
        bn = params[f"bn_{i}"]
        st = stats[f"bn_{i}"]
        k = bn["scale"] * jax.lax.rsqrt(st["var"] + eps)
        ws.append(w * k[None, :])
        bs.append(bn["bias"] - st["mean"] * k)
    return ws, bs


def _apply_layers(h2d, w_refs, compute_dtype, precision):
    """Folded layers 2..L on a (rows, C) tile: relu(h @ W + b)."""
    for li in range(len(w_refs) // 2):
        w = w_refs[2 * li][...]
        b = w_refs[2 * li + 1][...]
        y = jax.lax.dot(h2d.astype(compute_dtype), w.astype(compute_dtype),
                        preferred_element_type=jnp.float32,
                        precision=precision)
        h2d = jax.nn.relu(y + b)
    return h2d


def _finish_scale(slots, hits, cw, p1_row0, w_refs, nsample, c1, tile,
                  compute_dtype, precision):
    """Pair layer 1 + folded MLP + slot-masked max + no-hit fallback."""
    h = jax.nn.relu(slots - cw[None, :, :])           # (ns, TM, C1)
    h2d = _apply_layers(h.reshape(nsample * tile, c1), w_refs,
                        compute_dtype, precision)
    h = h2d.reshape(nsample, tile, h2d.shape[-1])
    s_iota = jax.lax.broadcasted_iota(
        jnp.int32, h.shape, 0).astype(jnp.float32)
    live = s_iota < hits[None, :, :]                  # bcast (TM,1)
    pooled = jnp.max(jnp.where(live, h, -jnp.inf), axis=0)
    # no-hit fallback: CUDA leaves idx 0 -> the pooled value is pair (i, 0)
    fb = jax.nn.relu(p1_row0 - cw)                    # (TM, C1)
    fb = _apply_layers(fb, w_refs, compute_dtype, precision)
    return jnp.where(hits > 0.0, pooled, fb)


def _sa_kernel(xt_ref, sqx_ref, maskf_ref, ut_ref, c_ref, p1_ref, cw_ref,
               *refs, r2: float, nsample: int, n_chunks: int, chunk: int,
               layers: int, c1: int, tile: int, compute_dtype, precision):
    """One program: `tile` centers vs all N points, `chunk` at a time."""
    w_refs = refs[:2 * (layers - 1)]
    out_ref, slots_ref, hits_ref = refs[2 * (layers - 1):]

    c = c_ref[...]                                    # (TM, 3) f32
    sqc = jnp.sum(c * c, axis=1, keepdims=True)       # (TM, 1)
    cw = cw_ref[...]                                  # (TM, C1) f32

    slots_ref[...] = jnp.zeros_like(slots_ref)        # (ns, TM, C1)
    hits_ref[...] = jnp.zeros_like(hits_ref)          # (TM, 1)

    def body(j, _):
        js = pl.ds(j * chunk, chunk)   # NOT the global CHUNK_N: clouds
        # smaller than 512 use chunk == N (regression-tested at 256)
        xs = xt_ref[:, js]                            # (3, CHUNK)
        # expanded-form squared distance, plain f32 VPU arithmetic
        prod = (c[:, 0:1] * xs[0:1, :] + c[:, 1:2] * xs[1:2, :]
                + c[:, 2:3] * xs[2:3, :])             # (TM, CHUNK)
        d2 = jnp.maximum(sqc + sqx_ref[:, js] - 2.0 * prod, 0.0)
        hitf = jnp.logical_and(
            d2 < r2, maskf_ref[:, js] > 0.0).astype(jnp.float32)
        # inclusive prefix count along the point axis: 0/1 UT matmul with
        # f32 accumulation (exact for counts <= N), offset by prior chunks
        rank = jax.lax.dot(hitf, ut_ref[...],
                           preferred_element_type=jnp.float32)
        rank = jnp.where(hitf > 0.0, rank + hits_ref[...], 0.0)
        hits_ref[...] += jnp.sum(hitf, axis=1, keepdims=True)

        # slot compaction: G[s] = onehot(rank == s+1) @ P1 — exact gather
        p1c = p1_ref[js, :].astype(compute_dtype)     # (CHUNK, C1)
        for s in range(nsample):
            oh = (rank == float(s + 1)).astype(compute_dtype)
            slots_ref[s, :, :] += jax.lax.dot(
                oh, p1c, preferred_element_type=jnp.float32,
                precision=precision)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)

    out_ref[...] = _finish_scale(slots_ref[...], hits_ref[...], cw,
                                 p1_ref[0:1, :], w_refs, nsample, c1,
                                 tile, compute_dtype, precision)


def _sa_pair_kernel(xt_ref, sqx_ref, maskf_ref, ut_ref, c_ref,
                    p1a_ref, cwa_ref, p1b_ref, cwb_ref, *refs,
                    r2a: float, r2b: float, nsa: int, nsb: int,
                    n_chunks: int, chunk: int, layers_a: int,
                    layers_b: int, c1a: int, c1b: int, tile: int,
                    compute_dtype, precision):
    """Both radius scales of one SA level in one program.

    MSG levels always group the SAME (points, centers) at two radii
    (pointnet2_modules.py:58-94); merging shares the distance matrix, the
    shared input loads, and issues ONE stacked prefix-count matmul for
    both hit masks — and halves the kernel dispatches per level.
    Per-scale math is identical to _sa_kernel, so outputs are
    bit-identical to two single-scale calls.
    """
    nwa, nwb = 2 * (layers_a - 1), 2 * (layers_b - 1)
    wa_refs = refs[:nwa]
    wb_refs = refs[nwa:nwa + nwb]
    (outa_ref, outb_ref, slotsa_ref, hitsa_ref,
     slotsb_ref, hitsb_ref) = refs[nwa + nwb:]

    c = c_ref[...]                                    # (TM, 3) f32
    sqc = jnp.sum(c * c, axis=1, keepdims=True)
    cwa, cwb = cwa_ref[...], cwb_ref[...]

    slotsa_ref[...] = jnp.zeros_like(slotsa_ref)
    hitsa_ref[...] = jnp.zeros_like(hitsa_ref)
    slotsb_ref[...] = jnp.zeros_like(slotsb_ref)
    hitsb_ref[...] = jnp.zeros_like(hitsb_ref)

    def body(j, _):
        js = pl.ds(j * chunk, chunk)
        xs = xt_ref[:, js]                            # (3, CHUNK)
        prod = (c[:, 0:1] * xs[0:1, :] + c[:, 1:2] * xs[1:2, :]
                + c[:, 2:3] * xs[2:3, :])
        d2 = jnp.maximum(sqc + sqx_ref[:, js] - 2.0 * prod, 0.0)
        valid = maskf_ref[:, js] > 0.0
        hita = jnp.logical_and(d2 < r2a, valid).astype(jnp.float32)
        hitb = jnp.logical_and(d2 < r2b, valid).astype(jnp.float32)
        # one stacked prefix-count matmul for both scales
        ranks = jax.lax.dot(
            jnp.concatenate([hita, hitb], axis=0), ut_ref[...],
            preferred_element_type=jnp.float32)
        ranka = jnp.where(hita > 0.0,
                          ranks[:hita.shape[0]] + hitsa_ref[...], 0.0)
        rankb = jnp.where(hitb > 0.0,
                          ranks[hita.shape[0]:] + hitsb_ref[...], 0.0)
        hitsa_ref[...] += jnp.sum(hita, axis=1, keepdims=True)
        hitsb_ref[...] += jnp.sum(hitb, axis=1, keepdims=True)

        p1ca = p1a_ref[js, :].astype(compute_dtype)
        for s in range(nsa):
            oh = (ranka == float(s + 1)).astype(compute_dtype)
            slotsa_ref[s, :, :] += jax.lax.dot(
                oh, p1ca, preferred_element_type=jnp.float32,
                precision=precision)
        p1cb = p1b_ref[js, :].astype(compute_dtype)
        for s in range(nsb):
            oh = (rankb == float(s + 1)).astype(compute_dtype)
            slotsb_ref[s, :, :] += jax.lax.dot(
                oh, p1cb, preferred_element_type=jnp.float32,
                precision=precision)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)

    outa_ref[...] = _finish_scale(slotsa_ref[...], hitsa_ref[...], cwa,
                                  p1a_ref[0:1, :], wa_refs, nsa, c1a,
                                  tile, compute_dtype, precision)
    outb_ref[...] = _finish_scale(slotsb_ref[...], hitsb_ref[...], cwb,
                                  p1b_ref[0:1, :], wb_refs, nsb, c1b,
                                  tile, compute_dtype, precision)


def fused_sa_scale(xyz, centers, features, mask, ws, bs, *,
                   radius: float, nsample: int,
                   compute_dtype=jnp.bfloat16, precision=None,
                   interpret: bool | None = None) -> jnp.ndarray:
    """Fused SA scale over one cloud; see _fused_sa_scale.

    `interpret=None` resolves to the backend: compiled on TPU, Pallas
    interpreter elsewhere (the CPU test suite exercises the same code).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fused_sa_scale(xyz, centers, features, mask, tuple(ws),
                           tuple(bs), radius=radius, nsample=nsample,
                           compute_dtype=compute_dtype, precision=precision,
                           interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("radius", "nsample", "compute_dtype", "precision",
                     "interpret"))
def _fused_sa_scale(xyz: jnp.ndarray, centers: jnp.ndarray,
                    features: jnp.ndarray | None, mask: jnp.ndarray | None,
                    ws: Sequence[jnp.ndarray], bs: Sequence[jnp.ndarray],
                    *, radius: float, nsample: int,
                    compute_dtype=jnp.bfloat16,
                    precision=None,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused SA scale over one cloud.

    Args:
      xyz: (N, 3) points, f32. N a multiple of 128 (CHUNK_N divides padded N).
      centers: (M, 3) query centers, f32. M a multiple of TILE_M.
      features: optional (N, C) per-point features.
      mask: optional (N,) bool validity of points.
      ws/bs: folded MLP parameters (fold_bn_params); ws[0] has shape
        (3 + C, C1) with the xyz part in rows 0:3 (QueryAndGroup concat
        order: [xyz - center, features], pointnet2_utils.py:269-292).
      radius, nsample: ball parameters (static).
      compute_dtype: MXU operand dtype of gathers + pair layers (the
        selection arithmetic and layer-1 hoist are always f32/exact).
      precision: lax.Precision for the MXU ops (use HIGHEST with
        compute_dtype=f32 for tight parity tests).
    Returns:
      (M, C_last) pooled features, f32.
    """
    n, m = xyz.shape[0], centers.shape[0]
    chunk = _pick_chunk(n)
    tile = _pick_tile(m)
    xyz = xyz.astype(jnp.float32)
    centers = centers.astype(jnp.float32)
    c1 = ws[0].shape[1]

    p1, cw = _hoist_layer1(xyz, centers, features, ws, bs)

    xt = xyz.T                                         # (3, N)
    sqx = jnp.sum(xyz * xyz, axis=1)[None, :]          # (1, N)
    maskf = (jnp.ones((1, n), jnp.float32) if mask is None
             else mask.astype(jnp.float32)[None, :])
    ut = jnp.triu(jnp.ones((chunk, chunk), jnp.float32))

    c_out = ws[-1].shape[1]
    layers = len(ws)
    rest: list[jnp.ndarray] = []
    rest_specs: list[pl.BlockSpec] = []
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    for w, b in zip(ws[1:], bs[1:]):
        rest += [w.astype(jnp.float32), b.astype(jnp.float32)[None, :]]
        rest_specs += [full(), full()]

    kernel = functools.partial(
        _sa_kernel, r2=float(radius) ** 2, nsample=nsample,
        n_chunks=n // chunk, chunk=chunk, layers=layers, c1=c1, tile=tile,
        compute_dtype=compute_dtype,
        precision=precision)

    return pl.pallas_call(
        kernel,
        grid=(m // tile,),
        in_specs=[
            full(),                                          # xt (3, N)
            full(),                                          # sqx (1, N)
            full(),                                          # maskf (1, N)
            full(),                                          # ut
            pl.BlockSpec((tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),           # centers
            full(),                                          # p1 (N, C1)
            pl.BlockSpec((tile, c1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),           # cw
            *rest_specs,
        ],
        out_specs=pl.BlockSpec((tile, c_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nsample, tile, c1), jnp.float32),    # slot gather
            pltpu.VMEM((tile, 1), jnp.float32),              # hit count
        ],
        interpret=interpret,
    )(xt, sqx, maskf, ut, centers, p1, cw, *rest)


def _hoist_layer1(xyz, centers, features, ws, bs):
    """Layer-1 factorization: per-point P1 (N, C1) and per-center CW."""
    w1_xyz, w1_feat = ws[0][:3], ws[0][3:]
    p1 = xyz @ w1_xyz + bs[0][None, :]
    if features is not None:
        assert w1_feat.shape[0] == features.shape[1], \
            (w1_feat.shape, features.shape)
        p1 = p1 + features.astype(jnp.float32) @ w1_feat
    return p1, centers @ w1_xyz


def fused_sa_pair(xyz, centers, features, mask, ws_a, bs_a, ws_b, bs_b, *,
                  radius_a: float, radius_b: float, nsample_a: int,
                  nsample_b: int, compute_dtype=jnp.bfloat16,
                  precision=None, interpret: bool | None = None):
    """Both radius scales of one MSG level in one kernel → (out_a, out_b).

    Bit-identical to two fused_sa_scale calls (same per-scale math); one
    dispatch, shared distance matrix, one stacked prefix-count matmul.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fused_sa_pair(xyz, centers, features, mask, tuple(ws_a),
                          tuple(bs_a), tuple(ws_b), tuple(bs_b),
                          radius_a=radius_a, radius_b=radius_b,
                          nsample_a=nsample_a, nsample_b=nsample_b,
                          compute_dtype=compute_dtype, precision=precision,
                          interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("radius_a", "radius_b", "nsample_a", "nsample_b",
                     "compute_dtype", "precision", "interpret"))
def _fused_sa_pair(xyz, centers, features, mask, ws_a, bs_a, ws_b, bs_b,
                   *, radius_a, radius_b, nsample_a, nsample_b,
                   compute_dtype, precision, interpret):
    n, m = xyz.shape[0], centers.shape[0]
    chunk = _pick_chunk(n)
    # cap the pair tile at 256: both scales' slot scratch + finish
    # activations at 512 approach the 16M scoped-vmem stack limit
    tile = min(_pick_tile(m), 256)
    xyz = xyz.astype(jnp.float32)
    centers = centers.astype(jnp.float32)
    c1a, c1b = ws_a[0].shape[1], ws_b[0].shape[1]

    p1a, cwa = _hoist_layer1(xyz, centers, features, ws_a, bs_a)
    p1b, cwb = _hoist_layer1(xyz, centers, features, ws_b, bs_b)

    xt = xyz.T
    sqx = jnp.sum(xyz * xyz, axis=1)[None, :]
    maskf = (jnp.ones((1, n), jnp.float32) if mask is None
             else mask.astype(jnp.float32)[None, :])
    ut = jnp.triu(jnp.ones((chunk, chunk), jnp.float32))

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    rest: list[jnp.ndarray] = []
    rest_specs: list[pl.BlockSpec] = []
    for ws, bs in ((ws_a, bs_a), (ws_b, bs_b)):
        for w, b in zip(ws[1:], bs[1:]):
            rest += [w.astype(jnp.float32), b.astype(jnp.float32)[None, :]]
            rest_specs += [full(), full()]

    kernel = functools.partial(
        _sa_pair_kernel, r2a=float(radius_a) ** 2,
        r2b=float(radius_b) ** 2, nsa=nsample_a, nsb=nsample_b,
        n_chunks=n // chunk, chunk=chunk, layers_a=len(ws_a),
        layers_b=len(ws_b), c1a=c1a, c1b=c1b, tile=tile,
        compute_dtype=compute_dtype, precision=precision)

    tile_spec = lambda c: pl.BlockSpec(  # noqa: E731
        (tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(m // tile,),
        in_specs=[
            full(), full(), full(), full(),        # xt, sqx, maskf, ut
            tile_spec(3),                          # centers
            full(), tile_spec(c1a),                # p1a, cwa
            full(), tile_spec(c1b),                # p1b, cwb
            *rest_specs,
        ],
        out_specs=(tile_spec(ws_a[-1].shape[1]),
                   tile_spec(ws_b[-1].shape[1])),
        out_shape=(jax.ShapeDtypeStruct((m, ws_a[-1].shape[1]),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((m, ws_b[-1].shape[1]),
                                        jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((nsample_a, tile, c1a), jnp.float32),
            pltpu.VMEM((tile, 1), jnp.float32),
            pltpu.VMEM((nsample_b, tile, c1b), jnp.float32),
            pltpu.VMEM((tile, 1), jnp.float32),
        ],
        interpret=interpret,
    )(xt, sqx, maskf, ut, centers, p1a, cwa, p1b, cwb, *rest)


def sa_scale_reference(xyz, centers, features, mask, ws, bs, *,
                       radius, nsample):
    """Unfused reference of the same folded computation (for parity tests):
    ball_query + group + folded matmul/bias/relu + max-pool, all f32."""
    from .neighborhood import ball_query
    idx = ball_query(radius, nsample, xyz, centers, mask)
    g = jnp.take(xyz, idx, axis=0) - centers[:, None, :]
    if features is not None:
        g = jnp.concatenate([g, jnp.take(features, idx, axis=0)], axis=-1)
    h = g.astype(jnp.float32)
    for w, b in zip(ws, bs):
        h = jax.nn.relu(h @ w.astype(jnp.float32) + b.astype(jnp.float32))
    return jnp.max(h, axis=1)
