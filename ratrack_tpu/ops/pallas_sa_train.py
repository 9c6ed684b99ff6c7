"""Fused set-abstraction scale for the TRAIN path, with a custom VJP.

The eval-path kernel (ops/pallas_sa.py) cannot serve training because
train-mode batch norm takes batch statistics over the *grouped* tensor
including the CUDA duplicate-padding slots (reference SharedMLP
`src/lib/pytorch_utils.py:5-33` on the output of QueryAndGroup
`pointnet2_utils.py:269-292`), which the eval formulation deliberately
never materializes — and because training needs the backward pass. This
kernel is the train-side counterpart the reference implements as
hand-written CUDA forwards/backwards (`src/lib/src/ball_query_gpu.cu:9-46`,
`group_points_gpu.cu:8-86` with its scatter-add backward,
`sampling_gpu.cu:40-83`) plus torch autograd for the MLP:

  * ONE program holds the whole scale in VMEM (live config: M = N = 512
    centers/points — npoint equals the pad budget), so train-mode BN's
    global-over-(M·ns) statistics are plain in-kernel reductions;
  * selection is the same sort-free rank compaction as the eval kernel
    (hit mask → 0/1 upper-triangular prefix-count matmul), but ALL
    nsample slots are materialized, with the CUDA padding rule applied
    *by value*: slots past the hit count repeat the first hit, no hit at
    all yields the (center, point 0) pair (ball_query_gpu.cu zero-init +
    first-hit fill);
  * layer 1 factorizes through the pair structure exactly as in the
    eval kernel: g1[m,s] = P1[idx[m,s]] - CW[m], with P1/CW two small
    HIGHEST matmuls hoisted outside;
  * slot gathers are one-hot matmuls against the lane-stacked
    bf16 split of P1 (see ops/sampling.py _bf16_parts: each part is
    exactly bf16-representable, each output sums one part tuple) —
    3 parts under interpret (bit-exact for any f32), 2 on the real TPU
    (≤2⁻¹⁷-relative class, NOT bit-exact — see SPLIT_PARTS and
    PROBE_SPLIT_PARTS.json);
  * MLP layers 2..L run as bf16-operand dots — the same numerics class
    as the unfused path's DEFAULT-precision f32 Dense (single bf16 MXU
    pass);
  * the backward kernel recomputes the forward (activations never touch
    HBM), backpropagates max-pool (cotangent split evenly over ties,
    matching jnp.max), ReLU (zero subgradient at 0, matching
    jax.nn.relu), train-mode BN (the standard three-term batch backward)
    and the Dense stack, then scatters dG1 back to dP1 with the exact
    stacked-split one-hot transpose — including the duplicate-slot
    routing (cotangents of repeated slots flow to the first hit; no-hit
    rows flow to point 0).

Numerics vs the unfused train path (query_and_group + PointwiseMLP):
forward and gradients agree to the bf16-matmul-pass class (~1e-2
relative worst-case on cancelling sums), NOT bitwise: the hoisted
layer-1 rounds differently from Dense(concat([dxyz, f])), and Mosaic
bf16 dots tile differently from XLA's. tests/test_pallas_sa_train.py
pins the bound against the autodiff path.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sampling import _bf16_parts

# raised scoped-VMEM budget: the sa3 scale-b backward holds two xhat
# tensors + the cotangent ping-pong (~18 MB), and the pair FWD kernel
# additionally streams both scales' xhat stash blocks (~24 MB at sa3
# pk=2, measured 104.2M total); v5e VMEM is 128M physical and far
# larger than Mosaic's 16M default scoped limit
_VMEM_LIMIT = 112 * 1024 * 1024

# Number of bf16 parts in the split one-hot GATHER dots on the REAL-TPU
# path (the dominant MXU cost of these kernels: every P1 row is fetched
# through `parts` single-pass bf16 dots). Interpret mode (CPU) always
# uses 3 — see _eff_parts.
#   3 — bit-exact for any f32 (hi+mid+lo covers all 24 significand bits);
#   2 — NOT bit-exact: v5e HIGHEST hoist outputs carry FULL 24-bit
#       mantissas (round 4's "≤17 significand bits, measured ==0" claim
#       was REFUTED by the round-5 probe: tools/probe_split_parts.py →
#       PROBE_SPLIT_PARTS.json — 0 of 36 real flagship hoist tensors
#       are 2-part representable). The bound that DOES hold, measured:
#       2-part residual ≤ 6.8e-6 relative (≈2⁻¹⁷·¹, the _bf16_cat3
#       theoretical ≤2⁻¹⁷ class). After the ≲2⁶ pair cancellation
#       (|P1|/|g1| on VoD coordinates) that is ≥11 bits ≈ 5e-4 on g1 —
#       still ~30× tighter than the bf16-operand class (2⁻⁸) every
#       downstream DEFAULT dot imposes. End-to-end: flagship-config
#       loss-gradient A/B (2,2) vs bit-exact (3,3), recorded in
#       PROBE_SPLIT_PARTS.json["grad_ab"]. Perf: 684.8 → 741.6 fps on
#       the real chip (train 512pt/8streams, round 4). Hardware
#       coverage: tests/test_split_parts_tpu.py (RATRACK_TPU_TESTS=1).
# Env overrides RATRACK_SA_{SPLIT,SCATTER}_PARTS are for A/B
# measurement only (static at import; programs must be recompiled to
# change it) and silently changing TRAINING numerics from the
# environment is a footgun — so they are honored only under
# RATRACK_DEBUG_NUMERICS=1 (tools/probe_split_parts.py sets it);
# otherwise a warning is printed and the default stands.
def _env_parts(name: str, default: int) -> int:
    import os as _os
    raw = _os.environ.get(name)
    if raw is None:
        return default
    if _os.environ.get("RATRACK_DEBUG_NUMERICS") != "1":
        import warnings
        warnings.warn(
            f"{name}={raw} ignored: numerics overrides require "
            "RATRACK_DEBUG_NUMERICS=1 (measurement-only knob)")
        return default
    return int(raw)


SPLIT_PARTS = _env_parts("RATRACK_SA_SPLIT_PARTS", 2)

# Parts for the BACKWARD's cotangent scatter dots (dP1 = Σ onehotᵀ@dG1)
# on the real-TPU path. Cotangents are FULL-mantissa f32 (products of
# upstream bf16 dots), so 2 parts here are NOT bit-exact — but there is
# no cancellation amplification (the scatter is a pure sum of routed
# rows), so each dropped part costs only its own magnitude: ≤2⁻¹⁷
# relative per addend at 2 parts (measured on-chip: dW1 maxdiff 1.3e-2
# of 509-scale ≈ 2.5e-5 relative), 2⁻⁹ at 1 part (the truncation class
# every bf16-operand backward dot upstream already applied to the
# values that PRODUCED dG1).
SCATTER_PARTS = _env_parts("RATRACK_SA_SCATTER_PARTS", SPLIT_PARTS)


def _eff_parts(interpret: bool) -> tuple:
    """(gather_parts, scatter_parts) for this backend path.

    Interpret mode (CPU tests) keeps the bit-exact 3-part split so the
    suite's exact-regime routing tests stay exact. The real TPU runs
    SPLIT_PARTS (default 2): hoist outputs are full-mantissa f32 —
    see the SPLIT_PARTS comment and PROBE_SPLIT_PARTS.json — so the
    2-part gather carries a ≤2⁻¹⁷-relative rounding class (measured
    6.8e-6 worst over the real flagship hoists), traded for one fewer
    MXU pass per gather. Scatter cotangents likewise: 2 parts keep
    ≤2⁻¹⁷ relative per addend (no cancellation amplification)."""
    if interpret:
        return 3, 3
    return SPLIT_PARTS, SCATTER_PARTS


def _bf16_cat3(v: jnp.ndarray, parts: int) -> jnp.ndarray:
    """(R, C) f32 → (R, parts·C) bf16 [hi | mid | lo?], Σ parts ≈ v.

    parts=3 reassembles v bit-exactly (24 significand bits); parts=2
    keeps ≥17 bits (relative error ≤ 2⁻¹⁷); parts=1 is plain bf16
    truncation — see SPLIT_PARTS/SCATTER_PARTS for where each is safe.
    Lane-concat + a per-part-slice fold after the dot measured FASTER
    than stacking parts along the contracted axis (310 vs 403 fps
    end-to-end: the wider one-hot build and multiplied K cost more than
    the lane-offset folds)."""
    p = parts
    v = v.astype(jnp.float32)
    hi = v.astype(jnp.bfloat16)
    if p == 1:
        return hi
    r = v - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    if p == 2:
        return jnp.concatenate([hi, mid], axis=1)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, mid, lo], axis=1)


def _fold3(o3: jnp.ndarray, c: int, parts: int) -> jnp.ndarray:
    """Undo _bf16_cat3 after a one-hot dot: sum the part lanes."""
    p = parts
    out = o3[..., :c]
    for i in range(1, p):
        out = out + o3[..., i * c:(i + 1) * c]
    return out


def _split_cat(v: jnp.ndarray, axis: int, parts: int) -> jnp.ndarray:
    """bf16 split-parts concat along `axis` (outside-kernel p1cat build),
    truncated to `parts` parts."""
    return jnp.concatenate(_bf16_parts(v.astype(jnp.float32))[:parts],
                           axis=axis)


def _selection(xt, sqx, maskf, ut, c, r2):
    """Shared fwd/bwd selection: rank (M, N) and hit count (M, 1)."""
    sqc = jnp.sum(c * c, axis=1, keepdims=True)
    prod = (c[:, 0:1] * xt[0:1, :] + c[:, 1:2] * xt[1:2, :]
            + c[:, 2:3] * xt[2:3, :])
    d2 = jnp.maximum(sqc + sqx - 2.0 * prod, 0.0)
    # mask stays f32 (Mosaic has no bf16 compare); cast only at the dot
    hitf = jnp.logical_and(d2 < r2, maskf > 0.0).astype(jnp.float32)
    # inclusive prefix count: 0/1 bf16 matmul, f32 accumulation — exact
    # for counts <= N
    rank = jax.lax.dot(hitf.astype(jnp.bfloat16), ut,
                       preferred_element_type=jnp.float32)
    rank = jnp.where(hitf > 0.0, rank, 0.0)
    hits = jnp.sum(hitf, axis=1, keepdims=True)
    return rank, hits


_SLOT_BLOCK = 8


def _gather_slots(rank, hits, p1cat, p1row0, cw, ns, c1, m, act_ref,
                  gp: int):
    """Materialize g1 = grouped(P1) - CW with CUDA duplicate padding
    into act_ref ((ns·M, C1)); returns nothing (writes the ref).

    Slots are processed _SLOT_BLOCK at a time: one (G·M, N) one-hot per
    block feeds ONE MXU dot — per-slot dots spent more time in dot issue
    than compute (32 × ~2 µs measured ≈ the whole kernel budget). The
    loop over blocks is a fori_loop, NOT unrolled Python: Mosaic
    stack-allocates every unrolled iteration's temporaries at once."""
    g = min(ns, _SLOT_BLOCK)
    nblk = ns // g
    s_io = jax.lax.broadcasted_iota(jnp.int32, (g, m, 1),
                                    0).astype(jnp.float32)

    def block(s0):
        sv = s_io[:, 0:1, 0:1] + (s0 + 1.0)                # slot ranks
        oh = (rank[None] == sv).astype(jnp.bfloat16).reshape(g * m, -1)
        o3 = jax.lax.dot(oh, p1cat, preferred_element_type=jnp.float32)
        return _fold3(o3, c1, gp)

    sb0 = block(0.0)
    first = jnp.where(hits > 0.0, sb0[0:m], p1row0)        # (m, c1)

    def livefix(sb, s0):
        live = (s_io + s0) < hits[None]                    # (g, m, 1)
        out = jnp.where(live, sb.reshape(g, m, c1),
                        first[None]) - cw[None]
        return out.reshape(g * m, c1)

    act_ref[0:g * m, :] = livefix(sb0, 0.0)

    def body(i, _):
        s0 = i.astype(jnp.float32) * g
        act_ref[pl.ds(i * (g * m), g * m), :] = livefix(block(s0), s0)
        return 0

    jax.lax.fori_loop(1, nblk, body, 0)


def _batch_stats(x, count):
    mu = jnp.sum(x, axis=0, keepdims=True) / count
    var = jnp.maximum(jnp.sum(x * x, axis=0, keepdims=True) / count
                      - mu * mu, 0.0)
    return mu, var


def _fwd_kernel(xt_ref, sqx_ref, maskf_ref, ut_ref, c_ref, cw_ref,
                p1cat_ref, p1row0_ref, *refs, r2: float, ns: int,
                cs: Sequence[int], eps: float, gp: int):
    """Forward: pooled (M, C_L) + per-layer batch (mu, var)."""
    n_layers = len(cs)
    ws = refs[:n_layers - 1]
    scales = refs[n_layers - 1:2 * n_layers - 1]
    biases = refs[2 * n_layers - 1:3 * n_layers - 1]
    outs = refs[3 * n_layers - 1:3 * n_layers - 1 + 1 + 2 * n_layers]
    pooled_ref = outs[0]
    mu_refs = outs[1:1 + n_layers]
    var_refs = outs[1 + n_layers:1 + 2 * n_layers]
    act_refs = refs[3 * n_layers - 1 + 1 + 2 * n_layers:]

    m = c_ref.shape[0]
    count = jnp.float32(ns * m)

    rank, hits = _selection(xt_ref[...], sqx_ref[...], maskf_ref[...],
                            ut_ref[...], c_ref[...], r2)
    _gather_slots(rank, hits, p1cat_ref[...], p1row0_ref[...],
                  cw_ref[...], ns, cs[0], m, act_refs[0], gp)

    for li in range(n_layers):
        if li > 0:
            a_prev = act_refs[li - 1][...]
            act_refs[li][...] = jax.lax.dot(
                a_prev.astype(jnp.bfloat16),
                ws[li - 1][...].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        h = act_refs[li][...]
        mu, var = _batch_stats(h, count)
        mu_refs[li][...] = mu
        var_refs[li][...] = var
        inv = jax.lax.rsqrt(var + eps) * scales[li][...]
        act_refs[li][...] = jnp.maximum((h - mu) * inv + biases[li][...],
                                        0.0)

    a_last = act_refs[-1][...].reshape(ns, m, cs[-1])
    pooled_ref[...] = jnp.max(a_last, axis=0)


def _bwd_kernel(xt_ref, sqx_ref, maskf_ref, ut_ref, c_ref, cw_ref,
                p1cat_ref, p1row0_ref, *refs, r2: float, ns: int,
                cs: Sequence[int], eps: float, gp: int, sp: int):
    """Backward: recompute forward, backprop pool/BN/Dense, scatter dP1."""
    n_layers = len(cs)
    ws = refs[:n_layers - 1]
    scales = refs[n_layers - 1:2 * n_layers - 1]
    biases = refs[2 * n_layers - 1:3 * n_layers - 1]
    dpooled_ref = refs[3 * n_layers - 1]
    k = 3 * n_layers
    # outputs: dp1, dcw, dw × (L-1), dscale × L, dbias × L
    dp1_ref = refs[k]
    dcw_ref = refs[k + 1]
    dw_refs = refs[k + 2:k + 1 + n_layers]
    dscale_refs = refs[k + 1 + n_layers:k + 1 + 2 * n_layers]
    dbias_refs = refs[k + 1 + 2 * n_layers:k + 1 + 3 * n_layers]
    scr = refs[k + 1 + 3 * n_layers:]
    xhat_refs = scr[:n_layers]          # (ns·M, C_l) per layer
    d_refs = scr[n_layers:]             # cotangent per layer

    m = c_ref.shape[0]
    count = jnp.float32(ns * m)

    rank, hits = _selection(xt_ref[...], sqx_ref[...], maskf_ref[...],
                            ut_ref[...], c_ref[...], r2)
    _gather_slots(rank, hits, p1cat_ref[...], p1row0_ref[...],
                  cw_ref[...], ns, cs[0], m, xhat_refs[0], gp)

    # forward recompute, storing per-layer XHAT (normalized pre-affine);
    # activations derive from it on the fly: a = relu(xhat·scale + bias)
    mus, invs = [], []
    a_prev = None
    for li in range(n_layers):
        if li > 0:
            xhat_refs[li][...] = jax.lax.dot(
                a_prev.astype(jnp.bfloat16),
                ws[li - 1][...].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        h = xhat_refs[li][...]
        mu, var = _batch_stats(h, count)
        inv = jax.lax.rsqrt(var + eps)
        mus.append(mu)
        invs.append(inv)
        xhat_refs[li][...] = (h - mu) * inv
        a_prev = jnp.maximum(xhat_refs[li][...] * scales[li][...]
                             + biases[li][...], 0.0)

    # max-pool backward: cotangent split evenly over ties (jnp.max VJP)
    c_last = cs[-1]
    a3 = a_prev.reshape(ns, m, c_last)
    pooled = jnp.max(a3, axis=0)
    ties = (a3 == pooled[None]).astype(jnp.float32)
    cnt = jnp.sum(ties, axis=0)
    dpool = dpooled_ref[...] / cnt
    d_refs[-1][...] = (ties * dpool[None]).reshape(ns * m, c_last)

    for li in range(n_layers - 1, -1, -1):
        xhat = xhat_refs[li][...]
        z = xhat * scales[li][...] + biases[li][...]
        dz = d_refs[li][...] * (z > 0.0).astype(jnp.float32)
        dscale_refs[li][...] = jnp.sum(dz * xhat, axis=0, keepdims=True)
        dbias_refs[li][...] = jnp.sum(dz, axis=0, keepdims=True)
        # train-BN backward (batch statistics participate). With
        # dxhat = dz·scale, Σdxhat = scale·dbias and Σ(dxhat·xhat) =
        # scale·dscale — reusing the parameter-gradient reductions saves
        # two full passes over the (ns·M, C) tensor per layer:
        dh = (invs[li] * scales[li][...]) * (
            dz - dbias_refs[li][...] / count
            - xhat * (dscale_refs[li][...] / count))
        if li > 0:
            a_lm1 = jnp.maximum(
                xhat_refs[li - 1][...] * scales[li - 1][...]
                + biases[li - 1][...], 0.0)
            dw_refs[li - 1][...] = jax.lax.dot_general(
                a_lm1.astype(jnp.bfloat16), dh.astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            d_refs[li - 1][...] = jax.lax.dot(
                dh.astype(jnp.bfloat16),
                ws[li - 1][...].T.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        else:
            c1 = cs[0]
            # park dG1 in the layer-0 cotangent ref so the scatter loop
            # reads slots via dynamic ref slices (a fori_loop — unrolled
            # slot loops stack-sum their temporaries, see _gather_slots)
            d_refs[0][...] = dh
            dg1 = dh.reshape(ns, m, c1)
            dcw_ref[...] = -jnp.sum(dg1, axis=0)
            # duplicate-slot routing: dead slots' cotangents flow to the
            # first hit (rank-1 one-hot) or, with no hit, to point 0.
            # Blocked like _gather_slots: one scatter dot per slot block.
            # tpu.iota must be integer (Mosaic); convert after
            g = min(ns, _SLOT_BLOCK)
            nblk = ns // g
            s_iota = jax.lax.broadcasted_iota(
                jnp.int32, (ns, m, 1), 0).astype(jnp.float32)
            livem = (s_iota < hits[None]).astype(jnp.float32)
            extra = jnp.sum(dg1 * (1.0 - livem), axis=0)       # (M, C1)
            s_io = jax.lax.broadcasted_iota(
                jnp.int32, (g, m, 1), 0).astype(jnp.float32)

            def scat_block(s0):
                start = s0.astype(jnp.int32) * (g * m)
                dblk = d_refs[0][pl.ds(start, g * m), :]
                live = ((s_io + s0.astype(jnp.float32) * g)
                        < hits[None]).astype(jnp.float32)
                eff = (dblk.reshape(g, m, c1) * live).reshape(g * m, c1)
                sv = s_io[:, 0:1, 0:1] + (s0.astype(jnp.float32) * g
                                          + 1.0)
                oh = (rank[None] == sv).astype(
                    jnp.bfloat16).reshape(g * m, -1)
                return _fold3(jax.lax.dot_general(
                    oh, _bf16_cat3(eff, sp),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32), c1, sp)

            # live-slot scatters, + the duplicate cotangents via the
            # rank-1 one-hot, + no-hit rows onto point 0
            oh1 = (rank == 1.0).astype(jnp.bfloat16)
            dp1_ref[...] = _fold3(jax.lax.dot_general(
                oh1, _bf16_cat3(jnp.where(hits > 0.0, extra, 0.0), sp),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32), c1, sp)
            dp1_ref[...] += scat_block(jnp.int32(0))

            def body(i, _):
                dp1_ref[...] += scat_block(i)
                return 0

            jax.lax.fori_loop(1, nblk, body, 0)
            ex0 = jnp.where(hits > 0.0, 0.0, extra)
            ones = jnp.ones((1, m), jnp.bfloat16)
            row0 = _fold3(jax.lax.dot(ones, _bf16_cat3(ex0, sp),
                                      preferred_element_type=jnp.float32),
                          c1, sp)
            dp1_ref[0:1, :] += row0


# ---------------------------------------------------------------------------
# Stream-lane-packed variants (pk > 1).
#
# The per-op profile of the fused train step (tools/profile_train_ops.py)
# shows the SA kernels are VPU-elementwise-bound, and every (ns·M, C)
# stage tensor at C < 128 wastes lanes of each (8, 128) register tile:
# sa1's C=16 uses 12.5%, sa2's C=32 25%, sa3's C=64 50%. Packing pk
# streams side-by-side along lanes — act[(r, p·C+c)] = stream p's
# act[r, c] — makes every elementwise/reduce pass full-width while
# keeping per-stream semantics EXACT:
#   * gathers stay per-stream (exact 3-split one-hot dots, unchanged)
#     and lane-concat into the packed tensor (measured bit-exact);
#   * MLP dots become block-diagonal kron(I_pk, W) dots — bit-identical
#     to the per-stream narrow dot (zero blocks contribute exact zeros;
#     measured on-chip), and MXU-time-neutral (the pk× extra MACs
#     exactly replace the K/width padding waste of the narrow dot);
#   * BN statistics reduce over the same rows per lane group, so each
#     stream's mu/var/backward terms are bit-equal to the pk=1 kernel;
#   * the grid shrinks to B/pk steps, each doing pk streams' work.
# The duplicate-slot livefix/scatter logic runs packed with per-stream
# hit counts broadcast into their lane groups; the backward scatter
# extracts per-stream lanes by value slices (reads, not scratch-ref
# lane offsets — Mosaic wants lane-aligned refs).
# ---------------------------------------------------------------------------


def _fwd_kernel_pk(xt_ref, sqx_ref, maskf_ref, ut_ref, c_ref, cw_ref,
                   p1cat_ref, p1row0_ref, *refs, r2: float, ns: int,
                   cs: Sequence[int], eps: float, pk: int, gp: int):
    """Packed forward: refs carry (pk, ...) stream blocks; weight refs are
    block-diagonal / lane-tiled; outputs are lane-packed per stream."""
    n_layers = len(cs)
    ws = refs[:n_layers - 1]
    scales = refs[n_layers - 1:2 * n_layers - 1]
    biases = refs[2 * n_layers - 1:3 * n_layers - 1]
    outs = refs[3 * n_layers - 1:3 * n_layers - 1 + 1 + 2 * n_layers]
    pooled_ref = outs[0]
    mu_refs = outs[1:1 + n_layers]
    var_refs = outs[1 + n_layers:1 + 2 * n_layers]
    act_refs = refs[3 * n_layers - 1 + 1 + 2 * n_layers:]

    m = c_ref.shape[1]
    c1 = cs[0]
    count = jnp.float32(ns * m)

    ranks, hits_lanes, first0 = _packed_selection_gather(
        xt_ref, sqx_ref, maskf_ref, ut_ref, c_ref, cw_ref, p1cat_ref,
        p1row0_ref, act_refs[0], r2=r2, ns=ns, c1=c1, m=m, pk=pk, gp=gp)
    del ranks, hits_lanes, first0

    for li in range(n_layers):
        if li > 0:
            a_prev = act_refs[li - 1][...]
            act_refs[li][...] = jax.lax.dot(
                a_prev.astype(jnp.bfloat16),
                ws[li - 1][...].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        h = act_refs[li][...]
        mu, var = _batch_stats(h, count)
        mu_refs[li][...] = mu
        var_refs[li][...] = var
        inv = jax.lax.rsqrt(var + eps) * scales[li][...]
        act_refs[li][...] = jnp.maximum((h - mu) * inv + biases[li][...],
                                        0.0)

    a_last = act_refs[-1][...].reshape(ns, m, pk * cs[-1])
    pooled_ref[...] = jnp.max(a_last, axis=0)


def _packed_selection_gather(xt_ref, sqx_ref, maskf_ref, ut_ref, c_ref,
                             cw_ref, p1cat_ref, p1row0_ref, act0_ref, *,
                             r2, ns, c1, m, pk, gp):
    """Per-stream selection + packed g1 materialization into act0_ref.

    Returns (ranks list, hits_lanes (m, pk·c1), first (m, pk·c1)) for
    reuse by the backward's scatter."""
    ut = ut_ref[...]
    ranks, hits_l = [], []
    for p in range(pk):
        rank_p, hits_p = _selection(xt_ref[p], sqx_ref[p], maskf_ref[p],
                                    ut, c_ref[p], r2)
        ranks.append(rank_p)
        hits_l.append(hits_p * jnp.ones((m, c1), jnp.float32))
    hits_lanes = jnp.concatenate(hits_l, axis=1)        # (m, pk·c1)
    cw_pk = jnp.concatenate([cw_ref[p] for p in range(pk)], axis=1)
    row0_pk = jnp.concatenate([p1row0_ref[p] for p in range(pk)], axis=1)

    g = min(ns, _SLOT_BLOCK)
    nblk = ns // g
    s_io = jax.lax.broadcasted_iota(jnp.int32, (g, m, 1),
                                    0).astype(jnp.float32)

    def block(s0):
        sv = s_io[:, 0:1, 0:1] + (s0 + 1.0)
        pieces = []
        for p in range(pk):
            oh = (ranks[p][None] == sv).astype(jnp.bfloat16).reshape(
                g * m, -1)
            pieces.append(_fold3(jax.lax.dot(
                oh, p1cat_ref[p], preferred_element_type=jnp.float32),
                c1, gp))
        return jnp.concatenate(pieces, axis=1)          # (g·m, pk·c1)

    sb0 = block(0.0)
    first = jnp.where(hits_lanes > 0.0, sb0[0:m], row0_pk)

    def livefix(sb, s0):
        live = (s_io + s0) < hits_lanes[None]           # (g, m, pk·c1)
        out = jnp.where(live, sb.reshape(g, m, pk * c1),
                        first[None]) - cw_pk[None]
        return out.reshape(g * m, pk * c1)

    act0_ref[0:g * m, :] = livefix(sb0, 0.0)

    def body(i, _):
        s0 = i.astype(jnp.float32) * g
        act0_ref[pl.ds(i * (g * m), g * m), :] = livefix(block(s0), s0)
        return 0

    jax.lax.fori_loop(1, nblk, body, 0)
    return ranks, hits_lanes, first


def _bwd_kernel_pk(xt_ref, sqx_ref, maskf_ref, ut_ref, c_ref, cw_ref,
                   p1cat_ref, p1row0_ref, *refs, r2: float, ns: int,
                   cs: Sequence[int], eps: float, pk: int, gp: int,
                   sp: int):
    """Packed backward: recompute forward packed, backprop, scatter dP1
    per stream (value lane-slices feed the exact per-stream one-hots)."""
    n_layers = len(cs)
    ws = refs[:n_layers - 1]
    scales = refs[n_layers - 1:2 * n_layers - 1]
    biases = refs[2 * n_layers - 1:3 * n_layers - 1]
    dpooled_ref = refs[3 * n_layers - 1]
    k = 3 * n_layers
    dp1_ref = refs[k]                    # (pk, N, C1)
    dcw_ref = refs[k + 1]                # (m, pk·C1)
    dw_refs = refs[k + 2:k + 1 + n_layers]
    dscale_refs = refs[k + 1 + n_layers:k + 1 + 2 * n_layers]
    dbias_refs = refs[k + 1 + 2 * n_layers:k + 1 + 3 * n_layers]
    scr = refs[k + 1 + 3 * n_layers:]
    xhat_refs = scr[:n_layers]
    d_refs = scr[n_layers:]

    m = c_ref.shape[1]
    c1 = cs[0]
    count = jnp.float32(ns * m)

    ranks, hits_lanes, _first = _packed_selection_gather(
        xt_ref, sqx_ref, maskf_ref, ut_ref, c_ref, cw_ref, p1cat_ref,
        p1row0_ref, xhat_refs[0], r2=r2, ns=ns, c1=c1, m=m, pk=pk, gp=gp)

    mus, invs = [], []
    a_prev = None
    for li in range(n_layers):
        if li > 0:
            xhat_refs[li][...] = jax.lax.dot(
                a_prev.astype(jnp.bfloat16),
                ws[li - 1][...].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        h = xhat_refs[li][...]
        mu, var = _batch_stats(h, count)
        inv = jax.lax.rsqrt(var + eps)
        mus.append(mu)
        invs.append(inv)
        xhat_refs[li][...] = (h - mu) * inv
        a_prev = jnp.maximum(xhat_refs[li][...] * scales[li][...]
                             + biases[li][...], 0.0)

    c_last = cs[-1]
    a3 = a_prev.reshape(ns, m, pk * c_last)
    pooled = jnp.max(a3, axis=0)
    ties = (a3 == pooled[None]).astype(jnp.float32)
    cnt = jnp.sum(ties, axis=0)
    dpool = dpooled_ref[...] / cnt
    d_refs[-1][...] = (ties * dpool[None]).reshape(ns * m, pk * c_last)

    for li in range(n_layers - 1, -1, -1):
        xhat = xhat_refs[li][...]
        z = xhat * scales[li][...] + biases[li][...]
        dz = d_refs[li][...] * (z > 0.0).astype(jnp.float32)
        dscale_refs[li][...] = jnp.sum(dz * xhat, axis=0, keepdims=True)
        dbias_refs[li][...] = jnp.sum(dz, axis=0, keepdims=True)
        # Σdxhat = scale·dbias, Σ(dxhat·xhat) = scale·dscale (see
        # _bwd_kernel): two fewer full reduction passes per layer
        dh = (invs[li] * scales[li][...]) * (
            dz - dbias_refs[li][...] / count
            - xhat * (dscale_refs[li][...] / count))
        if li > 0:
            a_lm1 = jnp.maximum(
                xhat_refs[li - 1][...] * scales[li - 1][...]
                + biases[li - 1][...], 0.0)
            dw_refs[li - 1][...] = jax.lax.dot_general(
                a_lm1.astype(jnp.bfloat16), dh.astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            d_refs[li - 1][...] = jax.lax.dot(
                dh.astype(jnp.bfloat16),
                ws[li - 1][...].T.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        else:
            d_refs[0][...] = dh
            dg1 = dh.reshape(ns, m, pk * c1)
            dcw_ref[...] = -jnp.sum(dg1, axis=0)
            g = min(ns, _SLOT_BLOCK)
            nblk = ns // g
            s_iota = jax.lax.broadcasted_iota(
                jnp.int32, (ns, m, 1), 0).astype(jnp.float32)
            livem = (s_iota < hits_lanes[None]).astype(jnp.float32)
            extra = jnp.sum(dg1 * (1.0 - livem), axis=0)  # (m, pk·c1)
            s_io = jax.lax.broadcasted_iota(
                jnp.int32, (g, m, 1), 0).astype(jnp.float32)

            for p in range(pk):
                rank_p = ranks[p]
                hits_p = hits_lanes[:, p * c1:p * c1 + 1]

                def scat_block(s0, _rank=rank_p, _p=p):
                    start = s0.astype(jnp.int32) * (g * m)
                    dblk = d_refs[0][pl.ds(start, g * m), :]
                    eff_pk = dblk[:, _p * c1:(_p + 1) * c1]
                    live = ((s_io + s0.astype(jnp.float32) * g)
                            < hits_p[None]).astype(jnp.float32)
                    eff = (eff_pk.reshape(g, m, c1)
                           * live).reshape(g * m, c1)
                    sv = s_io[:, 0:1, 0:1] + (s0.astype(jnp.float32) * g
                                              + 1.0)
                    oh = (_rank[None] == sv).astype(
                        jnp.bfloat16).reshape(g * m, -1)
                    return _fold3(jax.lax.dot_general(
                        oh, _bf16_cat3(eff, sp),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32), c1, sp)

                extra_p = extra[:, p * c1:(p + 1) * c1]
                oh1 = (rank_p == 1.0).astype(jnp.bfloat16)
                dp1_ref[p] = _fold3(jax.lax.dot_general(
                    oh1, _bf16_cat3(jnp.where(hits_p > 0.0, extra_p, 0.0), sp),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32), c1, sp)
                dp1_ref[p] += scat_block(jnp.int32(0))

                def body(i, _, _scat=scat_block, _p=p):
                    dp1_ref[_p] += _scat(i)
                    return 0

                jax.lax.fori_loop(1, nblk, body, 0)
                ex0 = jnp.where(hits_p > 0.0, 0.0, extra_p)
                ones = jnp.ones((1, m), jnp.bfloat16)
                row0 = _fold3(jax.lax.dot(
                    ones, _bf16_cat3(ex0, sp),
                    preferred_element_type=jnp.float32), c1, sp)
                dp1_ref[p, 0:1, :] += row0


def _pick_pk(b: int, cs: tuple, n: int, m: int, ns: int,
             gp: int) -> int:
    """Largest stream-packing factor that fills the narrowest layer's
    lane tile, divides the batch, and fits the backward in scoped VMEM."""
    want = max(1, 128 // min(cs))
    for pk in (8, 4, 2):
        if pk > want or b % pk or pk > b:
            continue
        scratch = 2 * ns * m * pk * sum(cs) * 4           # xhat + d
        aux = (pk * m * n * 4                             # ranks
               + pk * n * gp * cs[0] * 2                   # p1cat
               + n * n * 2                                # ut
               + min(ns, _SLOT_BLOCK) * m * n * 2         # one-hot temp
               + 2 * min(ns, _SLOT_BLOCK) * m * pk * cs[0] * 4)
        if scratch + aux <= 64 * 1024 * 1024:
            return pk
    return 1


def _full():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def _make_core(r2: float, ns: int, cs: tuple, n: int, m: int, eps: float,
               interpret: bool):
    """Build the custom-VJP core for one static scale configuration.

    core(xt, sqx, maskf, c, p1, cw, ws_rest, scales, biases)
      → (pooled (M, C_L), mus tuple, vars tuple)
    xt/sqx/maskf/c receive zero gradients (index selection, like the
    reference's int-index CUDA ops).
    """
    gp, sp = _eff_parts(interpret)
    n_layers = len(cs)
    c1, c_last = cs[0], cs[-1]
    params = pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT,
        dimension_semantics=("arbitrary",))

    def _stream(*shape):
        """Per-stream operand: leading batch dim squeezed out of the
        kernel ref, one block per grid step. The squeeze keeps the
        block's trailing dims equal to the array's, sidestepping the
        (8, 128) divisibility rule a moved batch axis would trip."""
        nd = len(shape)
        return pl.BlockSpec((None,) + shape,
                            lambda i: (i,) + (0,) * nd,
                            memory_space=pltpu.VMEM)

    def _run_fwd(b, xtb, sqxb, maskfb, cb, p1b, cwb, ws_rest, scales,
                 biases):
        """One pallas dispatch, grid over the B streams — per-program
        dispatch overhead measured ~30 µs × 24 programs/frame under the
        earlier per-stream lax.map; the grid amortizes it 8×."""
        ut = jnp.triu(jnp.ones((n, n), jnp.bfloat16))
        p1catb = _split_cat(p1b, axis=2, parts=gp)  # (B, N, gp*C1)
        p1row0b = p1b[:, 0:1, :]
        kernel = functools.partial(_fwd_kernel, gp=gp, r2=r2, ns=ns, cs=cs,
                                   eps=eps)
        out_shape = ([jax.ShapeDtypeStruct((b, m, c_last), jnp.float32)]
                     + [jax.ShapeDtypeStruct((b, 1, ci), jnp.float32)
                        for ci in cs] * 2)
        out_specs = ([_stream(m, c_last)]
                     + [_stream(1, ci) for ci in cs] * 2)
        in_specs = ([_stream(3, n), _stream(1, n), _stream(1, n),
                     _full(), _stream(m, 3), _stream(m, c1),
                     _stream(n, gp * c1), _stream(1, c1)]
                    + [_full()] * (n_layers - 1 + 2 * n_layers))
        outs = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=[pltpu.VMEM((ns * m, ci), jnp.float32)
                            for ci in cs],
            compiler_params=params,
            interpret=interpret,
        )(xtb, sqxb, maskfb, ut, cb, cwb, p1catb, p1row0b,
          *ws_rest, *[s.reshape(1, -1) for s in scales],
          *[bb.reshape(1, -1) for bb in biases])
        pooled = outs[0]
        mus = tuple(x.reshape(b, ci)
                    for x, ci in zip(outs[1:1 + n_layers], cs))
        vrs = tuple(x.reshape(b, ci)
                    for x, ci in zip(outs[1 + n_layers:], cs))
        return pooled, mus, vrs

    def _run_bwd(b, xtb, sqxb, maskfb, cb, p1b, cwb, ws_rest, scales,
                 biases, dpooledb):
        ut = jnp.triu(jnp.ones((n, n), jnp.bfloat16))
        p1catb = _split_cat(p1b, axis=2, parts=gp)  # (B, N, gp*C1)
        p1row0b = p1b[:, 0:1, :]
        kernel = functools.partial(_bwd_kernel, gp=gp, sp=sp, r2=r2, ns=ns,
                                   cs=cs,
                                   eps=eps)
        out_shape = (
            [jax.ShapeDtypeStruct((b, n, c1), jnp.float32),   # dp1
             jax.ShapeDtypeStruct((b, m, c1), jnp.float32)]   # dcw
            + [jax.ShapeDtypeStruct((b,) + w.shape, jnp.float32)
               for w in ws_rest]
            + [jax.ShapeDtypeStruct((b, 1, ci), jnp.float32)
               for ci in cs] * 2)
        out_specs = ([_stream(n, c1), _stream(m, c1)]
                     + [_stream(*w.shape) for w in ws_rest]
                     + [_stream(1, ci) for ci in cs] * 2)
        in_specs = ([_stream(3, n), _stream(1, n), _stream(1, n),
                     _full(), _stream(m, 3), _stream(m, c1),
                     _stream(n, gp * c1), _stream(1, c1)]
                    + [_full()] * (n_layers - 1 + 2 * n_layers)
                    + [_stream(m, c_last)])
        outs = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=[pltpu.VMEM((ns * m, ci), jnp.float32)
                            for ci in cs] * 2,
            compiler_params=params,
            interpret=interpret,
        )(xtb, sqxb, maskfb, ut, cb, cwb, p1catb, p1row0b,
          *ws_rest, *[s.reshape(1, -1) for s in scales],
          *[bb.reshape(1, -1) for bb in biases], dpooledb)
        dp1, dcw = outs[0], outs[1]
        dws = tuple(outs[2:2 + n_layers - 1])
        dscales = tuple(x.reshape(b, ci) for x, ci in
                        zip(outs[1 + n_layers:1 + 2 * n_layers], cs))
        dbiases = tuple(x.reshape(b, ci) for x, ci in
                        zip(outs[1 + 2 * n_layers:], cs))
        return dp1, dcw, dws, dscales, dbiases

    def _pack_params(pk, ws_rest, scales, biases):
        eye = jnp.eye(pk, dtype=jnp.float32)
        wbd = tuple(jnp.kron(eye, w) for w in ws_rest)
        sc = tuple(jnp.tile(s.reshape(1, -1), (1, pk)) for s in scales)
        bs = tuple(jnp.tile(bb.reshape(1, -1), (1, pk)) for bb in biases)
        return wbd, sc, bs

    def _pack_streams(pk, bg, xtb, sqxb, maskfb, cb, p1b, cwb):
        p1catb = _split_cat(p1b, axis=2,
                            parts=gp).reshape(bg, pk, n, gp * c1)
        return (xtb.reshape(bg, pk, 3, n), sqxb.reshape(bg, pk, 1, n),
                maskfb.reshape(bg, pk, 1, n), cb.reshape(bg, pk, m, 3),
                cwb.reshape(bg, pk, m, c1), p1catb,
                p1b[:, 0:1, :].reshape(bg, pk, 1, c1))

    def _run_fwd_pk(b, pk, xtb, sqxb, maskfb, cb, p1b, cwb, ws_rest,
                    scales, biases):
        """Stream-lane-packed dispatch: grid of B/pk steps, each fusing
        pk streams into full-width lane tiles (see module comment)."""
        bg = b // pk
        ut = jnp.triu(jnp.ones((n, n), jnp.bfloat16))
        xtp, sqxp, maskfp, cp, cwp, p1catp, p1row0p = _pack_streams(
            pk, bg, xtb, sqxb, maskfb, cb, p1b, cwb)
        wbd, sc, bs = _pack_params(pk, ws_rest, scales, biases)
        kernel = functools.partial(_fwd_kernel_pk, gp=gp, r2=r2, ns=ns, cs=cs,
                                   eps=eps, pk=pk)
        out_shape = ([jax.ShapeDtypeStruct((bg, m, pk * c_last),
                                           jnp.float32)]
                     + [jax.ShapeDtypeStruct((bg, 1, pk * ci), jnp.float32)
                        for ci in cs] * 2)
        out_specs = ([_stream(m, pk * c_last)]
                     + [_stream(1, pk * ci) for ci in cs] * 2)
        in_specs = ([_stream(pk, 3, n), _stream(pk, 1, n),
                     _stream(pk, 1, n), _full(), _stream(pk, m, 3),
                     _stream(pk, m, c1), _stream(pk, n, gp * c1),
                     _stream(pk, 1, c1)]
                    + [_full()] * (n_layers - 1 + 2 * n_layers))
        outs = pl.pallas_call(
            kernel,
            grid=(bg,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=[pltpu.VMEM((ns * m, pk * ci), jnp.float32)
                            for ci in cs],
            compiler_params=params,
            interpret=interpret,
        )(xtp, sqxp, maskfp, ut, cp, cwp, p1catp, p1row0p, *wbd, *sc, *bs)
        pooled = outs[0].reshape(bg, m, pk, c_last).transpose(
            0, 2, 1, 3).reshape(b, m, c_last)
        mus = tuple(x.reshape(b, ci)
                    for x, ci in zip(outs[1:1 + n_layers], cs))
        vrs = tuple(x.reshape(b, ci)
                    for x, ci in zip(outs[1 + n_layers:], cs))
        return pooled, mus, vrs

    def _run_bwd_pk(b, pk, xtb, sqxb, maskfb, cb, p1b, cwb, ws_rest,
                    scales, biases, dpooledb):
        bg = b // pk
        ut = jnp.triu(jnp.ones((n, n), jnp.bfloat16))
        xtp, sqxp, maskfp, cp, cwp, p1catp, p1row0p = _pack_streams(
            pk, bg, xtb, sqxb, maskfb, cb, p1b, cwb)
        wbd, sc, bs = _pack_params(pk, ws_rest, scales, biases)
        dpooledp = dpooledb.reshape(bg, pk, m, c_last).transpose(
            0, 2, 1, 3).reshape(bg, m, pk * c_last)
        kernel = functools.partial(_bwd_kernel_pk, gp=gp, sp=sp, r2=r2, ns=ns,
                                   cs=cs,
                                   eps=eps, pk=pk)
        out_shape = (
            [jax.ShapeDtypeStruct((bg, pk, n, c1), jnp.float32),   # dp1
             jax.ShapeDtypeStruct((bg, m, pk * c1), jnp.float32)]  # dcw
            + [jax.ShapeDtypeStruct(
                (bg, pk * w.shape[0], pk * w.shape[1]), jnp.float32)
               for w in ws_rest]
            + [jax.ShapeDtypeStruct((bg, 1, pk * ci), jnp.float32)
               for ci in cs] * 2)
        out_specs = ([_stream(pk, n, c1), _stream(m, pk * c1)]
                     + [_stream(pk * w.shape[0], pk * w.shape[1])
                        for w in ws_rest]
                     + [_stream(1, pk * ci) for ci in cs] * 2)
        in_specs = ([_stream(pk, 3, n), _stream(pk, 1, n),
                     _stream(pk, 1, n), _full(), _stream(pk, m, 3),
                     _stream(pk, m, c1), _stream(pk, n, gp * c1),
                     _stream(pk, 1, c1)]
                    + [_full()] * (n_layers - 1 + 2 * n_layers)
                    + [_stream(m, pk * c_last)])
        outs = pl.pallas_call(
            kernel,
            grid=(bg,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=[pltpu.VMEM((ns * m, pk * ci), jnp.float32)
                            for ci in cs] * 2,
            compiler_params=params,
            interpret=interpret,
        )(xtp, sqxp, maskfp, ut, cp, cwp, p1catp, p1row0p, *wbd, *sc,
          *bs, dpooledp)
        dp1 = outs[0].reshape(b, n, c1)
        dcw = outs[1].reshape(bg, m, pk, c1).transpose(
            0, 2, 1, 3).reshape(b, m, c1)
        dws = tuple(
            jnp.stack([x[:, p * w.shape[0]:(p + 1) * w.shape[0],
                         p * w.shape[1]:(p + 1) * w.shape[1]]
                       for p in range(pk)], axis=1).reshape(
                (b,) + w.shape)
            for x, w in zip(outs[2:2 + n_layers - 1], ws_rest))
        dscales = tuple(x.reshape(b, ci) for x, ci in
                        zip(outs[1 + n_layers:1 + 2 * n_layers], cs))
        dbiases = tuple(x.reshape(b, ci) for x, ci in
                        zip(outs[1 + 2 * n_layers:], cs))
        return dp1, dcw, dws, dscales, dbiases

    def _bcast(x, batched, b):
        return x if batched else jnp.broadcast_to(x[None], (b,) + x.shape)

    @jax.custom_batching.custom_vmap
    def fwd_call(xt, sqx, maskf, c, p1, cw, ws_rest, scales, biases):
        pooled, mus, vrs = _run_fwd(
            1, xt[None], sqx[None], maskf[None], c[None], p1[None],
            cw[None], ws_rest, scales, biases)
        return (pooled[0], tuple(x[0] for x in mus),
                tuple(x[0] for x in vrs))

    @fwd_call.def_vmap
    def _fwd_vmap(axis_size, in_batched, xt, sqx, maskf, c, p1, cw,
                  ws_rest, scales, biases):
        pb = in_batched[6:]
        if any(jax.tree_util.tree_leaves(pb)):
            raise NotImplementedError(
                "fused SA train kernel: vmap over MLP parameters")
        b = axis_size
        args = [_bcast(x, bt, b) for x, bt in
                zip((xt, sqx, maskf, c, p1, cw), in_batched[:6])]
        pk = _pick_pk(b, cs, n, m, ns, gp)
        if pk > 1:
            outs = _run_fwd_pk(b, pk, *args, ws_rest, scales, biases)
        else:
            outs = _run_fwd(b, *args, ws_rest, scales, biases)
        L = len(cs)
        return outs, (True, (True,) * L, (True,) * L)

    @jax.custom_batching.custom_vmap
    def bwd_call(xt, sqx, maskf, c, p1, cw, ws_rest, scales, biases,
                 dpooled):
        dp1, dcw, dws, dscales, dbiases = _run_bwd(
            1, xt[None], sqx[None], maskf[None], c[None], p1[None],
            cw[None], ws_rest, scales, biases, dpooled[None])
        return (dp1[0], dcw[0], tuple(w[0] for w in dws),
                tuple(s[0] for s in dscales),
                tuple(bb[0] for bb in dbiases))

    @bwd_call.def_vmap
    def _bwd_vmap(axis_size, in_batched, xt, sqx, maskf, c, p1, cw,
                  ws_rest, scales, biases, dpooled):
        pb = in_batched[6:9]
        if any(jax.tree_util.tree_leaves(pb)):
            raise NotImplementedError(
                "fused SA train kernel: vmap over MLP parameters")
        b = axis_size
        args = [_bcast(x, bt, b) for x, bt in
                zip((xt, sqx, maskf, c, p1, cw), in_batched[:6])]
        dpooledb = _bcast(dpooled, in_batched[9], b)
        pk = _pick_pk(b, cs, n, m, ns, gp)
        if pk > 1:
            outs = _run_bwd_pk(b, pk, *args, ws_rest, scales, biases,
                               dpooledb)
        else:
            outs = _run_bwd(b, *args, ws_rest, scales, biases, dpooledb)
        L = len(cs)
        return outs, (True, True, (True,) * (L - 1), (True,) * L,
                      (True,) * L)

    @jax.custom_vjp
    def core(xt, sqx, maskf, c, p1, cw, ws_rest, scales, biases):
        return fwd_call(xt, sqx, maskf, c, p1, cw, ws_rest, scales,
                        biases)

    def core_fwd(xt, sqx, maskf, c, p1, cw, ws_rest, scales, biases):
        out = fwd_call(xt, sqx, maskf, c, p1, cw, ws_rest, scales,
                       biases)
        return out, (xt, sqx, maskf, c, p1, cw, ws_rest, scales, biases)

    def core_bwd(res, cots):
        xt, sqx, maskf, c, p1, cw, ws_rest, scales, biases = res
        dpooled, _dmus, _dvars = cots   # stats feed only the
        # non-differentiated running-average update; their cotangents are
        # structurally zero in the training graph and are ignored here.
        dp1, dcw, dws, dscales, dbiases = bwd_call(
            xt, sqx, maskf, c, p1, cw, ws_rest, scales, biases, dpooled)
        return (jnp.zeros_like(xt), jnp.zeros_like(sqx),
                jnp.zeros_like(maskf), jnp.zeros_like(c),
                dp1, dcw, dws, dscales, dbiases)

    core.defvjp(core_fwd, core_bwd)
    # exposed for the radius-pair core's pk=1 fallback (calling the
    # custom_vmap'd primitives directly composes with an outer vmap and
    # keeps per-scale pk selection)
    core._fwd_call = fwd_call
    core._bwd_call = bwd_call
    return core


def fused_sa_scale_train(xyz, centers, features, mask, ws, scales,
                         biases, *, radius: float, nsample: int,
                         eps: float = 1e-5,
                         interpret: bool | None = None):
    """Fused train-mode SA scale: selection + group + MLP/BN + max-pool.

    Args:
      xyz: (N, 3) f32 points; centers: (M, 3) f32 (M·ns tensors must fit
        VMEM — the live 512/512 config does; the caller gates).
      features: optional (N, C); mask: optional (N,) bool.
      ws: L Dense kernels, ws[0] (3+C, C1) with xyz rows first
        (QueryAndGroup concat order); no biases (BN mode).
      scales/biases: L batch-norm affine pairs, (C_l,).
      radius/nsample: ball parameters (static).
    Returns:
      (pooled (M, C_L) f32, mus, vars) — mus/vars are the per-layer
      train-mode batch statistics for the running-average update.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, m = xyz.shape[0], centers.shape[0]
    xyz = xyz.astype(jnp.float32)
    centers = centers.astype(jnp.float32)
    w1 = ws[0].astype(jnp.float32)
    # layer-1 hoist at HIGHEST: P1/CW carry absolute-coordinate terms
    # whose difference is small — bf16-pass rounding here would dwarf the
    # pair values (the unfused path subtracts *before* its matmul)
    hp = jax.lax.Precision.HIGHEST
    p1 = jnp.dot(xyz, w1[:3], precision=hp)
    if features is not None:
        p1 = p1 + jnp.dot(features.astype(jnp.float32), w1[3:],
                          precision=hp)
    cw = jnp.dot(centers, w1[:3], precision=hp)

    xt = xyz.T
    sqx = jnp.sum(xyz * xyz, axis=1)[None, :]
    maskf = (jnp.ones((1, n), jnp.float32) if mask is None
             else mask.astype(jnp.float32)[None, :])

    cs = tuple(int(w.shape[1]) for w in ws)
    core = _make_core(float(radius) ** 2, int(nsample), cs, n, m,
                      float(eps), bool(interpret))
    return core(xt, sqx, maskf, centers, p1, cw,
                tuple(w.astype(jnp.float32) for w in ws[1:]),
                tuple(s.astype(jnp.float32) for s in scales),
                tuple(b.astype(jnp.float32) for b in biases))


# ---------------------------------------------------------------------------
# Radius-pair kernels: both scales of one SA-MSG level in ONE program.
#
# Every SetAbstractionMSG level runs two ball radii over the SAME centers
# and cloud (reference pointnet2_modules.py:19-94). As separate kernels
# each pays its own launch (~25-50 µs measured per custom-call on v5e)
# plus its own (M, N) distance matrix and shared-operand DMA. The pair
# kernel shares all of it — mirroring the eval path's _sa_pair_kernel
# (ops/pallas_sa.py), which measured the same win in round 2:
#   * selection: d2 computed ONCE per stream; per-scale hit masks/ranks
#     derive from it (bit-identical expressions to _selection);
#   * the two scales then run SEQUENTIALLY through SHARED scratch refs
#     sized for the larger scale — together the sa3 pair at pk=2 would
#     need ~100 MB of per-scale scratch, over budget, while reuse fits.
#     Row slices are per-scale (ns_s·M of ns_max·M); lane slices appear
#     only where the scales' layer widths differ and the wrapper gates
#     pk so every such slice is a 128-lane multiple (Mosaic alignment);
#     layer-0 widths are structurally equal (same input channels).
#   * pk=1 / indivisible batches fall back to the single-scale cores
#     (their own custom_vmap rules re-pick per-scale pk).
# Numerics: identical op sequence per scale to the pk kernels above →
# the same class (pk>1 reassociation ulps vs pk=1; exact gathers).
# ---------------------------------------------------------------------------


def _pair_ranks(xt_ref, sqx_ref, maskf_ref, ut, c_ref, r2s, pk):
    """Shared selection: ONE d2 per stream, a (rank, hits) per scale.
    Expressions match _selection bitwise (same order of ops)."""
    ranks = [[] for _ in r2s]
    hits = [[] for _ in r2s]
    for p in range(pk):
        c = c_ref[p]
        xt = xt_ref[p]
        sqc = jnp.sum(c * c, axis=1, keepdims=True)
        prod = (c[:, 0:1] * xt[0:1, :] + c[:, 1:2] * xt[1:2, :]
                + c[:, 2:3] * xt[2:3, :])
        d2 = jnp.maximum(sqc + sqx_ref[p] - 2.0 * prod, 0.0)
        maskf = maskf_ref[p]
        for si, r2 in enumerate(r2s):
            hitf = jnp.logical_and(d2 < r2,
                                   maskf > 0.0).astype(jnp.float32)
            rank = jax.lax.dot(hitf.astype(jnp.bfloat16), ut,
                               preferred_element_type=jnp.float32)
            ranks[si].append(jnp.where(hitf > 0.0, rank, 0.0))
            hits[si].append(jnp.sum(hitf, axis=1, keepdims=True))
    return ranks, hits


def _packed_gather(ranks, hits, p1cat_ref, cw_ref, p1row0_ref, act0_ref,
                   *, ns, c1, m, pk, gp):
    """Packed g1 materialization for ONE scale from precomputed
    selection (the gather half of _packed_selection_gather); writes rows
    [0 : ns·m) of act0_ref (whose lane width is exactly pk·c1).
    Returns hits_lanes (m, pk·c1)."""
    hits_lanes = jnp.concatenate(
        [hits[p] * jnp.ones((m, c1), jnp.float32) for p in range(pk)],
        axis=1)
    cw_pk = jnp.concatenate([cw_ref[p] for p in range(pk)], axis=1)
    row0_pk = jnp.concatenate([p1row0_ref[p] for p in range(pk)], axis=1)
    g = min(ns, _SLOT_BLOCK)
    nblk = ns // g
    s_io = jax.lax.broadcasted_iota(jnp.int32, (g, m, 1),
                                    0).astype(jnp.float32)

    def block(s0):
        sv = s_io[:, 0:1, 0:1] + (s0 + 1.0)
        pieces = []
        for p in range(pk):
            oh = (ranks[p][None] == sv).astype(jnp.bfloat16).reshape(
                g * m, -1)
            pieces.append(_fold3(jax.lax.dot(
                oh, p1cat_ref[p], preferred_element_type=jnp.float32),
                c1, gp))
        return jnp.concatenate(pieces, axis=1)

    sb0 = block(0.0)
    first = jnp.where(hits_lanes > 0.0, sb0[0:m], row0_pk)

    def livefix(sb, s0):
        live = (s_io + s0) < hits_lanes[None]
        out = jnp.where(live, sb.reshape(g, m, pk * c1),
                        first[None]) - cw_pk[None]
        return out.reshape(g * m, pk * c1)

    act0_ref[0:g * m, :] = livefix(sb0, 0.0)

    def body(i, _):
        s0 = i.astype(jnp.float32) * g
        act0_ref[pl.ds(i * (g * m), g * m), :] = livefix(block(s0), s0)
        return 0

    jax.lax.fori_loop(1, nblk, body, 0)
    return hits_lanes


def _pair_fwd_kernel_pk(xt_ref, sqx_ref, maskf_ref, ut_ref, c_ref, *refs,
                        r2s, nss, css, eps: float, pk: int, gp: int):
    """Packed pair forward: shared selection, scales sequential through
    shared scratch. Emits the per-layer NORMALIZED activations (xhat,
    lane-packed) as outputs — the backward consumes them instead of
    re-running gather + dots + batch stats (the recompute was ~40% of
    the backward kernel's time). Pooled values stay bit-identical to
    the recompute formulation: the activation keeps the fused
    (inv·scale) expression; xhat is an extra (h−mu)·inv pass."""
    L = len(css[0])
    per_in = 3 * L + 2               # cw, p1cat, row0, ws(L-1), sc(L), bi(L)
    ins = [refs[s * per_in:(s + 1) * per_in] for s in range(2)]
    k = 2 * per_in
    per_out = 1 + 3 * L              # pooled, mu(L), var(L), xhat(L)
    outs = [refs[k + s * per_out:k + (s + 1) * per_out] for s in range(2)]
    act_refs = refs[k + 2 * per_out:]
    m = c_ref.shape[1]

    ranks, hits = _pair_ranks(xt_ref, sqx_ref, maskf_ref, ut_ref[...],
                              c_ref, r2s, pk)
    for si in range(2):
        cw_ref, p1cat_ref, row0_ref = ins[si][0:3]
        ws = ins[si][3:3 + L - 1]
        scales = ins[si][3 + L - 1:3 + 2 * L - 1]
        biases = ins[si][3 + 2 * L - 1:3 + 3 * L - 1]
        pooled_ref = outs[si][0]
        mu_refs = outs[si][1:1 + L]
        var_refs = outs[si][1 + L:1 + 2 * L]
        xh_refs = outs[si][1 + 2 * L:]
        ns, cs = nss[si], css[si]
        rows = ns * m
        count = jnp.float32(rows)
        _packed_gather(ranks[si], hits[si], p1cat_ref, cw_ref, row0_ref,
                       act_refs[0], ns=ns, c1=cs[0], m=m, pk=pk, gp=gp)
        for li in range(L):
            w = pk * cs[li]
            if li > 0:
                a_prev = act_refs[li - 1][0:rows, 0:pk * cs[li - 1]]
                act_refs[li][0:rows, 0:w] = jax.lax.dot(
                    a_prev.astype(jnp.bfloat16),
                    ws[li - 1][...].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
            h = act_refs[li][0:rows, 0:w]
            mu, var = _batch_stats(h, count)
            mu_refs[li][...] = mu
            var_refs[li][...] = var
            # the stash IS the forward chain: act derives from xh with
            # the same unfused expression every backward (pair stash or
            # single-scale recompute) uses, so gradients are
            # bit-identical to the recompute formulation. (The
            # single-scale fwd kernels fuse (inv·scale) instead — an
            # ulp-level forward difference the pair tests bound.)
            xh = (h - mu) * jax.lax.rsqrt(var + eps)
            xh_refs[li][...] = xh
            act_refs[li][0:rows, 0:w] = jnp.maximum(
                xh * scales[li][...] + biases[li][...], 0.0)
        c_last = cs[-1]
        a_last = act_refs[L - 1][0:rows, 0:pk * c_last].reshape(
            ns, m, pk * c_last)
        pooled_ref[...] = jnp.max(a_last, axis=0)


def _hits_lanes_of(hits, m, c1, pk):
    """Broadcast per-stream hit counts into their lane groups."""
    return jnp.concatenate(
        [hits[p] * jnp.ones((m, c1), jnp.float32) for p in range(pk)],
        axis=1)


def _pair_bwd_kernel_pk(xt_ref, sqx_ref, maskf_ref, ut_ref, c_ref, *refs,
                        r2s, nss, css, eps: float, pk: int, sp: int):
    """Packed pair backward from STASHED forward state: selection is
    re-derived (cheap — one d2 per stream, rank matmuls per scale, all
    needed by the scatter anyway), but the per-layer xhat tensors and
    batch variances arrive as kernel inputs from the forward, replacing
    the gather + MLP-dot + batch-stat recompute that was ~40% of this
    kernel. Gradients are bit-identical to the recompute formulation
    (the stash stores the exact expression the recompute produced)."""
    L = len(css[0])
    per_in = 3 * L + 2
    ins = [refs[s * per_in:(s + 1) * per_in] for s in range(2)]
    k = 2 * per_in
    dpooled_refs = refs[k:k + 2]
    k += 2
    var_ins = [refs[k:k + L], refs[k + L:k + 2 * L]]
    k += 2 * L
    xh_ins = [refs[k:k + L], refs[k + L:k + 2 * L]]
    k += 2 * L
    per_out = 3 * L + 1              # dp1, dcw, dw(L-1), dscale(L), dbias(L)
    outs = [refs[k + s * per_out:k + (s + 1) * per_out] for s in range(2)]
    d_refs = refs[k + 2 * per_out:]
    m = c_ref.shape[1]

    ranks, hits = _pair_ranks(xt_ref, sqx_ref, maskf_ref, ut_ref[...],
                              c_ref, r2s, pk)
    for si in range(2):
        ws = ins[si][3:3 + L - 1]
        scales = ins[si][3 + L - 1:3 + 2 * L - 1]
        biases = ins[si][3 + 2 * L - 1:3 + 3 * L - 1]
        dp1_ref = outs[si][0]
        dcw_ref = outs[si][1]
        dw_refs = outs[si][2:2 + L - 1]
        dscale_refs = outs[si][1 + L:1 + 2 * L]
        dbias_refs = outs[si][1 + 2 * L:1 + 3 * L]
        ns, cs = nss[si], css[si]
        c1 = cs[0]
        rows = ns * m
        count = jnp.float32(rows)

        hits_lanes = _hits_lanes_of(hits[si], m, c1, pk)
        invs = [jax.lax.rsqrt(var_ins[si][li][...] + eps)
                for li in range(L)]

        c_last = cs[-1]
        a_last = jnp.maximum(
            xh_ins[si][L - 1][...] * scales[L - 1][...]
            + biases[L - 1][...], 0.0)
        a3 = a_last.reshape(ns, m, pk * c_last)
        pooled = jnp.max(a3, axis=0)
        ties = (a3 == pooled[None]).astype(jnp.float32)
        cnt = jnp.sum(ties, axis=0)
        dpool = dpooled_refs[si][...] / cnt
        d_refs[L - 1][0:rows, 0:pk * c_last] = (
            ties * dpool[None]).reshape(rows, pk * c_last)

        for li in range(L - 1, -1, -1):
            w = pk * cs[li]
            xhat = xh_ins[si][li][...]
            z = xhat * scales[li][...] + biases[li][...]
            dz = d_refs[li][0:rows, 0:w] * (z > 0.0).astype(jnp.float32)
            dscale_refs[li][...] = jnp.sum(dz * xhat, axis=0,
                                           keepdims=True)
            dbias_refs[li][...] = jnp.sum(dz, axis=0, keepdims=True)
            # Σdxhat = scale·dbias, Σ(dxhat·xhat) = scale·dscale (see
            # _bwd_kernel): two fewer full reduction passes per layer
            dh = (invs[li] * scales[li][...]) * (
                dz - dbias_refs[li][...] / count
                - xhat * (dscale_refs[li][...] / count))
            if li > 0:
                w_prev = pk * cs[li - 1]
                a_lm1 = jnp.maximum(
                    xh_ins[si][li - 1][...]
                    * scales[li - 1][...] + biases[li - 1][...], 0.0)
                dw_refs[li - 1][...] = jax.lax.dot_general(
                    a_lm1.astype(jnp.bfloat16), dh.astype(jnp.bfloat16),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                d_refs[li - 1][0:rows, 0:w_prev] = jax.lax.dot(
                    dh.astype(jnp.bfloat16),
                    ws[li - 1][...].T.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
            else:
                d_refs[0][0:rows, :] = dh
                dg1 = dh.reshape(ns, m, pk * c1)
                dcw_ref[...] = -jnp.sum(dg1, axis=0)
                g = min(ns, _SLOT_BLOCK)
                nblk = ns // g
                s_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (ns, m, 1), 0).astype(jnp.float32)
                livem = (s_iota < hits_lanes[None]).astype(jnp.float32)
                extra = jnp.sum(dg1 * (1.0 - livem), axis=0)
                s_io = jax.lax.broadcasted_iota(
                    jnp.int32, (g, m, 1), 0).astype(jnp.float32)

                for p in range(pk):
                    rank_p = ranks[si][p]
                    hits_p = hits_lanes[:, p * c1:p * c1 + 1]

                    def scat_block(s0, _rank=rank_p, _p=p,
                                   _hits=hits_p):
                        start = s0.astype(jnp.int32) * (g * m)
                        dblk = d_refs[0][pl.ds(start, g * m), :]
                        eff_pk = dblk[:, _p * c1:(_p + 1) * c1]
                        live = ((s_io + s0.astype(jnp.float32) * g)
                                < _hits[None]).astype(jnp.float32)
                        eff = (eff_pk.reshape(g, m, c1)
                               * live).reshape(g * m, c1)
                        sv = s_io[:, 0:1, 0:1] + (
                            s0.astype(jnp.float32) * g + 1.0)
                        oh = (_rank[None] == sv).astype(
                            jnp.bfloat16).reshape(g * m, -1)
                        return _fold3(jax.lax.dot_general(
                            oh, _bf16_cat3(eff, sp),
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32), c1, sp)

                    extra_p = extra[:, p * c1:(p + 1) * c1]
                    oh1 = (rank_p == 1.0).astype(jnp.bfloat16)
                    dp1_ref[p] = _fold3(jax.lax.dot_general(
                        oh1,
                        _bf16_cat3(jnp.where(hits_p > 0.0, extra_p, 0.0), sp),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32), c1, sp)
                    dp1_ref[p] += scat_block(jnp.int32(0))

                    def body(i, _, _scat=scat_block, _p=p):
                        dp1_ref[_p] += _scat(i)
                        return 0

                    jax.lax.fori_loop(1, nblk, body, 0)
                    ex0 = jnp.where(hits_p > 0.0, 0.0, extra_p)
                    ones = jnp.ones((1, m), jnp.bfloat16)
                    row0 = _fold3(jax.lax.dot(
                        ones, _bf16_cat3(ex0, sp),
                        preferred_element_type=jnp.float32), c1, sp)
                    dp1_ref[p, 0:1, :] += row0


def _pick_pk_pair(b: int, cs_a: tuple, cs_b: tuple, n: int, m: int,
                  ns_a: int, ns_b: int, gp: int) -> int:
    """Packing factor for the pair kernel: must exactly fill the
    narrowest layer's lane tile (so every differing-width lane slice is
    a 128-multiple), divide the batch, and fit shared scratch + the
    doubled selection state in scoped VMEM."""
    want = max(1, 128 // min(min(cs_a), min(cs_b)))
    if want < 2 or b % want or want > b:
        return 1
    pk = want
    if any(ca != cb and (pk * min(ca, cb)) % 128
           for ca, cb in zip(cs_a, cs_b)):
        return 1
    rows = max(ns_a, ns_b) * m
    # d-cotangent scratch + the stashed-xhat input blocks (both scales
    # resident per grid step; the backward no longer recomputes)
    scratch = (rows * pk * sum(max(ca, cb)
                               for ca, cb in zip(cs_a, cs_b)) * 4
               + (ns_a * m * sum(cs_a) + ns_b * m * sum(cs_b)) * pk * 4)
    aux = (2 * pk * m * n * 4                       # two ranks per stream
           + pk * n * n * 4                         # d2 temporaries
           + 2 * pk * n * gp * cs_a[0] * 2           # both scales' p1cat
           + n * n * 2
           + min(max(ns_a, ns_b), _SLOT_BLOCK) * m * n * 2
           + 2 * min(max(ns_a, ns_b), _SLOT_BLOCK) * m * pk
           * cs_a[0] * 4)
    return pk if scratch + aux <= 64 * 1024 * 1024 else 1


@functools.lru_cache(maxsize=None)
def _make_pair_core(r2a: float, nsa: int, csa: tuple, r2b: float,
                    nsb: int, csb: tuple, n: int, m: int, eps: float,
                    interpret: bool):
    """Custom-VJP core running BOTH scales of one SA-MSG level in one
    pallas dispatch (see the section comment above). Signature:

    core(xt, sqx, maskf, c, p1a, cwa, p1b, cwb,
         ws_a_rest, scales_a, biases_a, ws_b_rest, scales_b, biases_b)
      → (pooled_a, mus_a, vars_a, pooled_b, mus_b, vars_b)
    """
    gp, sp = _eff_parts(interpret)
    core_a = _make_core(r2a, nsa, tuple(csa), n, m, eps, interpret)
    core_b = _make_core(r2b, nsb, tuple(csb), n, m, eps, interpret)
    assert len(csa) == len(csb) and csa[0] == csb[0]
    L = len(csa)
    c1 = csa[0]
    css = (tuple(csa), tuple(csb))
    nss = (nsa, nsb)
    r2s = (r2a, r2b)
    rows_max = max(nsa, nsb) * m
    cmax = tuple(max(a, b) for a, b in zip(csa, csb))
    params = pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT,
        dimension_semantics=("arbitrary",))

    def _stream(*shape):
        nd = len(shape)
        return pl.BlockSpec((None,) + shape,
                            lambda i: (i,) + (0,) * nd,
                            memory_space=pltpu.VMEM)

    def _pack_params(pk, ws_rest, scales, biases):
        eye = jnp.eye(pk, dtype=jnp.float32)
        wbd = tuple(jnp.kron(eye, w) for w in ws_rest)
        sc = tuple(jnp.tile(s.reshape(1, -1), (1, pk)) for s in scales)
        bs = tuple(jnp.tile(bb.reshape(1, -1), (1, pk)) for bb in biases)
        return wbd, sc, bs

    def _shared_streams(pk, bg, xtb, sqxb, maskfb, cb):
        return (xtb.reshape(bg, pk, 3, n), sqxb.reshape(bg, pk, 1, n),
                maskfb.reshape(bg, pk, 1, n), cb.reshape(bg, pk, m, 3))

    def _scale_streams(pk, bg, p1b_, cwb_):
        p1catp = _split_cat(p1b_, axis=2, parts=gp).reshape(bg, pk, n,
                                                            gp * c1)
        return (cwb_.reshape(bg, pk, m, c1), p1catp,
                p1b_[:, 0:1, :].reshape(bg, pk, 1, c1))

    def _run_pair_fwd_pk(b, pk, xtb, sqxb, maskfb, cb, p1a, cwa, p1b,
                         cwb, wsa, sca, bia, wsb, scb, bib):
        bg = b // pk
        ut = jnp.triu(jnp.ones((n, n), jnp.bfloat16))
        shared = _shared_streams(pk, bg, xtb, sqxb, maskfb, cb)
        sc_a = _scale_streams(pk, bg, p1a, cwa)
        sc_b = _scale_streams(pk, bg, p1b, cwb)
        wbda, scpa, bspa = _pack_params(pk, wsa, sca, bia)
        wbdb, scpb, bspb = _pack_params(pk, wsb, scb, bib)
        kernel = functools.partial(_pair_fwd_kernel_pk, gp=gp, r2s=r2s,
                                   nss=nss,
                                   css=css, eps=eps, pk=pk)
        out_shape, out_specs = [], []
        for cs, ns_s in zip(css, nss):
            out_shape += ([jax.ShapeDtypeStruct((bg, m, pk * cs[-1]),
                                                jnp.float32)]
                          + [jax.ShapeDtypeStruct((bg, 1, pk * ci),
                                                  jnp.float32)
                             for ci in cs] * 2
                          + [jax.ShapeDtypeStruct(
                              (bg, ns_s * m, pk * ci), jnp.float32)
                             for ci in cs])
            out_specs += ([_stream(m, pk * cs[-1])]
                          + [_stream(1, pk * ci) for ci in cs] * 2
                          + [_stream(ns_s * m, pk * ci) for ci in cs])
        in_specs = ([_stream(pk, 3, n), _stream(pk, 1, n),
                     _stream(pk, 1, n), _full(), _stream(pk, m, 3)]
                    + ([_stream(pk, m, c1), _stream(pk, n, gp * c1),
                        _stream(pk, 1, c1)]
                       + [_full()] * (3 * L - 1)) * 2)
        outs = pl.pallas_call(
            kernel,
            grid=(bg,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=[pltpu.VMEM((rows_max, pk * ci), jnp.float32)
                            for ci in cmax],
            compiler_params=params,
            interpret=interpret,
        )(*shared[:3], ut, shared[3],
          *sc_a, *wbda, *scpa, *bspa,
          *sc_b, *wbdb, *scpb, *bspb)
        res = []
        xhs = []
        per = 1 + 3 * L
        for si, cs in enumerate(css):
            o = outs[si * per:(si + 1) * per]
            pooled = o[0].reshape(bg, m, pk, cs[-1]).transpose(
                0, 2, 1, 3).reshape(b, m, cs[-1])
            mus = tuple(x.reshape(b, ci)
                        for x, ci in zip(o[1:1 + L], cs))
            vrs = tuple(x.reshape(b, ci)
                        for x, ci in zip(o[1 + L:1 + 2 * L], cs))
            res += [pooled, mus, vrs]
            # the xhat stash stays in its packed (bg, rows, pk·c) layout:
            # it exists only to round-trip to the backward kernel, which
            # reads the same layout (unpacking would cost lane shuffles
            # over ~GBs per step)
            xhs.append(tuple(o[1 + 2 * L:]))
        return tuple(res) + (xhs[0], xhs[1])

    def _run_pair_bwd_pk(b, pk, xtb, sqxb, maskfb, cb, p1a, cwa, p1b,
                         cwb, wsa, sca, bia, wsb, scb, bib, dpa, dpb,
                         vra, vrb, xha, xhb):
        bg = b // pk
        ut = jnp.triu(jnp.ones((n, n), jnp.bfloat16))
        shared = _shared_streams(pk, bg, xtb, sqxb, maskfb, cb)
        sc_a = _scale_streams(pk, bg, p1a, cwa)
        sc_b = _scale_streams(pk, bg, p1b, cwb)
        wbda, scpa, bspa = _pack_params(pk, wsa, sca, bia)
        wbdb, scpb, bspb = _pack_params(pk, wsb, scb, bib)
        dpooled = []
        for dp, cs in zip((dpa, dpb), css):
            dpooled.append(dp.reshape(bg, pk, m, cs[-1]).transpose(
                0, 2, 1, 3).reshape(bg, m, pk * cs[-1]))
        # per-stream (b, ci) variances repack losslessly to lane groups
        varp = [tuple(v.reshape(bg, 1, pk * ci) for v, ci in
                      zip(vs, cs))
                for vs, cs in zip((vra, vrb), css)]
        kernel = functools.partial(_pair_bwd_kernel_pk, sp=sp, r2s=r2s,
                                   nss=nss,
                                   css=css, eps=eps, pk=pk)
        out_shape, out_specs = [], []
        for cs, ws in zip(css, (wsa, wsb)):
            out_shape += (
                [jax.ShapeDtypeStruct((bg, pk, n, c1), jnp.float32),
                 jax.ShapeDtypeStruct((bg, m, pk * c1), jnp.float32)]
                + [jax.ShapeDtypeStruct(
                    (bg, pk * w.shape[0], pk * w.shape[1]), jnp.float32)
                   for w in ws]
                + [jax.ShapeDtypeStruct((bg, 1, pk * ci), jnp.float32)
                   for ci in cs] * 2)
            out_specs += ([_stream(pk, n, c1), _stream(m, pk * c1)]
                          + [_stream(pk * w.shape[0], pk * w.shape[1])
                             for w in ws]
                          + [_stream(1, pk * ci) for ci in cs] * 2)
        in_specs = ([_stream(pk, 3, n), _stream(pk, 1, n),
                     _stream(pk, 1, n), _full(), _stream(pk, m, 3)]
                    + ([_stream(pk, m, c1), _stream(pk, n, gp * c1),
                        _stream(pk, 1, c1)]
                       + [_full()] * (3 * L - 1)) * 2
                    + [_stream(m, pk * csa[-1]),
                       _stream(m, pk * csb[-1])]
                    + [_stream(1, pk * ci) for ci in csa]
                    + [_stream(1, pk * ci) for ci in csb]
                    + [_stream(nsa * m, pk * ci) for ci in csa]
                    + [_stream(nsb * m, pk * ci) for ci in csb])
        outs = pl.pallas_call(
            kernel,
            grid=(bg,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=[pltpu.VMEM((rows_max, pk * ci), jnp.float32)
                            for ci in cmax],
            compiler_params=params,
            interpret=interpret,
        )(*shared[:3], ut, shared[3],
          *sc_a, *wbda, *scpa, *bspa,
          *sc_b, *wbdb, *scpb, *bspb, *dpooled,
          *varp[0], *varp[1], *xha, *xhb)
        res = []
        pos = 0
        for cs, ws in zip(css, (wsa, wsb)):
            per = 2 + len(ws) + 2 * L
            o = outs[pos:pos + per]
            pos += per
            dp1 = o[0].reshape(b, n, c1)
            dcw = o[1].reshape(bg, m, pk, c1).transpose(
                0, 2, 1, 3).reshape(b, m, c1)
            dws = tuple(
                jnp.stack([x[:, p * w.shape[0]:(p + 1) * w.shape[0],
                             p * w.shape[1]:(p + 1) * w.shape[1]]
                           for p in range(pk)], axis=1).reshape(
                    (b,) + w.shape)
                for x, w in zip(o[2:2 + len(ws)], ws))
            dscales = tuple(x.reshape(b, ci) for x, ci in
                            zip(o[2 + len(ws):2 + len(ws) + L], cs))
            dbiases = tuple(x.reshape(b, ci) for x, ci in
                            zip(o[2 + len(ws) + L:], cs))
            res += [dp1, dcw, dws, dscales, dbiases]
        return tuple(res)

    def _bcast(x, batched, b):
        return x if batched else jnp.broadcast_to(x[None], (b,) + x.shape)

    def _zero_xhats(bg, pk):
        """Placeholder stash for paths whose backward recomputes (the
        single-scale fallbacks emit no xhat)."""
        return (tuple(jnp.zeros((bg, nsa * m, pk * ci), jnp.float32)
                      for ci in csa),
                tuple(jnp.zeros((bg, nsb * m, pk * ci), jnp.float32)
                      for ci in csb))

    @jax.custom_batching.custom_vmap
    def fwd_call(xt, sqx, maskf, c, p1a, cwa, p1b, cwb, wsa, sca, bia,
                 wsb, scb, bib):
        oa = core_a._fwd_call(xt, sqx, maskf, c, p1a, cwa, wsa, sca, bia)
        ob = core_b._fwd_call(xt, sqx, maskf, c, p1b, cwb, wsb, scb, bib)
        return oa + ob + _zero_xhats(1, 1)

    @fwd_call.def_vmap
    def _fwd_vmap(axis_size, in_batched, xt, sqx, maskf, c, p1a, cwa,
                  p1b, cwb, wsa, sca, bia, wsb, scb, bib):
        if any(jax.tree_util.tree_leaves(in_batched[8:])):
            raise NotImplementedError(
                "fused SA pair train kernel: vmap over MLP parameters")
        b = axis_size
        args = [_bcast(x, bt, b) for x, bt in
                zip((xt, sqx, maskf, c, p1a, cwa, p1b, cwb),
                    in_batched[:8])]
        pk = _pick_pk_pair(b, csa, csb, n, m, nsa, nsb, gp)
        if pk > 1:
            outs = _run_pair_fwd_pk(b, pk, *args, wsa, sca, bia,
                                    wsb, scb, bib)
        else:
            oa = jax.vmap(lambda x1, x2, x3, x4, x5, x6:
                          core_a._fwd_call(x1, x2, x3, x4, x5, x6,
                                           wsa, sca, bia))(*args[:6])
            ob = jax.vmap(lambda x1, x2, x3, x4, x5, x6:
                          core_b._fwd_call(x1, x2, x3, x4, x5, x6,
                                           wsb, scb, bib))(
                *args[:4], *args[6:8])
            outs = oa + ob + _zero_xhats(1, 1)
        bt = (True, (True,) * L, (True,) * L)
        # the xhat stash keeps its packed (bg, rows, pk·c) layout with NO
        # mapped axis (batched=False): its only consumer is bwd_call,
        # whose kernel reads the same layout — unpacking to a per-stream
        # b axis would shuffle ~GBs of lanes per step for nothing
        return outs, bt + bt + ((False,) * L, (False,) * L)

    @jax.custom_batching.custom_vmap
    def bwd_call(xt, sqx, maskf, c, p1a, cwa, p1b, cwb, wsa, sca, bia,
                 wsb, scb, bib, dpa, dpb, vra, vrb, xha, xhb):
        ga = core_a._bwd_call(xt, sqx, maskf, c, p1a, cwa, wsa, sca,
                              bia, dpa)
        gb = core_b._bwd_call(xt, sqx, maskf, c, p1b, cwb, wsb, scb,
                              bib, dpb)
        return ga + gb

    @bwd_call.def_vmap
    def _bwd_vmap(axis_size, in_batched, xt, sqx, maskf, c, p1a, cwa,
                  p1b, cwb, wsa, sca, bia, wsb, scb, bib, dpa, dpb,
                  vra, vrb, xha, xhb):
        if any(jax.tree_util.tree_leaves(in_batched[8:14])):
            raise NotImplementedError(
                "fused SA pair train kernel: vmap over MLP parameters")
        b = axis_size
        args = [_bcast(x, bt, b) for x, bt in
                zip((xt, sqx, maskf, c, p1a, cwa, p1b, cwb),
                    in_batched[:8])]
        dpa_b = _bcast(dpa, in_batched[14], b)
        dpb_b = _bcast(dpb, in_batched[15], b)
        pk = _pick_pk_pair(b, csa, csb, n, m, nsa, nsb, gp)
        if pk > 1:
            outs = _run_pair_bwd_pk(b, pk, *args, wsa, sca, bia,
                                    wsb, scb, bib, dpa_b, dpb_b,
                                    vra, vrb, xha, xhb)
        else:
            ga = jax.vmap(lambda x1, x2, x3, x4, x5, x6, dp:
                          core_a._bwd_call(x1, x2, x3, x4, x5, x6,
                                           wsa, sca, bia, dp))(
                *args[:6], dpa_b)
            gb = jax.vmap(lambda x1, x2, x3, x4, x5, x6, dp:
                          core_b._bwd_call(x1, x2, x3, x4, x5, x6,
                                           wsb, scb, bib, dp))(
                *args[:4], *args[6:8], dpb_b)
            outs = ga + gb
        bt = (True, True, (True,) * (L - 1), (True,) * L, (True,) * L)
        return outs, bt + bt

    @jax.custom_vjp
    def pair_core(xt, sqx, maskf, c, p1a, cwa, p1b, cwb, wsa, sca, bia,
                  wsb, scb, bib):
        return fwd_call(xt, sqx, maskf, c, p1a, cwa, p1b, cwb,
                        wsa, sca, bia, wsb, scb, bib)[:6]

    def pair_fwd(xt, sqx, maskf, c, p1a, cwa, p1b, cwb, wsa, sca, bia,
                 wsb, scb, bib):
        out = fwd_call(xt, sqx, maskf, c, p1a, cwa, p1b, cwb,
                       wsa, sca, bia, wsb, scb, bib)
        # residuals carry the batch variances + packed xhat stash for
        # the recompute-free backward
        return out[:6], (xt, sqx, maskf, c, p1a, cwa, p1b, cwb, wsa,
                         sca, bia, wsb, scb, bib, out[2], out[5],
                         out[6], out[7])

    def pair_bwd(res, cots):
        (xt, sqx, maskf, c, p1a, cwa, p1b, cwb, wsa, sca, bia, wsb,
         scb, bib, vra, vrb, xha, xhb) = res
        dpa, _ma, _va, dpb, _mb, _vb = cots
        (dp1a, dcwa, dwsa, dscaa, dbiaa,
         dp1b, dcwb, dwsb, dscab, dbiab) = bwd_call(
            xt, sqx, maskf, c, p1a, cwa, p1b, cwb, wsa, sca, bia,
            wsb, scb, bib, dpa, dpb, vra, vrb, xha, xhb)
        return (jnp.zeros_like(xt), jnp.zeros_like(sqx),
                jnp.zeros_like(maskf), jnp.zeros_like(c),
                dp1a, dcwa, dp1b, dcwb, dwsa, dscaa, dbiaa,
                dwsb, dscab, dbiab)

    pair_core.defvjp(pair_fwd, pair_bwd)
    return pair_core


def fused_sa_pair_train(xyz, centers, features, mask, ws_a, scales_a,
                        biases_a, ws_b, scales_b, biases_b, *,
                        radius_a: float, nsample_a: int, radius_b: float,
                        nsample_b: int, eps: float = 1e-5,
                        interpret: bool | None = None):
    """Both scales of one train-mode SA-MSG level in ONE fused dispatch.

    Same per-scale semantics/returns as two fused_sa_scale_train calls:
    ((pooled_a, mus_a, vars_a), (pooled_b, mus_b, vars_b)). Layer counts
    and layer-0 widths must match across scales (structural in the
    reference PNHead: same input channels, same MLP depth)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, m = xyz.shape[0], centers.shape[0]
    xyz = xyz.astype(jnp.float32)
    centers = centers.astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST

    def hoist(ws):
        w1 = ws[0].astype(jnp.float32)
        p1 = jnp.dot(xyz, w1[:3], precision=hp)
        if features is not None:
            p1 = p1 + jnp.dot(features.astype(jnp.float32), w1[3:],
                              precision=hp)
        cw = jnp.dot(centers, w1[:3], precision=hp)
        return p1, cw

    p1a, cwa = hoist(ws_a)
    p1b, cwb = hoist(ws_b)
    xt = xyz.T
    sqx = jnp.sum(xyz * xyz, axis=1)[None, :]
    maskf = (jnp.ones((1, n), jnp.float32) if mask is None
             else mask.astype(jnp.float32)[None, :])
    csa = tuple(int(w.shape[1]) for w in ws_a)
    csb = tuple(int(w.shape[1]) for w in ws_b)
    core = _make_pair_core(float(radius_a) ** 2, int(nsample_a), csa,
                           float(radius_b) ** 2, int(nsample_b), csb,
                           n, m, float(eps), bool(interpret))
    outs = core(xt, sqx, maskf, centers, p1a, cwa, p1b, cwb,
                tuple(w.astype(jnp.float32) for w in ws_a[1:]),
                tuple(s.astype(jnp.float32) for s in scales_a),
                tuple(b.astype(jnp.float32) for b in biases_a),
                tuple(w.astype(jnp.float32) for w in ws_b[1:]),
                tuple(s.astype(jnp.float32) for s in scales_b),
                tuple(b.astype(jnp.float32) for b in biases_b))
    return (outs[0], outs[1], outs[2]), (outs[3], outs[4], outs[5])


def sa_scale_train_reference(xyz, centers, features, mask, ws, scales,
                             biases, *, radius, nsample, eps=1e-5):
    """Unfused train-mode reference of the same computation (tests):
    ball_query + group + per-layer Dense/train-BN/relu + max-pool."""
    from .neighborhood import ball_query
    idx = ball_query(radius, nsample, xyz, centers, mask)
    g = jnp.take(xyz, idx, axis=0) - centers[:, None, :]
    if features is not None:
        g = jnp.concatenate([g, jnp.take(features, idx, axis=0)], axis=-1)
    h = g.astype(jnp.float32)
    mus, vrs = [], []
    for w, s, b in zip(ws, scales, biases):
        h = h @ w.astype(jnp.float32)
        mu = jnp.mean(h, axis=(0, 1))
        var = jnp.maximum(jnp.mean(jnp.square(h), axis=(0, 1))
                          - jnp.square(mu), 0.0)
        mus.append(mu)
        vrs.append(var)
        h = jax.nn.relu((h - mu) * jax.lax.rsqrt(var + eps) * s + b)
    return jnp.max(h, axis=1), tuple(mus), tuple(vrs)
