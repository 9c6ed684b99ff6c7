"""Fused cost-volume correlator stage for the TRAIN path (custom VJP).

Train-side counterpart of ops/pallas_correlator.py (reference
FeatureCorrelator, model_utils.py:166-250): kNN selection + neighbor
gather + pair MLP (leaky) + WeightNet(direction) weighted sum, forward
AND hand-written backward in VMEM-resident Pallas kernels. Unlike the
SA stack the correlator has no batch norm, so the whole computation is
per-query-independent — but the live config's profile shows its train
cost dominated by the 256-channel grouped gathers and their HIGHEST
scatter-add backwards, which this kernel keeps on-chip.

Structure (per stream, one program; streams batch through the grid via
custom_vmap exactly as in ops/pallas_sa_train.py):
  * selection: k sequential min-extractions over the masked (N, M)
    distance matrix (lowest-index ties; fewer than k valid points →
    slots repeat the nearest valid neighbor, feature AND direction; no
    valid point → index 0) — the ops.neighborhood.knn padding rule;
  * gathers: per-slot-block one-hot dots; features in a SINGLE bf16
    pass (their consumers are bf16-operand dots or the weighted sum —
    the same truncation class), directions via a small exact HIGHEST
    dot;
  * stage 1 (`add_q` present): h = leaky(slots + add_q + dir @ W_dir) —
    the layer-1 COORDINATE term is applied in-kernel from the exact
    directions, so the absolute-coordinate cancellation never meets the
    bf16 feature rounding (the wrapper's hoists carry only
    feature-scale values) — then the remaining leaky MLP layers;
    stage 2: the raw slots;
  * WeightNet: 3 biased ReLU layers on the (k·N, 3) directions;
  * out = Σ_s mlp_s ⊙ wn_s;
  * backward: consumes the forward's STASHED state (selection ids and
    directions in f32; the leaky MLP-chain input a0 and every MLP
    post-activation as bf16 COPIES of the f32 compute chain — the same
    lever that cleared the SA stack's recompute, which here was ~45% of
    the backward kernel, at half the f32 stash's DMA). Raw slots (the
    no-add stage's h0) are NOT stashed: the backward re-runs the exact
    one-hot-dot gather from the stashed ids — bit-identical and cheaper
    than the (k·N, C) round-trip. Only the cheap 3-narrow-dot WeightNet
    chain is re-run from the stashed directions. The forward is
    bit-identical to the f32-stash formulation (compute stays f32; the
    stash is a copy); gradient deltas vs it are confined to the bf16
    rounding of stashed values whose f32 identity the backward actually
    uses — h_last in the product rule and the activation sign masks —
    while every dW dot consumes the same bf16 operand it always
    truncated to. Then backprop the product, the two chains (leaky' from
    post-activation sign — leaky preserves sign; relu' likewise),
    scatter d_slots to d_feats_p with single-pass bf16 one-hot
    transposes (cotangent truncation, same class), route d_dirs —
    WeightNet chain plus the layer-1 dz0 @ W_dirᵀ term — to d_points
    (exact scatter) and d_query (−Σ), and emit dW_dir.
    Selection gets no gradient (integer indices, as in the reference's
    CUDA ops).

Numerics vs the unfused train path: the hoisted layer 1 and bf16-pass
in-kernel dots are the documented SA-kernel rounding class
(tests/test_pallas_correlator_train.py pins exact-regime routing at
~1e-6 and real-valued gradients by cosine).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e10
# The stash-consuming backward's pipelined buffers measured 123.20 MB
# scoped-vmem at the flagship config (k=16, n=512, C=256, 2-layer MLP)
# — the 96 MB the pre-stash kernels used OOMs the backend compiler.
# v5e VMEM is 128 MB; 127 MB leaves the runtime's reserve only.
_VMEM_LIMIT = 127 * 1024 * 1024
_SLOT_BLOCK = 8


def _leaky(x):
    return jnp.where(x > 0.0, x, 0.1 * x)


def _select_ids(q, xpt, sqp, maskf, k):
    """k min-extractions → ids (list of (TM, 1) f32), repeat-nearest
    padding (pallas_correlator.py semantics)."""
    sqq = jnp.sum(q * q, axis=1, keepdims=True)
    prod = (q[:, 0:1] * xpt[0:1, :] + q[:, 1:2] * xpt[1:2, :]
            + q[:, 2:3] * xpt[2:3, :])
    d2 = jnp.maximum(sqq + sqp - 2.0 * prod, 0.0)
    dm = jnp.where(maskf > 0.0, d2, _BIG)
    n_pts = dm.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, dm.shape,
                                    1).astype(jnp.float32)
    ids = []
    for s in range(k):
        m = jnp.min(dm, axis=1, keepdims=True)
        jmin = jnp.min(jnp.where(dm == m, cols, jnp.float32(n_pts)),
                       axis=1, keepdims=True)
        if s == 0:
            jid = jnp.where(m >= _BIG, 0.0, jmin)
        else:
            jid = jnp.where(m >= _BIG, ids[0], jmin)
        ids.append(jid)
        dm = jnp.where(cols == jmin, _BIG, dm)
    return ids


def _slot_oh(idcol_of, s0, g, cols_row):
    """One-hot block for slots s0..s0+g-1: (g·TM, M) from f32 ids.
    `idcol_of(s0, g)` yields the (g·TM, 1) stacked id column — from the
    in-register selection list (forward) or the stashed ids ref
    (backward)."""
    return idcol_of(s0, g) == cols_row                   # bool (g·TM, M)


def _ids_block_reader(ids_ref, tm):
    return lambda s0, g: ids_ref[s0 * tm:(s0 + g) * tm, :]


def _ids_list_reader(ids):
    return lambda s0, g: jnp.concatenate(ids[s0:s0 + g], axis=0)


def _bf16_parts(v):
    """f32 → (hi, mid, lo) bf16 parts, Σ parts == v bit-exactly in f32
    (ops/sampling.py::_bf16_parts; exact for normal f32 inputs)."""
    hi = v.astype(jnp.bfloat16)
    r = v - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _gather_all(idcol_of, featsp_b, xp, q, k, c, tm, m_pts, slots_ref,
                dirs_ref):
    """slots (k·TM, C) bf16-value + dirs (k·TM, 3) exact into refs.

    Feature gathers are SINGLE bf16 passes: the gathered values feed
    bf16-operand dots (or the weighted sum) anyway — the same truncation
    class — and the coordinate cancellation lives in the exact dirs
    path, not here. (The 3-way exact split tripled the widest dots of
    the profiled step for no numerically-relevant precision.)

    The EXACT dirs gather runs as three single-pass bf16 one-hot dots
    over the coordinates' bf16 split parts: each 0/1 × bf16 product is
    exact in the f32 accumulator and the per-element part sums
    reassemble the f32 coordinate bit-exactly (exponent gaps ≤ 8 bits
    per partial sum), so the result equals the HIGHEST f32 dot it
    replaces at 3 MXU passes instead of ~6 — and reuses the features'
    bf16 one-hot instead of a second f32 one."""
    cols_row = jax.lax.broadcasted_iota(
        jnp.int32, (1, m_pts), 1).astype(jnp.float32)
    xp_hi, xp_mid, xp_lo = _bf16_parts(xp)
    g = min(k, _SLOT_BLOCK)
    for s0 in range(0, k, g):
        oh = _slot_oh(idcol_of, s0, g, cols_row)
        ohb = oh.astype(jnp.bfloat16)
        slots_ref[s0 * tm:(s0 + g) * tm, :] = jax.lax.dot(
            ohb, featsp_b, preferred_element_type=jnp.float32)
        gath = ((jax.lax.dot(ohb, xp_hi,
                             preferred_element_type=jnp.float32)
                 + jax.lax.dot(ohb, xp_mid,
                               preferred_element_type=jnp.float32))
                + jax.lax.dot(ohb, xp_lo,
                              preferred_element_type=jnp.float32))
        dirs_ref[s0 * tm:(s0 + g) * tm, :] = (
            gath - jnp.broadcast_to(q[None], (g,) + q.shape).reshape(
                g * tm, 3))


def _mlp_chain(h2d, w_refs, start, n, act):
    """n biased layers with `act`; returns list of post-activations
    (inputs for the backward's dW dots), last is the output."""
    acts = []
    for li in range(n):
        w = w_refs[2 * (start + li)][...]
        b = w_refs[2 * (start + li) + 1][...]
        y = jax.lax.dot(h2d.astype(jnp.bfloat16),
                        w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        h2d = act(y + b)
        acts.append(h2d)
    return acts


def _fwd_kernel(xpt_ref, sqp_ref, maskf_ref, q_ref, featsp_ref,
                addq_ref, wdir_ref, *refs, k: int, n_mlp: int, c: int,
                has_add: bool):
    """stash_h0 == has_add: raw slots (no layer-1 nonlinearity) are
    recomputable in the backward from the stashed ids by one bf16
    one-hot dot — the exact expression the forward used — so only the
    leaky(a0) case stashes h0. Stashes are bf16 COPIES of the f32
    compute chain (kept in a0_scr / registers), so the forward output
    is bit-identical to the f32-stash formulation while the stash DMA
    halves; the backward's reads carry the bf16 rounding class (see
    _bwd_kernel)."""
    stash_h0 = has_add
    w_refs = refs[:2 * (n_mlp + 3)]
    rest = refs[2 * (n_mlp + 3):]
    out_ref, ids_ref, dirs_ref = rest[:3]
    rest = rest[3:]
    if stash_h0:
        h0_ref, rest = rest[0], rest[1:]
    act_refs = rest[:n_mlp]
    a0_scr = rest[n_mlp]                   # (k·TM, C) f32 compute buffer
    q = q_ref[...]
    tm = q.shape[0]
    m_pts = xpt_ref.shape[1]

    ids = _select_ids(q, xpt_ref[...], sqp_ref[...], maskf_ref[...], k)
    # stash the selection for the backward (k sequential min-extraction
    # passes otherwise re-run there); exact in f32 (ids < N)
    for s in range(k):
        ids_ref[s * tm:(s + 1) * tm, :] = ids[s]
    # gathers land in the f32 scratch (compute stays f32); dirs are
    # emitted for the backward's WeightNet/scatter use (exact f32)
    _gather_all(_ids_list_reader(ids), featsp_ref[...], xpt_ref[...].T,
                q, k, c, tm, m_pts, a0_scr, dirs_ref)

    if has_add:
        # layer-1 coordinate term from the EXACT directions: the
        # absolute-coordinate cancellation never touches the bf16
        # feature gather (see module docstring). dirs @ W_dir runs as
        # three f32 VPU FMAs — K=3 MXU dots at HIGHEST are pathological
        # (K pads to the full sublane tile × ~6 precision passes); the
        # FMA chain is the same f32-exact class, associativity aside.
        d = dirs_ref[...]
        w = wdir_ref[...]
        dirw = (d[:, 0:1] * w[0:1, :] + d[:, 1:2] * w[1:2, :]
                + d[:, 2:3] * w[2:3, :])
        a0_scr[...] = _leaky(a0_scr[...] + jnp.broadcast_to(
            addq_ref[...][None], (k, tm, c)).reshape(k * tm, c) + dirw)
        h0_ref[...] = a0_scr[...].astype(jnp.bfloat16)
    # a0_scr holds the f32 MLP-chain input; the chain runs in f32 with
    # bf16-operand dots exactly as before, each post-activation stashed
    # as a bf16 copy (the dots consumed bf16(act) anyway)
    h2d = a0_scr[...]
    for li in range(n_mlp):
        w = w_refs[2 * li][...]
        b = w_refs[2 * li + 1][...]
        h2d = _leaky(
            jax.lax.dot(h2d.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) + b)
        act_refs[li][...] = h2d.astype(jnp.bfloat16)
    h_last = h2d
    wacts = _mlp_chain(dirs_ref[...], w_refs, n_mlp, 3,
                       lambda x: jnp.maximum(x, 0.0))
    c_out = h_last.shape[-1]
    out_ref[...] = jnp.sum(
        (h_last * wacts[-1]).reshape(k, tm, c_out), axis=0)


def _bwd_kernel(xpt_ref, sqp_ref, maskf_ref, q_ref, featsp_ref,
                addq_ref, wdir_ref, *refs, k: int, n_mlp: int, c: int,
                has_add: bool):
    stash_h0 = has_add
    w_refs = refs[:2 * (n_mlp + 3)]
    rest = refs[2 * (n_mlp + 3):]
    dout_ref, ids_ref, dirs_ref = rest[:3]
    rest = rest[3:]
    h0_ref = None
    if stash_h0:
        h0_ref, rest = rest[0], rest[1:]
    act_refs = rest[:n_mlp]              # STASHED mlp post-acts (bf16)
    outs = rest[n_mlp:]
    # outputs: dfeatsp, daddq, dq, dpoints, dwdir, (dw, db) × (n_mlp+3)
    dfeatsp_ref, daddq_ref, dq_ref, dpts_ref, dwdir_ref = outs[:5]
    dw_refs = outs[5:]
    scr = dw_refs[2 * (n_mlp + 3):]
    dw_refs = dw_refs[:2 * (n_mlp + 3)]
    d_ref = scr[0]                       # (k·TM, C) cotangent ping
    wn_refs = scr[1:4]                   # 3 weightnet post-activations
    a0_scr = scr[4] if not stash_h0 else None

    tm = q_ref.shape[0]
    m_pts = xpt_ref.shape[1]

    # ---- forward state arrives STASHED from the fwd kernel --------------
    # (selection ids, directions, and — in bf16 — the leaky MLP-chain
    # input a0 (has_add only) and every MLP post-activation; the gather
    # + layer-1 + MLP-dot recompute they replace was ~45% of this
    # kernel). The bf16 reads are the values the backward's dots
    # truncated to anyway (dW a_prev operands: bit-identical); only
    # h_last's role in the product rule and the leaky'/relu' sign masks
    # see the bf16 rounding class (sign is preserved by bf16 rounding
    # except exactly-denormal values). Raw slots (no layer-1
    # nonlinearity, stash_h0=False) are instead recomputed from the
    # stashed ids by the forward's exact one-hot-dot expression —
    # bit-identical — skipping the (k·N, C) stash round-trip entirely.
    # Only the cheap WeightNet chain re-runs from the stashed dirs.
    idcol_of = _ids_block_reader(ids_ref, tm)
    if stash_h0:
        a0 = h0_ref[...].astype(jnp.float32)
    else:
        cols0 = jax.lax.broadcasted_iota(
            jnp.int32, (1, m_pts), 1).astype(jnp.float32)
        g0 = min(k, _SLOT_BLOCK)
        featsp_b = featsp_ref[...]
        for s0 in range(0, k, g0):
            ohb = _slot_oh(idcol_of, s0, g0, cols0).astype(jnp.bfloat16)
            a0_scr[s0 * tm:(s0 + g0) * tm, :] = jax.lax.dot(
                ohb, featsp_b, preferred_element_type=jnp.float32)
        a0 = a0_scr[...]
    h_last = (act_refs[n_mlp - 1][...].astype(jnp.float32) if n_mlp
              else a0)
    d = dirs_ref[...]
    for li in range(3):
        w = w_refs[2 * (n_mlp + li)][...]
        b = w_refs[2 * (n_mlp + li) + 1][...]
        d = jnp.maximum(
            jax.lax.dot(d.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) + b, 0.0)
        wn_refs[li][...] = d

    c_out = h_last.shape[-1]
    dout_t = jnp.broadcast_to(dout_ref[...][None],
                              (k, tm, c_out)).reshape(k * tm, c_out)

    # ---- product rule ---------------------------------------------------
    dh = dout_t * wn_refs[2][...]
    dwn = dout_t * h_last

    # ---- weightnet chain backward --------------------------------------
    for li in range(2, -1, -1):
        a = wn_refs[li][...]
        dz = dwn * (a > 0.0).astype(jnp.float32)
        a_prev = wn_refs[li - 1][...] if li > 0 else dirs_ref[...]
        dw_refs[2 * (n_mlp + li)][...] = jax.lax.dot_general(
            a_prev.astype(jnp.bfloat16), dz.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dw_refs[2 * (n_mlp + li) + 1][...] = jnp.sum(dz, axis=0,
                                                     keepdims=True)
        dwn = jax.lax.dot(dz.astype(jnp.bfloat16),
                          w_refs[2 * (n_mlp + li)][...].T.astype(
                              jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    ddirs = dwn                                          # (k·TM, 3)

    # ---- pair-MLP chain backward ---------------------------------------
    for li in range(n_mlp - 1, -1, -1):
        # f32 read: Mosaic has no bf16 compare; sign is preserved by the
        # bf16 stash rounding (a > 0 ⇒ bf16(a) >= 0, equality only on
        # sub-bf16-denormal values)
        a = act_refs[li][...].astype(jnp.float32)
        lk = jnp.where(a > 0.0, 1.0, 0.1)
        dz = dh * lk
        a_prev = act_refs[li - 1][...] if li > 0 else a0
        dw_refs[2 * li][...] = jax.lax.dot_general(
            a_prev.astype(jnp.bfloat16), dz.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dw_refs[2 * li + 1][...] = jnp.sum(dz, axis=0, keepdims=True)
        dh = jax.lax.dot(dz.astype(jnp.bfloat16),
                         w_refs[2 * li][...].T.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
    if has_add:
        dz0 = dh * jnp.where(a0 > 0.0, 1.0, 0.1)
        # layer-1 coordinate term: gradient to Wdir and to the dirs
        dwdir_ref[...] = jax.lax.dot_general(
            dirs_ref[...], dz0,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        ddirs = ddirs + jax.lax.dot(
            dz0.astype(jnp.bfloat16),
            wdir_ref[...].T.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
    else:
        dz0 = dh
        dwdir_ref[...] = jnp.zeros_like(dwdir_ref)
    d_ref[...] = dz0
    daddq_ref[...] = jnp.sum(dz0.reshape(k, tm, c), axis=0)
    dq_ref[...] = -jnp.sum(ddirs.reshape(k, tm, 3), axis=0)

    # ---- scatters -------------------------------------------------------
    cols_row = jax.lax.broadcasted_iota(
        jnp.int32, (1, m_pts), 1).astype(jnp.float32)
    g = min(k, _SLOT_BLOCK)
    dfeatsp_ref[...] = jnp.zeros_like(dfeatsp_ref)
    dpts_ref[...] = jnp.zeros_like(dpts_ref)
    for s0 in range(0, k, g):
        oh = _slot_oh(idcol_of, s0, g, cols_row)
        dblk = d_ref[s0 * tm:(s0 + g) * tm, :]
        # single-pass bf16 scatter: cotangent truncation, the documented
        # in-kernel dot class (the exact 3-split tripled this dot)
        dfeatsp_ref[...] += jax.lax.dot_general(
            oh.astype(jnp.bfloat16), dblk.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # exact dpoints scatter via the cotangent's bf16 split: every
        # 0/1 × bf16-part product is exact in the f32 accumulator and
        # the part sums reassemble each addend bit-exactly, so this is
        # the HIGHEST f32 scatter's class (f32-accumulated exact
        # addends) at 3 single bf16 passes instead of ~6
        ddblk = ddirs[s0 * tm:(s0 + g) * tm, :]
        ohb2 = oh.astype(jnp.bfloat16)
        for part in _bf16_parts(ddblk):
            dpts_ref[...] += jax.lax.dot_general(
                ohb2, part,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


def _full():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def _make_core(k: int, n_mlp: int, c: int, c_out: int, n: int, m: int,
               has_add: bool, w_shapes: tuple, interpret: bool):
    """Build the fwd/bwd correlator-train cores for one config.

    NOTE (stash cost): the forward ALWAYS materializes the backward's
    stash — ids, dirs (f32) and, when has_add, bf16 a0 + every MLP
    post-activation (~13 MB/stream at the flagship stage-1 config) —
    because pallas_call outputs cannot be individually
    dead-code-eliminated. A loss-only (primal, undiff'd) forward
    through the train graph therefore pays the stash HBM traffic for
    nothing; use the eval-path correlator for inference.
    """
    # VMEM head-check for NEW configs (ADVICE r3): the backend's
    # pipelined/stacked buffers measured ~4.2× the naive block-byte sum
    # at the flagship f32-stash config (naive ~29 MB → 123.20 MB
    # scoped-vmem on the bwd kernel), so gate on 4× the naive byte sum.
    # The flagship passes with margin; a wider/deeper config fails HERE
    # with a sizing message instead of a backend-compiler OOM.
    stash_h0 = has_add
    mlp_d = [w_shapes[i][1] for i in range(n_mlp)]
    stash_bytes = k * n * (4 * (1 + 3) + (2 * c if stash_h0 else 0)
                           + 2 * sum(mlp_d))
    resident = (stash_bytes + 4 * k * n * c        # f32 compute scratch
                + 4 * (n * c_out + m * (3 + 2 * c) + n * 3
                       + sum(a * b for a, b in w_shapes)))
    if 4 * resident > _VMEM_LIMIT:
        raise ValueError(
            f"correlator-train config (k={k}, n={n}, m={m}, c={c}, "
            f"mlp={mlp_d}): ~4×{resident >> 20} MB projected scoped "
            f"vmem > _VMEM_LIMIT {_VMEM_LIMIT >> 20} MB; shrink the "
            "config or re-measure and raise the limit")
    params = pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT,
        dimension_semantics=("arbitrary",))
    n_wb = n_mlp + 3
    # w_shapes has ONE entry per (w, b) layer pair
    wn_dims = [w_shapes[n_mlp + i][1] for i in range(3)]
    mlp_dims = [w_shapes[i][1] for i in range(n_mlp)]

    def _stream(*shape):
        nd = len(shape)
        return pl.BlockSpec((None,) + shape,
                            lambda i: (i,) + (0,) * nd,
                            memory_space=pltpu.VMEM)

    def _run_fwd(b, xptb, sqpb, maskfb, qb, featspb, addqb, wdirb,
                 wbs):
        kernel = functools.partial(_fwd_kernel, k=k, n_mlp=n_mlp, c=c,
                                   has_add=has_add)
        in_specs = ([_stream(3, m), _stream(1, m), _stream(1, m),
                     _stream(n, 3), _stream(m, c),
                     _stream(n, c if has_add else 1),
                     _stream(3, c if has_add else 1)]
                    + [_full()] * (2 * n_wb))
        # stash outputs for the recompute-free backward: selection ids,
        # directions (f32, exact), then — bf16 copies of the f32 chain —
        # the leaky MLP input a0 (has_add only; raw slots recompute from
        # ids) and each MLP post-activation
        out_specs = [_stream(n, c_out), _stream(k * n, 1),
                     _stream(k * n, 3)]
        out_shape = [jax.ShapeDtypeStruct((b, n, c_out), jnp.float32),
                     jax.ShapeDtypeStruct((b, k * n, 1), jnp.float32),
                     jax.ShapeDtypeStruct((b, k * n, 3), jnp.float32)]
        if stash_h0:
            out_specs.append(_stream(k * n, c))
            out_shape.append(
                jax.ShapeDtypeStruct((b, k * n, c), jnp.bfloat16))
        out_specs += [_stream(k * n, d) for d in mlp_dims]
        out_shape += [jax.ShapeDtypeStruct((b, k * n, d), jnp.bfloat16)
                      for d in mlp_dims]
        outs = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=[pltpu.VMEM((k * n, c), jnp.float32)],
            compiler_params=params,
            interpret=interpret,
        )(xptb, sqpb, maskfb, qb, featspb, addqb, wdirb, *wbs)
        return outs[0], outs[1], outs[2], tuple(outs[3:])

    def _run_bwd(b, xptb, sqpb, maskfb, qb, featspb, addqb, wdirb,
                 wbs, doutb, idsb, dirsb, stashb):
        kernel = functools.partial(_bwd_kernel, k=k, n_mlp=n_mlp, c=c,
                                   has_add=has_add)
        in_specs = ([_stream(3, m), _stream(1, m), _stream(1, m),
                     _stream(n, 3), _stream(m, c),
                     _stream(n, c if has_add else 1),
                     _stream(3, c if has_add else 1)]
                    + [_full()] * (2 * n_wb)
                    + [_stream(n, c_out), _stream(k * n, 1),
                       _stream(k * n, 3)]
                    + ([_stream(k * n, c)] if stash_h0 else [])
                    + [_stream(k * n, d) for d in mlp_dims])
        out_shape = (
            [jax.ShapeDtypeStruct((b, m, c), jnp.float32),    # dfeatsp
             jax.ShapeDtypeStruct((b, n, c), jnp.float32),    # daddq
             jax.ShapeDtypeStruct((b, n, 3), jnp.float32),    # dq
             jax.ShapeDtypeStruct((b, m, 3), jnp.float32),    # dpoints
             jax.ShapeDtypeStruct((b, 3, c if has_add else 1),
                                  jnp.float32)]               # dwdir
            + [jax.ShapeDtypeStruct((b,) + s, jnp.float32)
               for ws in w_shapes
               for s in (ws, (1, ws[1]))])
        out_specs = ([_stream(m, c), _stream(n, c), _stream(n, 3),
                      _stream(m, 3),
                      _stream(3, c if has_add else 1)]
                     + [spec for ws in w_shapes
                        for spec in (_stream(*ws), _stream(1, ws[1]))])
        outs = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=(
                [pltpu.VMEM((k * n, c), jnp.float32)]      # dz0 park
                + [pltpu.VMEM((k * n, d), jnp.float32)
                   for d in wn_dims]                       # wn acts
                + ([] if stash_h0 else
                   [pltpu.VMEM((k * n, c), jnp.float32)])),  # a0 regather
            compiler_params=params,
            interpret=interpret,
        )(xptb, sqpb, maskfb, qb, featspb, addqb, wdirb, *wbs, doutb,
          idsb, dirsb, *stashb)
        dfeatsp, daddq, dq, dpts, dwdir = outs[:5]
        dwb = outs[5:]
        return dfeatsp, daddq, dq, dpts, dwdir, tuple(dwb)

    def _prep(b, featspb):
        return featspb.astype(jnp.bfloat16)

    def _bcast(x, batched, b):
        return x if batched else jnp.broadcast_to(x[None],
                                                  (b,) + x.shape)

    @jax.custom_batching.custom_vmap
    def fwd_call(xpt, sqp, maskf, qx, featsp, addq, wdir, wbs):
        outs = _run_fwd(1, xpt[None], sqp[None], maskf[None],
                        qx[None], _prep(1, featsp[None]),
                        addq[None], wdir[None], wbs)
        return jax.tree_util.tree_map(lambda x: x[0], outs)

    @fwd_call.def_vmap
    def _fwd_vmap(axis_size, in_batched, xpt, sqp, maskf, qx, featsp,
                  addq, wdir, wbs):
        if any(jax.tree_util.tree_leaves(in_batched[7])):
            raise NotImplementedError("vmap over correlator params")
        b = axis_size
        args = [_bcast(x, bt, b) for x, bt in
                zip((xpt, sqp, maskf, qx, featsp, addq, wdir),
                    in_batched[:7])]
        outs = _run_fwd(b, args[0], args[1], args[2], args[3],
                        _prep(b, args[4]), args[5], args[6], wbs)
        return outs, jax.tree_util.tree_map(lambda _: True, outs)

    @jax.custom_batching.custom_vmap
    def bwd_call(xpt, sqp, maskf, qx, featsp, addq, wdir, wbs, dout,
                 ids, dirs, stash):
        outs = _run_bwd(1, xpt[None], sqp[None], maskf[None], qx[None],
                        _prep(1, featsp[None]), addq[None], wdir[None],
                        wbs, dout[None], ids[None], dirs[None],
                        tuple(s[None] for s in stash))
        return jax.tree_util.tree_map(lambda x: x[0], outs)

    @bwd_call.def_vmap
    def _bwd_vmap(axis_size, in_batched, xpt, sqp, maskf, qx, featsp,
                  addq, wdir, wbs, dout, ids, dirs, stash):
        if any(jax.tree_util.tree_leaves(in_batched[7])):
            raise NotImplementedError("vmap over correlator params")
        b = axis_size
        args = [_bcast(x, bt, b) for x, bt in
                zip((xpt, sqp, maskf, qx, featsp, addq, wdir),
                    in_batched[:7])]
        doutb = _bcast(dout, in_batched[8], b)
        idsb = _bcast(ids, in_batched[9], b)
        dirsb = _bcast(dirs, in_batched[10], b)
        stashb = tuple(_bcast(s, bt, b) for s, bt in
                       zip(stash, in_batched[11]))
        outs = _run_bwd(b, args[0], args[1], args[2], args[3],
                        _prep(b, args[4]), args[5], args[6], wbs,
                        doutb, idsb, dirsb, stashb)
        batched = jax.tree_util.tree_map(lambda _: True, outs)
        return outs, batched

    @jax.custom_vjp
    def core(xpt, sqp, maskf, qx, featsp, addq, wdir, wbs):
        return fwd_call(xpt, sqp, maskf, qx, featsp, addq, wdir,
                        wbs)[0]

    def core_fwd(xpt, sqp, maskf, qx, featsp, addq, wdir, wbs):
        out, ids, dirs, stash = fwd_call(xpt, sqp, maskf, qx,
                                         featsp, addq, wdir, wbs)
        return out, (xpt, sqp, maskf, qx, featsp, addq, wdir, wbs, ids,
                     dirs, stash)

    def core_bwd(res, dout):
        (xpt, sqp, maskf, qx, featsp, addq, wdir, wbs, ids, dirs,
         stash) = res
        dfeatsp, daddq, dq, dpts, dwdir, dwb = bwd_call(
            xpt, sqp, maskf, qx, featsp, addq, wdir, wbs, dout, ids,
            dirs, stash)
        # dpoints arrives per-point; xpt is its transpose
        return (dpts.T, jnp.zeros_like(sqp), jnp.zeros_like(maskf),
                dq, dfeatsp,
                daddq if has_add else jnp.zeros_like(addq),
                dwdir if has_add else jnp.zeros_like(wdir),
                tuple(dwb))

    core.defvjp(core_fwd, core_bwd)
    return core


def fused_knn_weight_aggregate_train(query_xyz, points_xyz, feats_p,
                                     add_q, mask_p, mlp_ws, mlp_bs,
                                     wn_ws, wn_bs, *, w_dir=None,
                                     k: int = 16,
                                     interpret: bool | None = None):
    """Differentiable fused correlator stage (see module docstring).

    Same signature/semantics as pallas_correlator.fused_knn_weight_
    aggregate, with gradients to feats_p, add_q, the MLP/WeightNet
    parameters, and the query/point positions through the WeightNet
    directions (selection is index-valued: no gradient, as in the
    reference's CUDA grouping ops)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, m = query_xyz.shape[0], points_xyz.shape[0]
    c = feats_p.shape[1]
    has_add = add_q is not None
    query_xyz = query_xyz.astype(jnp.float32)
    points_xyz = points_xyz.astype(jnp.float32)
    xpt = points_xyz.T
    sqp = jnp.sum(points_xyz * points_xyz, axis=1)[None, :]
    maskf = (jnp.ones((1, m), jnp.float32) if mask_p is None
             else mask_p.astype(jnp.float32)[None, :])
    if not has_add:
        add_q = jnp.zeros((n, 1), jnp.float32)
    if w_dir is None:
        # caller folded any coordinate term into feats_p/add_q (e.g. no
        # layer 1 at all, or small-valued test fixtures)
        w_dir = jnp.zeros((3, feats_p.shape[1] if has_add else 1),
                          jnp.float32)
    else:
        w_dir = w_dir.astype(jnp.float32)

    wbs = []
    w_shapes = []
    for w, b in list(zip(mlp_ws, mlp_bs)) + list(zip(wn_ws, wn_bs)):
        wbs += [w.astype(jnp.float32), b.astype(jnp.float32)[None, :]]
        w_shapes.append(tuple(w.shape))
    c_out = (mlp_ws[-1].shape[1] if mlp_ws else c)

    core = _make_core(int(k), len(mlp_ws), int(c), int(c_out), n, m,
                      has_add, tuple(w_shapes), bool(interpret))
    out = core(xpt, sqp, maskf, query_xyz,
               feats_p.astype(jnp.float32), add_q, w_dir, tuple(wbs))
    return out


def knn_weight_aggregate_reference(query_xyz, points_xyz, feats_p,
                                   add_q, mask_p, mlp_ws, mlp_bs,
                                   wn_ws, wn_bs, *, w_dir=None,
                                   k: int = 16):
    """Unfused reference of the same computation (tests): knn + gather
    + leaky MLP + relu WeightNet + weighted sum, all f32."""
    from .neighborhood import knn
    _, idx = knn(k, query_xyz, points_xyz, mask_p)        # (N, k)
    slots = jnp.take(feats_p.astype(jnp.float32), idx, axis=0)
    dirs = (jnp.take(points_xyz.astype(jnp.float32), idx, axis=0)
            - query_xyz.astype(jnp.float32)[:, None, :])
    h = slots
    if add_q is not None:
        h = h + add_q.astype(jnp.float32)[:, None, :]
        if w_dir is not None:
            h = h + dirs @ w_dir.astype(jnp.float32)
        h = _leaky(h)
    for w, b in zip(mlp_ws, mlp_bs):
        h = _leaky(h @ w.astype(jnp.float32) + b.astype(jnp.float32))
    d = dirs
    for w, b in zip(wn_ws, wn_bs):
        d = jax.nn.relu(d @ w.astype(jnp.float32)
                        + b.astype(jnp.float32))
    return jnp.sum(h * d, axis=1)
