"""Analytic per-kernel roofline floors for the flagship 512-pt step.

VERDICT r4 #3/#4 ask for a per-component table — kernel → measured µs →
bound → floor argument — accounting ≥90% of device time, so that the
three-round eval plateau (3,183 → 3,244 → 3,230 fps) is either broken
or *proven* to be the wall. This tool computes the floors analytically
from the kernels' exact op inventories (no hardware needed; the
inventories cite the kernel sources) and compares them against measured
per-op-group times from `tools/profile_train_ops.py` output.

Hardware model (v5e, one chip):

  * MXU peak 202.7 bf16 TFLOP/s — the device plane's own
    `peak_tflops_per_s` stat (recorded in BENCH_r04.json). All kernel
    dots run bf16 operands (or f32 at DEFAULT precision, which the MXU
    executes at bf16 rate after one-pass truncation — exact for the
    0/1 selection operands, ops/pallas_sa.py:20-25).
  * Dots are lane-padded: a dot with n output channels occupies
    max(n, 128) MXU lanes, so FLOP floors count 2·m·k·max(n,128).
    Sublane (m) padding to 8 is negligible at these shapes and ignored.
  * VPU peak: 202.7e12 / (4 MXUs · 128·128 MACs · 2) = 1.55 GHz clock;
    the VPU is (8, 128) lanes × 4 ALUs = 4,096 lanes → 6.3e12
    single-ops/s counting an FMA as one issued op (upper bound: real
    elementwise chains also pay loads/stores). Floors below count each
    elementwise RESULT as one op, so they are optimistic (true floors).
  * Per-custom-call fixed cost 12.5 µs (measured 10-15 µs,
    NOTES_ROUND3/4 pair-kernel A/B) — amortized over the 8 streams
    batched through each kernel's grid.
  * HBM 819 GB/s (v5e public spec); at 512 pts every kernel operand
    set is ≤ ~2 MB and VMEM-resident, so HBM never binds — it is
    reported only where it matters (train stash, Adam update).

Usage:
    python tools/roofline.py [--eval-profile PEROP.json]
                             [--train-profile PEROP.json]
                             [--out ROOFLINE.json]
"""

from __future__ import annotations

import argparse
import json

MXU = 202.7e12          # bf16 FLOP/s, device plane stat
VPU = 6.3e12            # single-ops/s, derived above (optimistic)
HBM = 819e9             # B/s, v5e spec
DISPATCH_S = 12.5e-6    # per custom-call fixed cost (measured 10-15 µs)
B = 8                   # streams batched through every kernel grid


def dot_flops(m, k, n):
    """Lane-padded MXU FLOPs of one (m,k)@(k,n) dot."""
    return 2.0 * m * k * max(n, 128)


# ---------------------------------------------------------------- eval SA
# ops/pallas_sa.py::_sa_pair_kernel — both radius scales of one MSG level
# in one program. Shapes at the flagship config (n_max=512, npoint=512):
# tile=256 (pair cap, pallas_sa.py:409), chunk=512, grid=2 programs per
# stream, 8 streams batched through the grid → 16 programs per call.
# Level specs from models/pnhead.py:232-243 (reference
# model_utils.py:393-424): (nsample, mlp channels) per scale.
SA_LEVELS = {
    "sa1": dict(scales=[(4, [16, 16, 32]), (8, [16, 16, 32])]),
    "sa2": dict(scales=[(8, [32, 32]), (16, [32, 64])]),
    "sa3": dict(scales=[(16, [64, 64]), (32, [64, 64])]),
}
TILE, CHUNK = 256, 512


def sa_pair_program_flops(scales):
    """MXU FLOPs of ONE _sa_pair_kernel program (tile=256 centers)."""
    f = dot_flops(2 * TILE, CHUNK, CHUNK)          # stacked prefix-count
    for ns, chans in scales:
        c1 = chans[0]
        f += ns * dot_flops(TILE, CHUNK, c1)       # one-hot slot gathers
        rows = ns * TILE
        for ci, co in zip(chans[:-1], chans[1:]):  # folded layers 2..L
            f += dot_flops(rows, ci, co)
            f += dot_flops(TILE, ci, co)           # no-hit fallback row
    return f


def sa_pair_program_vops(scales):
    """VPU result-ops of ONE _sa_pair_kernel program."""
    tile_chunk = TILE * CHUNK
    v = tile_chunk * 6            # prod (3 FMA) + d2 assemble (3)
    v += 2 * tile_chunk * 2       # two hit masks: cmp + and
    v += 2 * tile_chunk * 2       # rank wheres + hit-count reduces
    for ns, chans in scales:
        c1 = chans[0]
        v += ns * tile_chunk * 2  # per-slot one-hot cmp + bf16 cast
        v += ns * TILE * c1 * 5   # finish: relu, iota-cmp, live, max, sub
        for co in chans[1:]:
            v += ns * TILE * co   # apply-layer relu
    return v


# ---------------------------------------------------- eval correlator
# ops/pallas_correlator.py::_corr_kernel (fused ≤4096 path): k=16
# min-extraction passes + exact one-hot gathers + pair MLP + WeightNet.
# Stage 1: C=256 hoisted features, 2 extra MLP layers 256→256
# (models/correlator.py:43, reference model_utils.py:166-250). Stage 2:
# C=256 cost volume, no MLP. WeightNet 3→8→8→256 (layers.py:134-149).
K_CORR, C_CORR = 16, 256


def corr_program_flops(n_mlp_layers):
    f = K_CORR * dot_flops(TILE, CHUNK, C_CORR)    # one-hot feat gathers
    f += K_CORR * dot_flops(TILE, CHUNK, 3)        # one-hot dir gathers
    rows = K_CORR * TILE
    for _ in range(n_mlp_layers):
        f += dot_flops(rows, C_CORR, C_CORR)       # pair MLP
    f += dot_flops(rows, 3, 8) + dot_flops(rows, 8, 8) \
        + dot_flops(rows, 8, C_CORR)               # WeightNet
    return f


def corr_program_vops(n_mlp_layers):
    tile_chunk = TILE * CHUNK
    rows = K_CORR * TILE
    v = tile_chunk * 6                              # d2
    v += K_CORR * tile_chunk * 5                    # min, tie-min, oh, mask
    v += n_mlp_layers * rows * C_CORR * 2           # leaky
    v += rows * (8 + 8 + C_CORR)                    # WN relus
    v += rows * C_CORR * 3                          # prod + slot-sum
    return v


# ---------------------------------------------------------- eval FP
# ops/pallas_fp.py::_fp_kernel: 3 min-extraction passes + one-hot
# feature dots. tile=512, grid=1 per stream. Known-feature widths:
# fp3 gathers l3 (64ch), fp2/fp1 gather 128ch (models/pnhead.py:255+).
FP_WIDTHS = [64, 128, 128]
FP_TILE = 512


def fp_program_flops(c):
    return 3 * dot_flops(FP_TILE, 512, c)


def fp_program_vops(c):
    v = FP_TILE * 512 * 6            # d2
    v += 3 * FP_TILE * 512 * 5       # passes
    v += FP_TILE * (3 * 4 + c * 3)   # recip weights + weighted sum
    return v


def block(name, programs_per_call, calls_per_frame_times_streams,
          flops_per_program, vops_per_program, n_custom_calls_per_iter,
          note):
    """One table row. Per-frame = per (stream, frame); every kernel call
    batches B=8 streams through its grid, so per-frame floors divide the
    per-call totals by B."""
    mxu_s = programs_per_call * flops_per_program / MXU
    vpu_s = programs_per_call * vops_per_program / VPU
    disp_s = n_custom_calls_per_iter * DISPATCH_S
    per_frame_us = (max(mxu_s, vpu_s) * calls_per_frame_times_streams
                    + disp_s) / B * 1e6
    return dict(
        block=name,
        mxu_us_per_frame=round(mxu_s * calls_per_frame_times_streams
                               / B * 1e6, 1),
        vpu_us_per_frame=round(vpu_s * calls_per_frame_times_streams
                               / B * 1e6, 1),
        dispatch_us_per_frame=round(disp_s / B * 1e6, 1),
        floor_us_per_frame=round(per_frame_us, 1),
        note=note)


def eval512_floors():
    rows = []
    # SA: 2 PNHead applications per frame (backbone on the new cloud —
    # the cache reuses the previous frame's — plus the decoder PNHead,
    # models/track4d.py / pnhead.py), 3 pair kernels each → 6 calls.
    for name, spec in SA_LEVELS.items():
        f = sa_pair_program_flops(spec["scales"])
        v = sa_pair_program_vops(spec["scales"])
        rows.append(block(
            f"SA {name} pair kernel ×2 pnheads",
            programs_per_call=B * 2, calls_per_frame_times_streams=2,
            flops_per_program=f, vops_per_program=v,
            n_custom_calls_per_iter=2,
            note=f"{f/1e9:.2f} GF/program lane-padded; "
                 f"{v/1e6:.1f} M vops"))
    # Correlator: stage 1 (2 MLP layers) + stage 2 (0), one call each.
    for stage, n_mlp in (("stage1", 2), ("stage2", 0)):
        f, v = corr_program_flops(n_mlp), corr_program_vops(n_mlp)
        rows.append(block(
            f"correlator {stage}", programs_per_call=B * 2,
            calls_per_frame_times_streams=1,
            flops_per_program=f, vops_per_program=v,
            n_custom_calls_per_iter=1,
            note=f"{f/1e9:.2f} GF/program; {v/1e6:.1f} M vops"))
    # FP: 3 per PNHead × 2.
    for name, c in zip(("fp3", "fp2", "fp1"), FP_WIDTHS):
        f, v = fp_program_flops(c), fp_program_vops(c)
        rows.append(block(
            f"FP {name} ×2 pnheads", programs_per_call=B,
            calls_per_frame_times_streams=2,
            flops_per_program=f, vops_per_program=v,
            n_custom_calls_per_iter=2,
            note=f"{f/1e9:.2f} GF/program; {v/1e6:.1f} M vops"))
    # Sinkhorn: 500 sequential log-space iterations on (B,33,33)
    # (reference pins iters=500, track4d_utils.py:405-434). Not
    # throughput-bound: each iteration is 2 dependent VPU fusions —
    # the floor is the dependency chain × minimum small-fusion
    # turnaround (~26 ns/iter-op measured: train profile
    # exponential_reduce_fusion 5.88 ms / 16,000 executions / 2).
    sink_us = 500 * 2 * 0.184 / B  # 0.184 µs/fusion measured floor
    rows.append(dict(block="Sinkhorn 500 iters (XLA fori_loop)",
                     mxu_us_per_frame=0.0,
                     vpu_us_per_frame=round(500 * 2 * 33 * 33 * B * 6
                                            / VPU / B * 1e6, 1),
                     dispatch_us_per_frame=0.0,
                     floor_us_per_frame=round(sink_us, 1),
                     note="latency-bound: 1,000-deep dependent fusion "
                          "chain × 0.184 µs measured turnaround; "
                          "VPU-throughput floor is ~1 µs"))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval-profile", default=None,
                    help="profile_train_ops.py eval JSON (adds measured)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    rows = eval512_floors()
    total = sum(r["floor_us_per_frame"] for r in rows)
    out = dict(config="eval 512pt 8streams",
               peaks=dict(mxu_flops=MXU, vpu_ops=VPU, hbm_bps=HBM,
                          dispatch_s=DISPATCH_S),
               rows=rows,
               floor_total_us_per_frame=round(total, 1))

    if args.eval_profile:
        prof = json.load(open(args.eval_profile))
        groups = {g["group"]: g for g in prof.get("groups", [])}
        out["measured_groups"] = groups
        out["measured_device_us_per_frame"] = round(
            prof["device_total_ms"] / prof["n_frames"] * 1e3, 1)

    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
