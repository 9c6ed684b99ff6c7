"""Benchmark: end-to-end tracking step throughput at the VoD val workload shape.

Measures the FULL flagship eval step (PointNet++ backbone ×3, cost volume,
GRU flow decoder, motion segmentation, DBSCAN clustering, 500-iteration
Sinkhorn association, ID assignment) on real hardware:

  * frame shape: 512-point padded radar clouds (~360 valid points — VoD
    5-frame-aggregation scale), 32 track slots — the live config of the
    reference (`src/configs.yaml`: npoints=512).
  * workload: 8 parallel clip streams (frames within a clip are serially
    dependent through the GRU/track state, so cross-clip batching is the
    only legal parallelism) × lax.scan over 32 frames per dispatch.
  * hot path: fused Pallas kernels for every neighborhood stage (set
    abstraction, 3-NN feature propagation, cost-volume correlator) — no
    sorts, no gathers; see ratrack_tpu/ops/pallas_{sa,fp,correlator}.py.

Prints ONE JSON line including an xprof-derived device-time breakdown by
HLO category and MFU vs the chip's self-reported peak
(tools/xprof_breakdown.py parses the raw xplane capture).

`vs_baseline` context: the reference publishes NO throughput numbers
(SURVEY.md §6). Two anchors bound its RTX-4090 rate:
  * measured on this host (tools note, 2026-08): the reference's
    per-frame HOST work alone — sklearn DBSCAN on ~100 moving points
    (1.6 ms) + the python M×N affinity/object dict loops
    (src/models/track4d.py:182-223, ~3.2 ms at 10 objects) — is ~5 ms,
    an upper bound of ~200 fps even with an infinitely fast GPU, before
    the per-frame label-file reads, open3d in-box tests and H2D/D2H
    syncs (SURVEY §2.3) that dominate its loop;
  * REF_FPS_ESTIMATE = 25 additionally assumes ~35 ms of GPU forward +
    transfer + GT assembly per frame, consistent with a per-frame
    synchronized PyTorch loop of this size on a 4090.
vs_baseline is measured fps ÷ that 25 fps estimate; the ~200 fps
host-bound ceiling makes the ≥10× BASELINE.json north star checkable
even under the most generous reading of the reference.
"""

import json
import os
import time

import numpy as np

REF_FPS_ESTIMATE = 25.0
N_STREAMS = 8       # measured knee: throughput ~flat from B=4 to B=16
SCAN_T = 32
N_MAX = 512
K_MAX = 32


def main():
    import jax
    # persistent compilation cache: remote-TPU compile latency is highly
    # variable (16s-370s observed for the same program); cached reruns
    # skip it entirely
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ratrack_tpu.models import Track4D
    from ratrack_tpu.tracker import init_state
    from ratrack_tpu.data.synthetic import synthetic_clip, stack_frames
    from ratrack_tpu.data.frames import FrameBatch
    from ratrack_tpu.train.step import make_scan_eval_step_cached

    model = Track4D(npoint=N_MAX, k_max=K_MAX, sinkhorn_iters=500)

    clips = [synthetic_clip(s, SCAN_T, n_max=N_MAX, g_max=K_MAX,
                            n_static=300, n_objects=5)
             for s in range(N_STREAMS)]
    # [B, T, ...]
    stacked = [stack_frames(c) for c in clips]
    frames = FrameBatch(*[
        jnp.asarray(np.stack([getattr(s, f) for s in stacked]))
        for f in FrameBatch._fields])

    state0 = init_state(K_MAX)
    frame0 = jax.tree_util.tree_map(lambda x: x[0, 0], frames)
    # jitted init: eager flax init per-op dispatch is very slow on the
    # remote TPU backend.
    variables = jax.jit(
        lambda key: model.init(key, frame0, state0, train=False))(
            jax.random.PRNGKey(0))
    tstates = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (N_STREAMS,) + x.shape), state0)

    # cached-backbone scan: carries the pc2 PNHead features across
    # frames (pc2[t] == pc1[t-1] on contiguous streams; bit-identical to
    # the plain scan — tests/test_equivalences.py). The eval driver gates
    # this per chunk on frame-number contiguity (main.py).
    scan_eval = make_scan_eval_step_cached(model)

    t0 = time.time()
    out = scan_eval(variables, tstates, frames)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    # steady state: average over repeats
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        out = scan_eval(variables, tstates, frames)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    fps = N_STREAMS * SCAN_T / dt

    # device-time breakdown + MFU from one traced dispatch
    prof = {}
    if jax.default_backend() == "tpu":
        try:
            import shutil
            import sys
            trace_dir = "/tmp/ratrack_bench_prof"
            shutil.rmtree(trace_dir, ignore_errors=True)
            with jax.profiler.trace(trace_dir):
                out = scan_eval(variables, tstates, frames)
                jax.block_until_ready(out)
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "tools"))
            from xprof_breakdown import analyze_trace
            r = analyze_trace(trace_dir)
            prof = {
                "mfu": r.get("mfu"),
                "peak_tflops_per_s": r.get("peak_tflops_per_s"),
                "achieved_tflops_per_s": r.get("achieved_tflops_per_s"),
                "device_ms_per_frame": round(
                    r["device_time_ms"] / (N_STREAMS * SCAN_T), 3),
                "breakdown": {k: v["pct"]
                              for k, v in r["breakdown"].items()},
            }
        except Exception as e:              # bench must still print a line
            prof = {"profile_error": f"{type(e).__name__}: {e}"}

    result = {
        "metric": "track4d_eval_frames_per_sec_512pt_8streams",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REF_FPS_ESTIMATE, 2),
        "detail": {
            "backend": jax.default_backend(),
            "n_streams": N_STREAMS,
            "scan_T": SCAN_T,
            "n_max": N_MAX,
            "sinkhorn_iters": 500,
            "backbone_cache": True,
            "compile_s": round(compile_s, 1),
            "step_ms_per_frame": round(1000.0 * dt / (N_STREAMS * SCAN_T),
                                       3),
            "ref_fps_estimate": REF_FPS_ESTIMATE,
            "ref_host_floor_note": (
                "reference host-side work alone measured ~5 ms/frame on "
                "this machine (sklearn DBSCAN 1.6 + python affinity loops "
                "3.2), bounding it below ~200 fps regardless of GPU"),
            **prof,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
