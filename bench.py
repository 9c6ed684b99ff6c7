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

Prints ONE JSON line. `vs_baseline` is measured fps / 25, where 25 fps is
the working estimate of the reference's RTX-4090 end-to-end rate (no
throughput numbers are published in the reference — SURVEY.md §6; the
estimate reflects its per-frame python loop with host DBSCAN round-trips).
"""

import json
import time

import numpy as np

REF_FPS_ESTIMATE = 25.0
N_STREAMS = 8       # measured knee: ~flat 2.8 ms/frame from B=4 to B=16
SCAN_T = 32
N_MAX = 512
K_MAX = 32


def main():
    import os

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
    from ratrack_tpu.train.step import make_scan_eval_step

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

    scan_eval = make_scan_eval_step(model)

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
            "compile_s": round(compile_s, 1),
            "step_ms_per_frame": round(1000.0 * dt / (N_STREAMS * SCAN_T),
                                       3),
            "ref_fps_estimate": REF_FPS_ESTIMATE,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
