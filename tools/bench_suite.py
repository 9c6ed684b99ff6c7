"""Multi-config benchmark suite covering the BASELINE.json scenarios.

Unlike bench.py (ONE headline JSON line for the driver), this prints one
JSON line per scenario:

  1. live-config eval, single stream (config 1 shape: one clip, batch 1)
  2. full eval throughput, 8 streams x 32-frame scans (config 2/5 shape)
  3. fused training throughput, grad + per-frame Adam (config 3 shape)
  4. 8k-point stretch eval + train, and 16k stretch eval
     (config 4's "4k-16k pts" range)
  5. online serving latency, single stream

Run on the real TPU: `python tools/bench_suite.py`.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _bench(fn, args, n_frames, reps=5, profile=False):
    import jax
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    row = dict(fps=round(n_frames / dt, 2),
               ms_per_frame=round(1000 * dt / n_frames, 3),
               compile_s=round(compile_s, 1))
    if profile:
        row.update(_profile(fn, args, n_frames))
    return row


def _profile(fn, args, n_frames):
    """One traced dispatch → MFU + device-time category breakdown."""
    import shutil
    import tempfile

    import jax
    trace_dir = tempfile.mkdtemp(prefix="ratrack_suite_prof")
    try:
        with jax.profiler.trace(trace_dir):
            out = fn(*args)
            jax.block_until_ready(out)
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from xprof_breakdown import analyze_trace
        r = analyze_trace(trace_dir)
        return dict(
            mfu=r.get("mfu"),
            device_ms_per_frame=round(
                r.get("device_time_ms", 0.0) / n_frames, 3),
            breakdown_pct={k: v["pct"]
                           for k, v in r.get("breakdown", {}).items()
                           if v["pct"] >= 1.0})
    except Exception as e:  # profiling must never sink the suite
        return dict(profile_error=f"{type(e).__name__}: {e}")
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)


def _setup(n_max, b, t, sinkhorn=500, mov_budget=0, exact_fps=False,
           npoint=512):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ratrack_tpu.models import Track4D
    from ratrack_tpu.tracker import init_state
    from ratrack_tpu.data.synthetic import synthetic_clip, stack_frames
    from ratrack_tpu.data.frames import FrameBatch

    model = Track4D(npoint=min(npoint, n_max), k_max=32,
                    sinkhorn_iters=sinkhorn, mov_budget=mov_budget,
                    exact_fps=exact_fps)
    clips = [synthetic_clip(s, t, n_max=n_max, g_max=32,
                            n_static=min(4000, max(60, n_max * 3 // 5)),
                            n_objects=5) for s in range(b)]
    stacked = [stack_frames(c) for c in clips]
    frames = FrameBatch(*[
        jnp.asarray(np.stack([getattr(s, f) for s in stacked]))
        for f in FrameBatch._fields])
    frame0 = jax.tree_util.tree_map(lambda x: x[0, 0], frames)
    state0 = init_state(32)
    variables = jax.jit(
        lambda key: model.init(key, frame0, state0, train=False))(
        jax.random.PRNGKey(0))
    tstates = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (b,) + x.shape), state0)
    return model, variables, frames, tstates


def main():
    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ratrack_tpu.config import Config
    from ratrack_tpu.train.step import (make_scan_eval_step_cached
                                        as make_scan_eval_step,
                                        make_scan_train_step,
                                        create_train_state, make_optimizer)
    from ratrack_tpu.tracker import init_state
    from ratrack_tpu.data.synthetic import synthetic_clip

    results = []

    # 1. single-stream live config (BASELINE config 1 shape). T=128
    # frames per dispatch — a lone stream is the shape where the
    # ~10-15 ms fixed dispatch cost hurts most (0.47 ms/frame at T=32),
    # and VoD clips run hundreds of frames.
    model, variables, frames, tstates = _setup(512, 1, 128)
    r = _bench(make_scan_eval_step(model), (variables, tstates, frames),
               128)
    results.append(dict(scenario="eval_512pt_1stream", **r))

    # 2. full eval throughput (configs 2/5 shape)
    model, variables, frames, tstates = _setup(512, 8, 32)
    r = _bench(make_scan_eval_step(model), (variables, tstates, frames),
               8 * 32, profile=True)
    results.append(dict(scenario="eval_512pt_8streams", **r))

    # 3. fused training (config 3 shape: batch 8, single chip).
    # T=32 frames per dispatch, the same scan window as the eval
    # scenarios: the scan_train dispatch carries ~15 ms of fixed
    # host/launch overhead on this box (measured: T=8 1.774 ms device →
    # 2.002 ms wall; T=32 → 1.813 ms wall), and VoD train clips are
    # hundreds of frames, so long windows are the production shape.
    cfg = Config(n_max=512, k_max=32, g_max=32, npoints=512,
                 sinkhorn_iters=500)
    model, variables, frames, tstates = _setup(512, 8, 32)
    frame0 = jax.tree_util.tree_map(lambda x: x[0, 0], frames)
    ts = create_train_state(model, cfg, frame0, init_state(32), 100)
    tx = make_optimizer(cfg, 100)
    scan_train = make_scan_train_step(model, tx)
    r = _bench(lambda *a: scan_train(*a)[2],
               (ts, tstates, frames, jnp.asarray(False)), 8 * 32, reps=3,
               profile=True)
    results.append(dict(scenario="train_512pt_8streams", **r))

    # 4. 8k stretch eval (config 4 shape) — the compute-bound regime
    # where MFU is meaningful (VERDICT r2 #5). T=16 frames per dispatch:
    # the ~10-15 ms fixed dispatch overhead was 2.4 ms/frame at T=4.
    model, variables, frames, tstates = _setup(
        8192, 1, 16, exact_fps=True, mov_budget=512)
    r = _bench(make_scan_eval_step(model), (variables, tstates, frames),
               16, reps=3, profile=True)
    results.append(dict(scenario="eval_8192pt_stretch", **r))

    # 4b. 8k stretch fused training
    cfg8 = Config(n_max=8192, k_max=32, g_max=32, npoints=512,
                  sinkhorn_iters=500, exact_fps=True, mov_budget=512)
    model, variables, frames, tstates = _setup(
        8192, 2, 8, exact_fps=True, mov_budget=512)
    frame0 = jax.tree_util.tree_map(lambda x: x[0, 0], frames)
    ts = create_train_state(model, cfg8, frame0, init_state(32), 100)
    tx = make_optimizer(cfg8, 100)
    scan_train = make_scan_train_step(model, tx)
    r = _bench(lambda *a: scan_train(*a)[2],
               (ts, tstates, frames, jnp.asarray(False)), 2 * 8, reps=3,
               profile=True)
    results.append(dict(scenario="train_8192pt_stretch", **r))

    # 4c. 16k stretch eval + train — the top of BASELINE config 4's
    # "4k-16k pts" range (chunked neighborhood ops + tiled kNN kernel)
    model, variables, frames, tstates = _setup(
        16384, 1, 8, exact_fps=True, mov_budget=512)
    r = _bench(make_scan_eval_step(model), (variables, tstates, frames),
               8, reps=3, profile=True)
    results.append(dict(scenario="eval_16384pt_stretch", **r))

    cfg16 = Config(n_max=16384, k_max=32, g_max=32, npoints=512,
                   sinkhorn_iters=500, exact_fps=True, mov_budget=512)
    model, variables, frames, tstates = _setup(
        16384, 1, 4, exact_fps=True, mov_budget=512)
    frame0 = jax.tree_util.tree_map(lambda x: x[0, 0], frames)
    ts = create_train_state(model, cfg16, frame0, init_state(32), 100)
    tx = make_optimizer(cfg16, 100)
    scan_train = make_scan_train_step(model, tx)
    r = _bench(lambda *a: scan_train(*a)[2],
               (ts, tstates, frames, jnp.asarray(False)), 4, reps=2,
               profile=True)
    results.append(dict(scenario="train_16384pt_stretch", **r))

    # 5. online serving latency: single stream, ONE frame per dispatch
    # (what serve.RadarTracker.track pays per scan, incl. host round-trip)
    from ratrack_tpu.serve import RadarTracker
    import numpy as np
    model, variables, frames, tstates = _setup(512, 1, 4)
    svc = RadarTracker(model, variables, n_max=512, max_streams=1)
    sid = svc.open_stream()
    rng = np.random.RandomState(0)
    scan = lambda: np.concatenate(  # noqa: E731
        [rng.randn(360, 3).astype(np.float32) * 10,
         rng.randn(360, 2).astype(np.float32)], axis=1)
    svc.track(sid, scan())
    svc.track(sid, scan())                       # compile
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        svc.track(sid, scan())
    dt = (time.time() - t0) / reps
    # device time of the B=1 bucket dispatch (VERDICT r2 #6: a lone
    # stream must pay a B=1 program, reported from the device timeline)
    prof = _profile(lambda: svc.track(sid, scan()), (), 1)
    results.append(dict(scenario="serve_latency_1stream",
                        ms_per_frame=round(1000 * dt, 3),
                        fps=round(1 / dt, 2), compile_s=0.0,
                        bucket=svc.last_bucket, **prof))

    # 5b. serving at full load: 8 live streams per step() dispatch
    svc8 = RadarTracker(model, variables, n_max=512, max_streams=8)
    sids = [svc8.open_stream() for _ in range(8)]

    def step8():
        for s in sids:
            svc8.submit(s, scan())
        return svc8.step()
    step8(); step8()                             # compile the B=8 bucket
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        step8()
    dt = (time.time() - t0) / (reps * 8)
    prof = _profile(step8, (), 8)
    results.append(dict(scenario="serve_throughput_8streams",
                        ms_per_frame=round(1000 * dt, 3),
                        fps=round(1 / dt, 2), compile_s=0.0,
                        bucket=svc8.last_bucket, **prof))

    for row in results:
        row["backend"] = jax.default_backend()
        print(json.dumps(row))


if __name__ == "__main__":
    main()
