"""One-command compilation-cache prewarm + compile-time breakdown.

Compiles every flagship program into the persistent cache
(`.jax_cache/`) so production runs and benchmarks never pay the cold
compile, and records WHERE the time goes for each program:

  * `lower_s`   — tracing + StableHLO emission (local Python/JAX work;
    scales with graph size, unaffected by the remote compile service);
  * `compile_s` — XLA backend compilation (on this box: shipped to the
    axon remote-compile service; includes its queue/RTT).

Programs (matching bench.py / tools/bench_suite.py / serve.py shapes):
  1. scan-eval cached-backbone, 8 streams × 32 frames  (bench.py)
  2. scan-eval cached-backbone, 1 stream               (suite #1)
  3. scan-train fused, 8 streams × 32 frames           (suite #3)
  4. serving step buckets B=1 and B=8                  (serve.py)

Usage:  python tools/prewarm_cache.py [--out PREWARM.json]
        python tools/prewarm_cache.py --skip-train     # eval only

A second run with a warm cache shows the cache hit (compile_s drops to
seconds) — the tool prints both numbers either way.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _timed_compile(name, jitted, args, results):
    t0 = time.time()
    lowered = jitted.lower(*args)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    row = dict(program=name, lower_s=round(t1 - t0, 1),
               compile_s=round(t2 - t1, 1))
    results.append(row)
    print(json.dumps(row), flush=True)
    return compiled


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PREWARM.json")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-8k", action="store_true",
                    help="the 8k stretch programs compile in ~4-8 min "
                         "each on this host")
    args = ap.parse_args(argv)

    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from bench_suite import _setup
    from ratrack_tpu.config import Config
    from ratrack_tpu.train.step import (make_scan_eval_step_cached,
                                        make_scan_train_step,
                                        create_train_state,
                                        make_optimizer)
    from ratrack_tpu.tracker import init_state

    results = []
    t_all = time.time()

    # 1-2: scan-eval at 8 streams (bench.py shape) and 1 stream (suite)
    for b, t in ((8, 32), (1, 128)):
        model, variables, frames, tstates = _setup(512, b, t)
        step = make_scan_eval_step_cached(model)
        _timed_compile(f"scan_eval_cached_{b}x{t}", step,
                       (variables, tstates, frames), results)

    # 3: fused scan-train (T=32 — the bench/production scan window)
    if not args.skip_train:
        cfg = Config(n_max=512, k_max=32, g_max=32, npoints=512,
                     sinkhorn_iters=500)
        model, variables, frames, tstates = _setup(512, 8, 32)
        frame0 = jax.tree_util.tree_map(lambda x: x[0, 0], frames)
        ts = create_train_state(model, cfg, frame0, init_state(32), 100)
        tx = make_optimizer(cfg, 100)
        scan_train = make_scan_train_step(model, tx)
        _timed_compile("scan_train_8x32", scan_train,
                       (ts, tstates, frames, jnp.asarray(False)),
                       results)

    # 4: serving buckets (compile via one tracked step per bucket)
    import numpy as np
    from ratrack_tpu.serve import RadarTracker
    model, variables, frames, tstates = _setup(512, 1, 2)
    svc = RadarTracker(model, variables, n_max=512, max_streams=8)
    rng = np.random.RandomState(0)
    scan = lambda: np.concatenate(  # noqa: E731
        [rng.randn(360, 3).astype(np.float32) * 10,
         rng.randn(360, 2).astype(np.float32)], axis=1)
    for bucket in (1, 8):
        sids = [svc.open_stream() for _ in range(bucket)]
        for sid in sids:
            svc.submit(sid, scan())
        t0 = time.time()
        for sid in sids:
            svc.submit(sid, scan())
        svc.step()
        row = dict(program=f"serve_bucket_{bucket}",
                   lower_s=None,
                   compile_s=round(time.time() - t0, 1))
        results.append(row)
        print(json.dumps(row), flush=True)
        for sid in sids:
            svc.close_stream(sid)

    if not args.skip_8k:
        model, variables, frames, tstates = _setup(
            8192, 1, 16, exact_fps=True, mov_budget=512)
        step = make_scan_eval_step_cached(model)
        _timed_compile("scan_eval_8k_1x16", step,
                       (variables, tstates, frames), results)
        if not args.skip_train:
            cfg8 = Config(n_max=8192, k_max=32, g_max=32, npoints=512,
                          sinkhorn_iters=500, exact_fps=True,
                          mov_budget=512)
            model, variables, frames, tstates = _setup(
                8192, 2, 8, exact_fps=True, mov_budget=512)
            frame0 = jax.tree_util.tree_map(lambda x: x[0, 0], frames)
            ts = create_train_state(model, cfg8, frame0, init_state(32),
                                    100)
            tx8 = make_optimizer(cfg8, 100)
            scan_train8 = make_scan_train_step(model, tx8)
            _timed_compile("scan_train_8k_2x8", scan_train8,
                           (ts, tstates, frames, jnp.asarray(False)),
                           results)
        model, variables, frames, tstates = _setup(
            16384, 1, 8, exact_fps=True, mov_budget=512)
        step = make_scan_eval_step_cached(model)
        _timed_compile("scan_eval_16k_1x8", step,
                       (variables, tstates, frames), results)
        if not args.skip_train:
            cfg16 = Config(n_max=16384, k_max=32, g_max=32, npoints=512,
                           sinkhorn_iters=500, exact_fps=True,
                           mov_budget=512)
            model, variables, frames, tstates = _setup(
                16384, 1, 4, exact_fps=True, mov_budget=512)
            frame0 = jax.tree_util.tree_map(lambda x: x[0, 0], frames)
            ts = create_train_state(model, cfg16, frame0,
                                    init_state(32), 100)
            tx16 = make_optimizer(cfg16, 100)
            scan_train16 = make_scan_train_step(model, tx16)
            _timed_compile("scan_train_16k_1x4", scan_train16,
                           (ts, tstates, frames, jnp.asarray(False)),
                           results)

    summary = dict(total_s=round(time.time() - t_all, 1),
                   backend=jax.default_backend(), programs=results)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(dict(prewarm_total_s=summary["total_s"],
                          out=args.out)), flush=True)


if __name__ == "__main__":
    main()
