"""One-command compilation-cache prewarm + compile-time breakdown.

Compiles every benchmark program into the persistent cache
(`.jax_cache/`) so production runs and benchmarks never pay the cold
compile, and records WHERE the time goes for each program:

  * `lower_s`   — tracing + StableHLO emission (local Python/JAX work;
    scales with graph size, unaffected by the remote compile service);
  * `compile_s` — XLA backend compilation (on this box: shipped to the
    axon remote-compile service; includes its queue/RTT).

The program list is DERIVED from `tools/scenarios.py` — the same table
`tools/bench_suite.py` measures — so PREWARM.json and BENCH_SUITE.json
cover identical program shapes by construction (VERDICT r3 #6).

Usage:  python tools/prewarm_cache.py [--out PREWARM.json]
        python tools/prewarm_cache.py --skip-train     # eval only
        python tools/prewarm_cache.py --skip-8k        # no stretch

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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _timed_compile(name, jitted, args, results):
    t0 = time.time()
    lowered = jitted.lower(*args)
    t1 = time.time()
    lowered.compile()
    t2 = time.time()
    row = dict(program=name, lower_s=round(t1 - t0, 1),
               compile_s=round(t2 - t1, 1))
    results.append(row)
    print(json.dumps(row), flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PREWARM.json")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-8k", action="store_true",
                    help="the stretch programs compile in ~5-30 min "
                         "each on a cold cache on this host")
    args = ap.parse_args(argv)

    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np
    from scenarios import SCENARIOS, SERVE_BUCKETS, build, setup
    from ratrack_tpu.serve import RadarTracker

    results = []
    t_all = time.time()

    for scn in SCENARIOS:
        if scn["kind"] == "serve":
            continue  # bucket programs handled once below
        if args.skip_train and scn["kind"] == "train":
            continue
        if args.skip_8k and scn["n_max"] > 4096:
            continue
        fn, fargs, _ = build(scn)
        _timed_compile(scn["name"], fn, fargs, results)

    # serving buckets (compile via one tracked step per bucket)
    model, variables, _, _ = setup(512, 1, 2)
    svc = RadarTracker(model, variables, n_max=512,
                       max_streams=max(SERVE_BUCKETS))
    rng = np.random.RandomState(0)
    scan = lambda: np.concatenate(  # noqa: E731
        [rng.randn(360, 3).astype(np.float32) * 10,
         rng.randn(360, 2).astype(np.float32)], axis=1)
    for bucket in SERVE_BUCKETS:
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

    summary = dict(total_s=round(time.time() - t_all, 1),
                   backend=jax.default_backend(), programs=results)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(dict(prewarm_total_s=summary["total_s"],
                          out=args.out)), flush=True)


if __name__ == "__main__":
    main()
