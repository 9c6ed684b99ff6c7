"""Decompose the serving single-stream latency (VERDICT r4 weak #7).

Round 3 measured serve_latency_1stream at 31.2 ms wall vs 0.73 ms
device and left the 43× gap unexplained. This probe splits one
`RadarTracker.track()` call into its host/tunnel components on the
real TPU:

  1. pure sync RTT: np.asarray(tiny device array), repeated;
  2. upload cost: jnp.asarray of the packed (1, 512, 12) tensor, the
     (1, 2) flags, the (1,) sids — separately and together (are the
     three uploads serialized RTTs?);
  3. dispatch-only: step with device-resident inputs, NO result pull
     (block_until_ready on the device output);
  4. full track(): upload + dispatch + pull;
  5. double-buffered pair: dispatch scan t+1 before pulling scan t —
     does overlapping hide the pull (throughput mode), i.e. is the
     wall floor per *completed* result < the single-shot latency?

Writes PROBE_SERVE_LATENCY.json. Run on the real TPU from the repo
root (expects the serving program in .jax_cache or pays one compile).
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np  # noqa: E402


def _stats(samples):
    a = np.asarray(samples) * 1000.0
    return {"min_ms": round(float(a.min()), 2),
            "median_ms": round(float(np.median(a)), 2),
            "mean_ms": round(float(a.mean()), 2),
            "n": len(samples)}


def _timeit(fn, reps=20, warmup=2):
    for _ in range(warmup):
        fn()
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return _stats(out)


def main():
    import jax
    import jax.numpy as jnp
    from tools.scenarios import setup
    from ratrack_tpu.serve import RadarTracker

    assert jax.default_backend() == "tpu", "run on the real TPU"
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    model, variables = setup(512, 1, 4)[:2]
    svc = RadarTracker(model, variables, n_max=512, max_streams=1)
    sid = svc.open_stream()
    rng = np.random.RandomState(0)

    def scan():
        return np.concatenate(
            [rng.randn(360, 3).astype(np.float32) * 10,
             rng.randn(360, 2).astype(np.float32)], axis=1)

    # compile / cache-load the bucket-1 program
    svc.track(sid, scan())
    svc.track(sid, scan())

    result = {}

    # 1. pure sync RTT
    tiny = jnp.zeros((4,), jnp.float32) + 1.0
    jax.block_until_ready(tiny)
    result["sync_rtt_tiny_pull"] = _timeit(lambda: np.asarray(tiny))

    dev_zero = jnp.zeros((), jnp.float32)
    jax.block_until_ready(dev_zero)

    # 2. uploads (block to completion so latency isn't deferred)
    packed = np.zeros((1, 512, 12), np.float32)
    flags = np.zeros((1, 2), np.float32)
    sids = np.zeros((1,), np.int32)
    result["upload_packed_25kB"] = _timeit(
        lambda: jax.block_until_ready(jnp.asarray(packed)))
    result["upload_three_separate"] = _timeit(
        lambda: jax.block_until_ready(
            [jnp.asarray(packed), jnp.asarray(flags), jnp.asarray(sids)]))

    # 3. dispatch-only with device-resident inputs (no host pull)
    dp = jnp.asarray(packed)
    df = jnp.asarray(np.array([[1.0, 0.0]], np.float32))
    ds = jnp.asarray(sids)
    jax.block_until_ready([dp, df, ds])

    def dispatch_only():
        out, states = svc._step(svc._variables, svc._states, dp, df, ds)
        jax.block_until_ready(out)

    result["dispatch_only_device_resident"] = _timeit(dispatch_only)

    # 4. full single-stream track()
    result["full_track"] = _timeit(lambda: svc.track(sid, scan()))

    # 5. double-buffered: dispatch t+1 before pulling t. jax dispatch is
    # async — if the tunnel allows an in-flight program while the
    # previous pull drains, per-result wall < single-shot latency.
    def two_overlapped():
        out1, st1 = svc._step(svc._variables, svc._states, dp, df, ds)
        out2, st2 = svc._step(svc._variables, st1, dp, df, ds)
        np.asarray(out1)
        np.asarray(out2)

    def two_serial():
        out1, st1 = svc._step(svc._variables, svc._states, dp, df, ds)
        np.asarray(out1)
        out2, st2 = svc._step(svc._variables, st1, dp, df, ds)
        np.asarray(out2)

    result["pair_serial"] = _timeit(two_serial, reps=15)
    result["pair_overlapped"] = _timeit(two_overlapped, reps=15)
    result["overlap_saves_ms_per_result"] = round(
        (result["pair_serial"]["median_ms"]
         - result["pair_overlapped"]["median_ms"]) / 2, 2)

    out = os.path.join(_ROOT, "PROBE_SERVE_LATENCY.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    for k, v in result.items():
        print(k, v)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
