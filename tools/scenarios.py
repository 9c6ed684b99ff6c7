"""THE scenario table — single source of truth for benchmark shapes.

Both `tools/bench_suite.py` (measures) and `tools/prewarm_cache.py`
(compiles into the persistent cache) derive their program lists from
this table, so the two can never drift apart silently (VERDICT r3 #6:
BENCH_SUITE once recorded a 278 s cold compile in the same round whose
PREWARM showed 28.8 s warm — the suite had quietly compiled a program
prewarm never saw).

Each scenario carries `warm_compile_s`: the cache-HIT upper bound for
that program (measured warm deserialize times on this box are ~9-80 s;
cold backend compiles are ~200-1800 s — see NOTES_ROUND3.md's
compile-time table). The suite compares its measured first-dispatch
time against this bound and reports `cache_hit` / a visible warning
per scenario.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

#: serving bucket sizes compiled by prewarm and exercised by the suite
SERVE_BUCKETS = (1, 8)

#: kind="eval"  → cached-backbone scan-eval program
#: kind="train" → fused scan-train program (grad + per-frame Adam)
#: kind="serve" → RadarTracker host-loop scenarios (bucketed programs)
SCENARIOS = (
    # 1. single-stream live config (BASELINE config 1 shape). T=128
    # frames per dispatch — a lone stream is where the ~10-15 ms fixed
    # dispatch cost hurts most, and VoD clips run hundreds of frames.
    dict(name="eval_512pt_1stream", kind="eval", n_max=512, b=1, t=128,
         reps=5, profile=False, warm_compile_s=60.0),
    # 2. full eval throughput (configs 2/5 shape; bench.py headline)
    dict(name="eval_512pt_8streams", kind="eval", n_max=512, b=8, t=32,
         reps=5, profile=True, warm_compile_s=90.0),
    # 3. fused training (config 3 shape). T=32: the scan_train dispatch
    # carries ~15 ms fixed host/launch overhead (measured T=8 → 2.002
    # ms/frame wall vs T=32 → 1.813), and VoD train clips are hundreds
    # of frames, so long windows are the production shape.
    dict(name="train_512pt_8streams", kind="train", n_max=512, b=8,
         t=32, reps=3, profile=True, warm_compile_s=150.0),
    # 4. 8k/16k stretch (BASELINE config 4's "4k-16k pts" range) —
    # the compute-bound regime where MFU is meaningful.
    dict(name="eval_8192pt_stretch", kind="eval", n_max=8192, b=1,
         t=16, exact_fps=True, mov_budget=512, reps=3, profile=True,
         warm_compile_s=90.0),
    dict(name="train_8192pt_stretch", kind="train", n_max=8192, b=2,
         t=8, exact_fps=True, mov_budget=512, reps=3, profile=True,
         warm_compile_s=180.0),
    dict(name="eval_16384pt_stretch", kind="eval", n_max=16384, b=1,
         t=8, exact_fps=True, mov_budget=512, reps=3, profile=True,
         warm_compile_s=90.0),
    dict(name="train_16384pt_stretch", kind="train", n_max=16384, b=1,
         t=4, exact_fps=True, mov_budget=512, reps=2, profile=True,
         warm_compile_s=180.0),
    # 5. online serving: per-scan latency (B=1 bucket) and full-load
    # throughput (B=8 bucket). Bucket programs listed in SERVE_BUCKETS.
    dict(name="serve_latency_1stream", kind="serve", bucket=1,
         warm_compile_s=60.0),
    dict(name="serve_throughput_8streams", kind="serve", bucket=8,
         warm_compile_s=60.0),
)

_MODEL_KEYS = ("n_max", "b", "t", "exact_fps", "mov_budget")


def setup(n_max, b, t, sinkhorn=500, mov_budget=0, exact_fps=False,
          npoint=512):
    """Model + synthetic FrameBatch + tracker states for a scenario."""
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


def build(scn):
    """Scenario row → (fn, args, n_frames) for kind in {eval, train}.

    The returned fn/args are EXACTLY what bench_suite times and what
    prewarm lowers+compiles — shape identity by construction.
    """
    import jax
    import jax.numpy as jnp
    from ratrack_tpu.config import Config
    from ratrack_tpu.train.step import (make_scan_eval_step_cached,
                                        make_scan_train_step,
                                        create_train_state,
                                        make_optimizer)
    from ratrack_tpu.tracker import init_state

    kw = {k: scn[k] for k in _MODEL_KEYS if k in scn}
    model, variables, frames, tstates = setup(**kw)
    n_frames = scn["b"] * scn["t"]
    if scn["kind"] == "eval":
        return (make_scan_eval_step_cached(model),
                (variables, tstates, frames), n_frames)
    cfg = Config(n_max=scn["n_max"], k_max=32, g_max=32, npoints=512,
                 sinkhorn_iters=500,
                 exact_fps=scn.get("exact_fps", False),
                 mov_budget=scn.get("mov_budget", 0))
    frame0 = jax.tree_util.tree_map(lambda x: x[0, 0], frames)
    ts = create_train_state(model, cfg, frame0, init_state(32), 100)
    tx = make_optimizer(cfg, 100)
    scan_train = make_scan_train_step(model, tx)
    return (scan_train, (ts, tstates, frames, jnp.asarray(False)),
            n_frames)
