"""Per-op device-time profile of a bench-suite scenario.

Aggregates the 'XLA Ops' timeline by op *name* (not category) so the
biggest individual kernels in a step are visible — the category rollup in
xprof_breakdown.py shows 81% 'custom-call' for the fused train path but
not which custom-calls. Usage (real TPU):

    python tools/profile_train_ops.py [train|eval|train8k|eval8k] [top_n]
"""

from __future__ import annotations

import collections
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def per_op(trace_dir: str, device_substr: str = "TPU", top_n: int = 40):
    from xprof_breakdown import _load_xspace, _stat_value

    xs = _load_xspace(trace_dir)
    planes = [p for p in xs.planes if device_substr in p.name and p.lines]
    plane = planes[0]
    sm = {k: v.name for k, v in plane.stat_metadata.items()}
    em = plane.event_metadata

    md_cache: dict[int, dict] = {}

    def md_stats(mid):
        if mid not in md_cache:
            md_cache[mid] = {sm.get(s.metadata_id): _stat_value(s)
                             for s in em[mid].stats}
        return md_cache[mid]

    lines = [ln for ln in plane.lines if ln.name == "XLA Ops"]
    agg_ps = collections.Counter()
    agg_n = collections.Counter()
    agg_cat = {}
    total_ps = 0
    from xprof_breakdown import _CONTAINERS
    for ev in lines[0].events:
        st = md_stats(ev.metadata_id)
        cat = st.get("hlo_category") or "uncategorized"
        if cat in _CONTAINERS:
            continue
        name = em[ev.metadata_id].name
        agg_ps[name] += ev.duration_ps
        agg_n[name] += 1
        agg_cat[name] = cat
        total_ps += ev.duration_ps
    rows = []
    for name, ps in agg_ps.most_common(top_n):
        rows.append(dict(op=name, cat=agg_cat[name],
                         ms=round(ps / 1e9, 3),
                         pct=round(100 * ps / total_ps, 1),
                         calls=agg_n[name]))

    # 100%-coverage rollup: custom-calls keyed by their call-site prefix
    # (%sa1.83 → custom-call:sa1), everything else by hlo_category — the
    # roofline accounting (VERDICT r4 #3/#4) needs every picosecond
    # attributed to a bounded group, not a top-N list.
    grp_ps = collections.Counter()
    grp_n = collections.Counter()
    for name, ps in agg_ps.items():
        cat = agg_cat[name]
        if cat == "custom-call":
            base = name.split(" = ")[0].lstrip("%").split(".")[0]
            key = f"custom-call:{base}"
        else:
            key = cat
        grp_ps[key] += ps
        grp_n[key] += agg_n[name]
    groups = [dict(group=k, ms=round(ps / 1e9, 3),
                   pct=round(100 * ps / total_ps, 2), calls=grp_n[k])
              for k, ps in grp_ps.most_common()]
    return dict(device_total_ms=round(total_ps / 1e9, 3),
                groups=groups, top=rows)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "train"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from bench_suite import _setup
    from ratrack_tpu.config import Config
    from ratrack_tpu.tracker import init_state
    from ratrack_tpu.train.step import (create_train_state, make_optimizer,
                                        make_scan_train_step,
                                        make_scan_eval_step_cached)

    if which in ("train", "train8k", "train16k"):
        if which == "train":
            # T=32: the bench/production scan window (tools/scenarios.py)
            n_max, b, t, kw = 512, 8, 32, {}
        elif which == "train16k":
            n_max, b, t, kw = 16384, 1, 2, dict(exact_fps=True,
                                                mov_budget=512)
        else:
            n_max, b, t, kw = 8192, 2, 2, dict(exact_fps=True,
                                               mov_budget=512)
        cfg = Config(n_max=n_max, k_max=32, g_max=32, npoints=512,
                     sinkhorn_iters=500, **kw)
        model, variables, frames, tstates = _setup(n_max, b, t, **kw)
        frame0 = jax.tree_util.tree_map(lambda x: x[0, 0], frames)
        ts = create_train_state(model, cfg, frame0, init_state(32), 100)
        tx = make_optimizer(cfg, 100)
        step = make_scan_train_step(model, tx)
        args = (ts, tstates, frames, jnp.asarray(False))
        n_frames = b * t
    else:
        if which == "eval":
            n_max, b, t, kw = 512, 8, 32, {}
        elif which == "eval16k":
            n_max, b, t, kw = 16384, 1, 4, dict(exact_fps=True,
                                                mov_budget=512)
        else:
            n_max, b, t, kw = 8192, 1, 4, dict(exact_fps=True,
                                               mov_budget=512)
        model, variables, frames, tstates = _setup(n_max, b, t, **kw)
        step = make_scan_eval_step_cached(model)
        args = (variables, tstates, frames)
        n_frames = b * t

    out = step(*args)           # compile
    jax.block_until_ready(out)

    import shutil
    import tempfile
    trace_dir = tempfile.mkdtemp(prefix="ratrack_perop")
    try:
        with jax.profiler.trace(trace_dir):
            out = step(*args)
            jax.block_until_ready(out)
        r = per_op(trace_dir, top_n=top_n)
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)
    r["n_frames"] = n_frames
    r["ms_per_frame"] = round(r["device_total_ms"] / n_frames, 3)
    print(json.dumps(r, indent=1))


if __name__ == "__main__":
    main()
