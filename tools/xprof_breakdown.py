"""Device-time breakdown + MFU from a JAX xprof trace.

Parses the raw `*.xplane.pb` a `jax.profiler.trace(...)` capture writes
(schema mirrored in tools/xplane_proto/xplane.proto — the public XLA/TSL
XSpace layout) and aggregates the TPU "XLA Ops" timeline:

  * leaf device time by HLO category (container ops like `while` nest
    their children on the same line and are excluded);
  * model FLOPs by category and achieved FLOP/s;
  * MFU vs the chip's own peak (the trace carries
    `peak_teraflops_per_second` per core).

Usage:
    python tools/profile_step.py            # capture + print (see there)
    from tools.xprof_breakdown import analyze_trace
    analyze_trace("/tmp/prof")              # -> dict
"""

from __future__ import annotations

import collections
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "xplane_proto"))

# container categories whose duration covers their children on the line
_CONTAINERS = ("while", "conditional", "call", "fusion-parent")


def _load_xspace(trace_dir: str):
    import xplane_pb2
    pbs = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                           recursive=True))
    if not pbs:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def _stat_value(stat):
    for f in ("str_value", "double_value", "int64_value", "uint64_value",
              "ref_value"):
        if stat.HasField(f):
            return getattr(stat, f)
    return None


def analyze_trace(trace_dir: str, device_substr: str = "TPU") -> dict:
    """Aggregate the last trace under `trace_dir` → breakdown dict."""
    xs = _load_xspace(trace_dir)
    planes = [p for p in xs.planes
              if device_substr in p.name and p.lines]
    if not planes:
        raise RuntimeError(
            f"no device plane matching {device_substr!r}; planes: "
            f"{[p.name for p in xs.planes]}")
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
    if not lines:
        raise RuntimeError("no 'XLA Ops' line in device plane")

    plane_stats = {sm.get(s.metadata_id): _stat_value(s)
                   for s in plane.stats}
    peak_tflops = plane_stats.get("peak_teraflops_per_second") or None

    cat_ps: collections.Counter = collections.Counter()
    cat_flops: collections.Counter = collections.Counter()
    total_ps = 0
    for ev in lines[0].events:
        st = md_stats(ev.metadata_id)
        cat = st.get("hlo_category") or "uncategorized"
        if cat in _CONTAINERS:
            continue                       # children are on the same line
        cat_ps[cat] += ev.duration_ps
        cat_flops[cat] += float(st.get("model_flops") or 0.0)
        total_ps += ev.duration_ps

    total_s = total_ps / 1e12
    total_flops = sum(cat_flops.values())
    achieved = total_flops / total_s if total_s else 0.0
    breakdown = {
        c: {"ms": round(t / 1e9, 3),
            "pct": round(100.0 * t / max(total_ps, 1), 1),
            "gflops": round(cat_flops[c] / 1e9, 2)}
        for c, t in cat_ps.most_common()
        if t / max(total_ps, 1) >= 0.001
    }
    out = {
        "device": plane.name,
        "device_time_ms": round(total_s * 1e3, 3),
        "model_tflops_total": round(total_flops / 1e12, 4),
        "achieved_tflops_per_s": round(achieved / 1e12, 3),
        "breakdown": breakdown,
    }
    if peak_tflops:
        out["peak_tflops_per_s"] = float(peak_tflops)
        out["mfu"] = round(achieved / 1e12 / float(peak_tflops), 4)
    if plane_stats.get("peak_hbm_bw_gigabytes_per_second"):
        out["peak_hbm_gb_per_s"] = round(
            float(plane_stats["peak_hbm_bw_gigabytes_per_second"]), 1)
    return out


def main(argv=None):
    import argparse
    import json
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("trace_dir")
    p.add_argument("--device", default="TPU")
    args = p.parse_args(argv)
    print(json.dumps(analyze_trace(args.trace_dir, args.device), indent=2))


if __name__ == "__main__":
    main()
