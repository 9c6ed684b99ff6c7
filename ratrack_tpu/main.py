"""Training / evaluation driver CLI.

Usage (mirrors the reference `python main.py --config configs.yaml`,
src/main.py:153-169):

    python -m ratrack_tpu.main --config configs/default.yaml
    python -m ratrack_tpu.main --config configs/eval.yaml

Reference driver behaviours reproduced: checkpoint tree
checkpoints/<exp>/models, tee logging to run.log, per-epoch last/last<ep>
saves + best-loss copy, pretrain gating, per-epoch seg/flow metric means,
eval-mode per-frame result export. Improvements over the reference:
deterministic streaming (no worker-cursor duplication), full optimizer
state in checkpoints, loss-curve dump as CSV instead of matplotlib PNGs.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Dict, List

import numpy as np


class Tee:
    """Print + append to run.log (reference IOStream, main.py:18-28)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        self.f = open(path, "a")

    def print(self, text: str):
        print(text)
        self.f.write(text + "\n")
        self.f.flush()


class _SynthStream:
    """Synthetic-dataset stand-in with the VodTrackStream interface.

    cfg.synth_clips clips of cfg.synth_frames frames; train clips use
    seeds [0, n) and the val split uses disjoint seeds [n, n + n//2).
    """

    def __init__(self, cfg, clips=None, split="train"):
        self.cfg = cfg
        if clips is not None:
            self.clips = clips
        elif split == "train":
            self.clips = [f"synth_{i}" for i in range(cfg.synth_clips)]
        else:
            self.clips = [f"synth_{i}" for i in
                          range(cfg.synth_clips,
                                cfg.synth_clips + max(1,
                                                      cfg.synth_clips // 2))]
        self.skipped = []

    def __len__(self):
        return len(self.clips) * self.cfg.synth_frames

    def __iter__(self):
        from .data.synthetic import synthetic_clip
        for clip in self.clips:
            ci = int(clip.split("_")[1])
            # static-clutter density scales with the pad budget so the
            # stretch configs actually fill their clouds
            n_static = min(self.cfg.n_max - 64,
                           max(60, self.cfg.n_max * 3 // 5))
            for rec in synthetic_clip(
                    ci, self.cfg.synth_frames, n_max=self.cfg.n_max,
                    g_max=self.cfg.g_max, n_static=n_static):
                yield clip, rec


def _build_stream(cfg, split):
    if cfg.dataset == "vod":
        from .data.pipeline import VodTrackStream
        return VodTrackStream(cfg, split=split)
    if cfg.dataset == "synthetic":
        return _SynthStream(cfg, split=split)
    raise ValueError(f"dataset not supported: {cfg.dataset}")


def _stream_factory(cfg, split):
    """(make_stream, clips, per-clip record-count estimates) for batching."""
    if cfg.dataset == "vod":
        from .data.pipeline import VodTrackStream
        base = VodTrackStream(cfg, split=split)
        lengths = [max(0, len(base.clip_frames(c)) - 1) for c in base.clips]
        return (lambda clips: VodTrackStream(cfg, split=split, clips=clips),
                list(base.clips), lengths)
    if cfg.dataset == "synthetic":
        base = _SynthStream(cfg, split=split)
        return (lambda clips: _SynthStream(cfg, clips=clips),
                list(base.clips), [cfg.synth_frames] * len(base.clips))
    raise ValueError(f"dataset not supported: {cfg.dataset}")


def run_train_epoch_batched(cfg, ts, scan_train, split, ep: int, log: Tee,
                            mesh=None):
    """One epoch of dp×scan_frames fused training.

    Clips are balance-partitioned into cfg.dp parallel streams; each
    dispatch runs scan_frames sequential per-frame optimizer steps over all
    streams at once (train/step.py:make_scan_train_step). With a mesh, the
    stream axis is sharded over 'dp' and gradients all-reduce over ICI.
    """
    import jax
    import jax.numpy as jnp
    from .data.pipeline import (split_clips_balanced, batched_blocks,
                                Prefetcher)
    from .tracker.state import init_state
    from .parallel import shard_clips, replicate

    make_stream, clips, lengths = _stream_factory(cfg, split)
    groups = split_clips_balanced(clips, lengths, cfg.dp)
    group_lengths = [sum(lengths[clips.index(c)] for c in g) if g else 0
                     for g in groups]
    t = max(1, cfg.scan_frames)
    pretrain = jnp.asarray(ep < cfg.pretrain_epochs)

    tstates = jax.vmap(
        lambda _: init_state(cfg.k_max, cfg.gru_layers, cfg.feat_dim))(
        jnp.arange(cfg.dp))
    if mesh is not None:
        ts = ts._replace(params=replicate(mesh, ts.params),
                         batch_stats=replicate(mesh, ts.batch_stats),
                         opt_state=replicate(mesh, ts.opt_state))
        tstates = shard_clips(mesh, tstates)

    totals: Dict[str, float] = {}
    count = 0
    t0 = time.time()
    blocks = Prefetcher(batched_blocks(make_stream, groups, group_lengths,
                                       t, cfg.n_max, cfg.g_max),
                        depth=cfg.prefetch_depth)
    for block in blocks:
        block = jax.tree_util.tree_map(jnp.asarray, block)
        if mesh is not None:
            block = shard_clips(mesh, block)
        ts, tstates, items = scan_train(ts, tstates, block, pretrain)
        count += t * cfg.dp
        for k, v in items.items():
            totals[k] = totals.get(k, 0.0) + float(
                np.sum(np.mean(np.asarray(v), axis=1))) / t
    dt = time.time() - t0
    mean_items = {k: v / max(count // (t * cfg.dp), 1)
                  for k, v in totals.items()}
    log.print(f"[train/batched] epoch {ep}: {count} frame-steps in {dt:.1f}s"
              f" ({count / max(dt, 1e-9):.1f} fps) "
              + " ".join(f"{k}={v:.4f}" for k, v in mean_items.items()))
    return ts, mean_items


def run_epoch(cfg, model, ts, step_fns, stream, mode: str, ep: int,
              log: Tee, results_dir: str | None = None):
    """One pass over the stream. Returns (mean loss, items, seg, flow)."""
    import jax
    import jax.numpy as jnp
    from .data.frames import FrameBatch
    from .tracker.state import init_state
    from .train.metrics import eval_scene_flow, eval_motion_seg
    from .eval.export import format_frame_results, write_frame_results

    train_step, eval_step = step_fns
    pretrain = ep < cfg.pretrain_epochs
    tstate = jax.tree_util.tree_map(lambda x: x[None],
                                    init_state(cfg.k_max, cfg.gru_layers,
                                               cfg.feat_dim))
    totals: Dict[str, float] = {}
    seg_tot: Dict[str, float] = {}
    flow_tot: Dict[str, float] = {}
    count = 0
    t0 = time.time()
    for clip, rec in stream:
        batch = FrameBatch(*[jnp.asarray(np.asarray(x)[None])
                             for x in rec])
        if mode == "train":
            ts, tstate, items = train_step(ts, tstate, batch,
                                           jnp.asarray(pretrain))
            out = None
        else:
            variables = {"params": ts.params,
                         "batch_stats": ts.batch_stats}
            out, tstate = eval_step(variables, tstate, batch)
            from .train.losses import track4d_loss
            loss, items = track4d_loss(
                {k: v[0] for k, v in out.items()}, rec, pretrain)
            items = {k: v[None] for k, v in items.items()}

        count += 1
        for k, v in items.items():
            totals[k] = totals.get(k, 0.0) + float(np.mean(np.asarray(v)))

        if out is not None:
            o = {k: np.asarray(v[0]) for k, v in out.items()}
            valid = np.asarray(rec.mask1)
            seg = eval_motion_seg((o["cls"] > cfg.mov_thres).astype(float),
                                  np.asarray(rec.gt_cls).astype(float),
                                  valid)
            flow = eval_scene_flow(np.asarray(rec.pc1), o["warp"],
                                   np.asarray(rec.gt_flow), o["cls"], valid)
            for k, v in seg.items():
                seg_tot[k] = seg_tot.get(k, 0.0) + v
            for k, v in flow.items():
                flow_tot[k] = flow_tot.get(k, 0.0) + v
            if results_dir is not None:
                text = format_frame_results(
                    o["labels"], o["track_id"], o["conf"], int(o["n"]),
                    np.asarray(rec.pc1))
                write_frame_results(results_dir, clip,
                                    int(rec.frame_number), text)
            if cfg.vis_dir:
                from .utils.vis import plot_frame_bev
                fn = int(rec.frame_number)
                plot_frame_bev(
                    os.path.join(cfg.vis_dir, clip, f"{fn:05d}.png"),
                    np.asarray(rec.pc1), valid, o["cls"], o["labels"],
                    o["track_id"], o["flow"], cfg.mov_thres,
                    title=f"{clip} frame {fn}")

    dt = time.time() - t0
    mean_items = {k: v / max(count, 1) for k, v in totals.items()}
    seg_m = {k: v / max(count, 1) for k, v in seg_tot.items()}
    flow_m = {k: v / max(count, 1) for k, v in flow_tot.items()}
    log.print(f"[{mode}] epoch {ep}: {count} frames in {dt:.1f}s "
              f"({count / max(dt, 1e-9):.1f} fps) "
              + " ".join(f"{k}={v:.4f}" for k, v in mean_items.items()))
    if seg_m:
        log.print(f"segmentation: {seg_m}")
        log.print(f"scene flow: {flow_m}")
    if stream.skipped:
        log.print(f"skipped {len(stream.skipped)} frames: "
                  f"{stream.skipped[:5]}...")
    return ts, mean_items, seg_m, flow_m


def run_eval_epoch_scan(cfg, model, ts, stream, log: Tee,
                        results_dir: str | None):
    """Scan-fused eval: T frames per dispatch, per-clip sequential.

    Chunks of cfg.scan_frames records per clip run through
    make_scan_eval_step; the tail chunk pads by repeating its last record
    (padded outputs are discarded; the polluted track state cannot leak —
    the next clip's first record carries new_seq=True, which resets state
    inside the model). Exports + metrics happen on host after each chunk.
    """
    import jax
    import jax.numpy as jnp
    from .data.frames import FrameBatch
    from .data.pipeline import Prefetcher
    from .tracker.state import init_state
    from .train.step import (make_scan_eval_step,
                             make_scan_eval_step_cached, chain_contiguous)
    from .train.metrics import eval_scene_flow, eval_motion_seg
    from .eval.export import format_frame_results, write_frame_results

    scan_eval = make_scan_eval_step(model)
    # fast path: carries the pc2 backbone across frames (bit-identical
    # when the chunk's frame numbers are consecutive — gated per chunk)
    scan_eval_cached = make_scan_eval_step_cached(model)
    t = max(1, cfg.scan_frames)
    variables = {"params": ts.params, "batch_stats": ts.batch_stats}
    tstate = jax.tree_util.tree_map(
        lambda x: x[None], init_state(cfg.k_max, cfg.gru_layers,
                                      cfg.feat_dim))
    seg_tot: Dict[str, float] = {}
    flow_tot: Dict[str, float] = {}
    count = 0
    t0 = time.time()

    def flush(clip, chunk, tstate):
        nonlocal count
        real = len(chunk)
        # gate on REAL records only: padded repeats produce discarded
        # outputs and the next clip's new_seq resets the polluted state
        contiguous = chain_contiguous(
            [int(r.frame_number) for r in chunk[:real]],
            [bool(r.new_seq) for r in chunk[:real]])
        chunk = chunk + [chunk[-1]] * (t - real)        # tail repeat-pad
        block = FrameBatch(*[jnp.asarray(
            np.stack([np.asarray(getattr(r, f)) for r in chunk])[None])
            for f in FrameBatch._fields])
        step_fn = scan_eval_cached if contiguous else scan_eval
        tstate, outs = step_fn(variables, tstate, block)
        outs = {k: np.asarray(v[0]) for k, v in outs.items()}
        for i in range(real):
            rec = chunk[i]
            o = {k: v[i] for k, v in outs.items()}
            valid = np.asarray(rec.mask1)
            seg = eval_motion_seg((o["cls"] > cfg.mov_thres).astype(float),
                                  np.asarray(rec.gt_cls).astype(float),
                                  valid)
            flow = eval_scene_flow(np.asarray(rec.pc1), o["warp"],
                                   np.asarray(rec.gt_flow), o["cls"], valid)
            for k, v in seg.items():
                seg_tot[k] = seg_tot.get(k, 0.0) + v
            for k, v in flow.items():
                flow_tot[k] = flow_tot.get(k, 0.0) + v
            if results_dir is not None:
                text = format_frame_results(
                    o["labels"], o["track_id"], o["conf"], int(o["n"]),
                    np.asarray(rec.pc1))
                write_frame_results(results_dir, clip,
                                    int(rec.frame_number), text)
            if cfg.vis_dir:
                # post-hoc BEV render per flushed chunk: the scan already
                # returns labels/ids/warp, so vis no longer forces the
                # slow per-frame path (flow = warp - pc1)
                from .utils.vis import plot_frame_bev
                fn = int(rec.frame_number)
                pc1 = np.asarray(rec.pc1)
                plot_frame_bev(
                    os.path.join(cfg.vis_dir, clip, f"{fn:05d}.png"),
                    pc1, valid, o["cls"], o["labels"], o["track_id"],
                    o["warp"] - pc1, cfg.mov_thres,
                    title=f"{clip} frame {fn}")
            count += 1
        return tstate

    cur_clip, chunk = None, []
    for clip, rec in Prefetcher(iter(stream), depth=cfg.prefetch_depth):
        if clip != cur_clip and chunk:
            tstate = flush(cur_clip, chunk, tstate)
            chunk = []
        cur_clip = clip
        chunk.append(rec)
        if len(chunk) == t:
            tstate = flush(cur_clip, chunk, tstate)
            chunk = []
    if chunk:
        flush(cur_clip, chunk, tstate)

    dt = time.time() - t0
    seg_m = {k: v / max(count, 1) for k, v in seg_tot.items()}
    flow_m = {k: v / max(count, 1) for k, v in flow_tot.items()}
    log.print(f"[eval/scan] {count} frames in {dt:.1f}s "
              f"({count / max(dt, 1e-9):.1f} fps)")
    log.print(f"segmentation: {seg_m}")
    log.print(f"scene flow: {flow_m}")
    return seg_m, flow_m


def main(argv=None):
    parser = argparse.ArgumentParser(description="RaTrack-TPU driver")
    parser.add_argument("--config", type=str, default="configs/default.yaml")
    parser.add_argument("--cpu", action="store_true",
                        help="force CPU backend (the axon plugin ignores "
                             "JAX_PLATFORMS)")
    args = parser.parse_args(argv)

    from .config import load_config
    cfg = load_config(args.config)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    exp_dir = os.path.join(cfg.checkpoints_dir, cfg.exp_name)
    models_dir = os.path.join(exp_dir, "models")
    os.makedirs(models_dir, exist_ok=True)
    log = Tee(os.path.join(exp_dir, "run.log"))
    log.print(str(cfg))
    log.print(f"backend: {jax.default_backend()} devices: {jax.devices()}")

    if cfg.profile_dir:
        # xprof trace of the whole run (view with tensorboard / xprof);
        # the reference has no profiling story at all (SURVEY.md §5)
        jax.profiler.start_trace(cfg.profile_dir)
        log.print(f"profiling to {cfg.profile_dir}")
    try:
        _run(cfg, log, models_dir, exp_dir)
    finally:
        if cfg.profile_dir:
            jax.profiler.stop_trace()


def _run(cfg, log, models_dir, exp_dir):
    import jax

    np.random.seed(cfg.seed)

    from .models import model_from_config
    from .tracker.state import init_state
    from .train.step import (create_train_state, make_optimizer,
                             make_train_step, make_eval_step)
    from .train import checkpoint as ckpt

    model = model_from_config(cfg)
    stream = _build_stream(cfg, "val" if cfg.eval else "train")
    first = next(iter(stream))[1]
    steps_per_epoch = len(stream)
    # in batched mode one optimizer step covers dp frames, so the LR
    # schedule's per-epoch transition count shrinks accordingly
    opt_steps_per_epoch = max(1, steps_per_epoch // max(1, cfg.dp))
    ts = create_train_state(model, cfg, first,
                            init_state(cfg.k_max, cfg.gru_layers,
                                       cfg.feat_dim),
                            opt_steps_per_epoch, seed=cfg.seed)
    tx = make_optimizer(cfg, opt_steps_per_epoch)
    step_fns = (make_train_step(model, tx), make_eval_step(model))

    if cfg.continue_model and ckpt.latest_exists(models_dir, "last"):
        ts = ckpt.restore_train_state(models_dir, "last", ts)
        log.print("restored checkpoint: last")
    elif cfg.eval or cfg.load_checkpoint:
        name = cfg.model_path or "best"
        if name.endswith((".t7", ".pt")) and os.path.isfile(name):
            # the reference's own eval flow points model_path at a torch
            # .t7 file (/root/reference/src/models/model.py:28-37,
            # configs_eval.yaml); accept those directly through the
            # weight converter so its published checkpoint runs here
            from .utils.convert import load_reference_checkpoint
            variables, leftover = load_reference_checkpoint(name)
            same = (jax.tree_util.tree_structure(ts.params)
                    == jax.tree_util.tree_structure(variables["params"]))
            if same:
                ts = ts._replace(params=variables["params"],
                                 batch_stats=variables["batch_stats"])
                log.print(f"converted reference checkpoint: {name} "
                          f"({len(leftover)} dead-module keys ignored)")
            else:
                log.print(f"WARNING: reference checkpoint '{name}' does "
                          "not match the model tree, using fresh init")
        elif ckpt.latest_exists(models_dir, name):
            ts = ckpt.restore_train_state(models_dir, name, ts)
            log.print(f"restored checkpoint: {name}")
        else:
            log.print(f"WARNING: checkpoint '{name}' not found, "
                      "using fresh init")

    if cfg.eval:
        # a fresh eval owns its results tree: stale files from previous
        # runs would silently mix into the MOT scoring below
        if cfg.results_dir and os.path.isdir(cfg.results_dir):
            import shutil
            shutil.rmtree(cfg.results_dir)
            log.print(f"cleared previous results at {cfg.results_dir}")
        if cfg.scan_frames > 0:
            run_eval_epoch_scan(cfg, model, ts, stream, log,
                                results_dir=cfg.results_dir)
        else:
            run_epoch(cfg, model, ts, step_fns, stream, "eval", 10 ** 6,
                      log, results_dir=cfg.results_dir)
        # offline MOT scoring over the exported results — the step the
        # reference leaves to unreleased scripts (README.md:174-176)
        from .eval.run import (evaluate_results, evaluate_results_stream,
                               format_table)
        if cfg.dataset == "vod":
            m = evaluate_results(cfg.results_dir, cfg.dataset_path,
                                 split="val",
                                 min_obj_points=cfg.min_obj_points)
        else:
            m = evaluate_results_stream(_build_stream(cfg, "val"),
                                        cfg.results_dir)
        log.print(format_table(m))
        log.print("FINISH")
        return

    batched = cfg.dp > 1 or cfg.scan_frames > 0
    scan_train = mesh = None
    if batched:
        from .train.step import make_scan_train_step
        from .parallel import make_mesh
        if cfg.dp > 1 and len(jax.devices()) >= cfg.dp:
            mesh = make_mesh(cfg.dp)
            log.print(f"mesh: dp={cfg.dp} over {mesh.devices}")
        elif cfg.dp > 1:
            log.print(f"dp={cfg.dp} streams on {len(jax.devices())} "
                      "device(s): batched but unsharded")
        scan_train = make_scan_train_step(model, tx, mesh=mesh)

    best = np.inf
    history: List[Dict[str, float]] = []
    for ep in range(cfg.epochs):
        if batched:
            ts, items = run_train_epoch_batched(cfg, ts, scan_train,
                                                "train", ep, log, mesh)
        else:
            stream = _build_stream(cfg, "train")
            ts, items, _, _ = run_epoch(cfg, model, ts, step_fns, stream,
                                        "train", ep, log)
        history.append(items)
        ckpt.save_train_state(models_dir, "last", ts)
        ckpt.save_train_state(models_dir, f"last{ep}", ts)
        if items["Loss"] <= best:
            best = items["Loss"]
            ckpt.save_train_state(models_dir, "best", ts)
            log.print(f"best train loss till now: {best:.6f}")
        with open(os.path.join(exp_dir, "loss_history.csv"), "w") as f:
            keys = list(history[0])
            f.write(",".join(["epoch"] + keys) + "\n")
            for i, h in enumerate(history):
                f.write(",".join([str(i)] + [f"{h[k]:.6f}" for k in keys])
                        + "\n")
    log.print("FINISH")


if __name__ == "__main__":
    main()
