"""Jitted train / eval step functions.

The reference's per-frame loop body (`src/main_utils.py:44-258`: forward →
loss → backward → Adam step, with recurrent state detached between frames)
becomes a pure function over (TrainState, TrackState, FrameBatch). Batch
axis = independent clip streams, vmapped; under a `jax.sharding.Mesh` the
batch is sharded over the 'dp' axis and XLA inserts the gradient psum that
`nn.DataParallel` implied in the reference (models/model.py:38-40).

BatchNorm note: the reference runs batch_size=1, so BN statistics are
per-frame. vmapping the apply reproduces exactly that (per-clip stats);
the running stats stored in TrainState are the across-clip mean of the
per-clip updates.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..tracker.state import TrackState
from .losses import track4d_loss


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def train_compiler_options():
    """XLA options for programs containing the fused train SA kernels.

    ops/pallas_sa_train.py holds a whole scale's grouped activations in
    VMEM (~19 MB at the sa3 scale); XLA's default scoped-vmem budget for
    the surrounding fusion is 16 MB, so train programs raise it. TPU
    only — other backends reject unknown options."""
    if jax.default_backend() == "tpu":
        return {"xla_tpu_scoped_vmem_limit_kib": 65536}
    return None


def make_optimizer(cfg, steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam(lr, weight_decay=1e-10) + StepLR(decay_epochs, 0.97).

    Reference: main.py:61-62. torch Adam's weight_decay adds wd·p to the
    gradient before the moment updates → optax.add_decayed_weights placed
    before adam.
    """
    schedule = optax.exponential_decay(
        init_value=cfg.lr,
        transition_steps=max(1, steps_per_epoch * cfg.decay_epochs),
        decay_rate=cfg.decay_rate,
        staircase=True)
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.adam(schedule))


def create_train_state(model, cfg, example_frame, example_track_state,
                       steps_per_epoch: int, seed: int = 0) -> TrainState:
    # jitted init: one compiled program instead of eager per-op dispatch
    # (the latter is very slow against a remote TPU backend). Inputs are
    # device arrays, not closed-over host constants — NumPy leaves inside
    # the trace break ops that index with traced scalars (exact FPS).
    example_frame = jax.tree_util.tree_map(jnp.asarray, example_frame)
    example_track_state = jax.tree_util.tree_map(jnp.asarray,
                                                 example_track_state)
    variables = jax.jit(
        lambda key: model.init(key, example_frame, example_track_state,
                               train=False))(jax.random.PRNGKey(seed))
    tx = make_optimizer(cfg, steps_per_epoch)
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32))


def _make_loss_fn(model):
    """Mean-over-clip-streams loss: vmap over the leading batch axis B."""

    def loss_fn(params, batch_stats, track_states, frames, pretrain):
        def one(frame, tstate):
            (out, new_t), mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                frame, tstate, train=True, mutable=["batch_stats"])
            loss, items = track4d_loss(out, frame, pretrain)
            return loss, (new_t, items, mut["batch_stats"])

        losses, (new_ts, items, muts) = jax.vmap(one)(frames, track_states)
        loss = jnp.mean(losses)
        new_stats = jax.tree_util.tree_map(
            lambda x: jnp.mean(x, axis=0), muts)
        return loss, (new_ts, items, new_stats)

    return loss_fn


def _sgd_frame(tx, loss_fn, ts: TrainState, track_states: TrackState,
               frames, pretrain, axis_name: str | None = None):
    """One frame across all streams: grad → optimizer → new state.

    With `axis_name` (inside shard_map over the dp mesh axis) the local
    per-shard mean-gradient and BN-stat updates are pmean'd explicitly:
    equal shard sizes make pmean-of-local-means equal the global mean,
    so the update matches the single-placement step to reduction-order
    ulps. Explicit collectives (vs GSPMD-inferred) pin the program's
    collective inventory — see make_scan_train_step.
    """
    grads, (new_track, items, new_stats) = jax.grad(
        loss_fn, has_aux=True)(ts.params, ts.batch_stats,
                               track_states, frames, pretrain)
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
        new_stats = jax.lax.pmean(new_stats, axis_name)
    updates, new_opt = tx.update(grads, ts.opt_state, ts.params)
    new_params = optax.apply_updates(ts.params, updates)
    new_ts = TrainState(new_params, new_stats, new_opt, ts.step + 1)
    return new_ts, new_track, items


def make_train_step(model, tx):
    """Returns train_step(ts, track_states, frames, pretrain) →
    (ts', track_states', items).

    frames / track_states carry a leading clip-batch axis B.
    """
    loss_fn = _make_loss_fn(model)

    @functools.partial(jax.jit, compiler_options=train_compiler_options())
    def train_step(ts: TrainState, track_states: TrackState,
                   frames, pretrain) -> Tuple[TrainState, TrackState,
                                              Dict[str, jnp.ndarray]]:
        return _sgd_frame(tx, loss_fn, ts, track_states, frames, pretrain)

    return train_step


def make_scan_train_step(model, tx, mesh=None):
    """T per-frame optimizer steps fused into ONE dispatch.

    The reference steps the optimizer once per frame with recurrent state
    detached between frames (src/main_utils.py:158-163,248-251). Those exact
    semantics survive fusion: the TrainState (params + Adam moments) is the
    lax.scan carry, so the compiled program performs T sequential
    grad→update→apply rounds — numerically identical to T `train_step`
    calls — while paying host/dispatch latency once per block instead of
    once per frame.

    With `mesh` the whole scan runs inside shard_map over the 'dp' axis:
    every per-stream op is device-local BY CONSTRUCTION and the only
    collectives are the explicit per-frame pmeans in `_sgd_frame`
    (gradients + BN stats). Leaving the layout to GSPMD instead was
    measured to replicate the (B, N, N) neighbor-selection matrices —
    32 all-gathers of f32[8,512,512] PER FRAME at the flagship shape
    (sort-lowered top_k makes the partitioner gather its operand) —
    ~256 MB/frame of inter-chip traffic that shard_map makes impossible.
    The dryrun asserts this inventory on the compiled HLO
    (__graft_entry__.py).

    Args to the returned fn: (ts, track_states[B], frames[B, T, ...],
    pretrain) → (ts', track_states', items[T, B]). With mesh, B must be
    sharded over 'dp' (parallel.shard_clips) and params replicated.
    """
    loss_fn = _make_loss_fn(model)

    def scan_train(ts: TrainState, track_states: TrackState,
                   frames_bt, pretrain, axis_name=None):
        frames_tb = jax.tree_util.tree_map(
            lambda x: jnp.swapaxes(x, 0, 1), frames_bt)

        def body(carry, frames):
            ts, tstates = carry
            new_ts, new_track, items = _sgd_frame(
                tx, loss_fn, ts, tstates, frames, pretrain,
                axis_name=axis_name)
            return (new_ts, new_track), items

        (ts, track_states), items = jax.lax.scan(
            body, (ts, track_states), frames_tb)
        return ts, track_states, items

    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        # check_vma off: model-internal fori_loop carries start from
        # unvarying constants, which the varying-axis tracker rejects;
        # replication of the P() outputs is real (pmean'd grads →
        # identical updates) and is asserted by the dryrun's numerics.
        scan_train = jax.shard_map(
            functools.partial(scan_train, axis_name="dp"),
            mesh=mesh,
            in_specs=(P(), P("dp"), P("dp"), P()),
            out_specs=(P(), P("dp"), P(None, "dp")),
            check_vma=False)

    return functools.partial(
        jax.jit, compiler_options=train_compiler_options())(scan_train)


def make_eval_step(model):
    """Returns eval_step(variables, track_states, frames) →
    (outputs, track_states'), batched over clips."""

    @jax.jit
    def eval_step(variables, track_states: TrackState, frames):
        def one(frame, tstate):
            return model.apply(variables, frame, tstate, train=False)
        return jax.vmap(one)(frames, track_states)

    return eval_step


def make_pipelined_eval_step(model):
    """Phase-parallel eval: batch everything that isn't temporally serial.

    The per-frame step's only true serial dependencies are the 5-layer GRU
    carry and track-ID inheritance — a few thousand FLOPs each. Everything
    else (PointNet++ heads, cost volume, flow MLP, DBSCAN, descriptors,
    affinity MLP, Sinkhorn matching) depends only on the frame pair, so
    this step runs them batched over the full [B, T] block and keeps two
    tiny lax.scans for the carries:

      A. frame_stage over B×T            (heavy: 3 PNHeads + cost volume)
      B. scan: GRU carry over T          (tiny)
      C. output_stage + affinity + Sinkhorn match over B×T
      D. scan: track-ID inheritance over T  (tiny)

    In eval mode (BatchNorm running stats) each stage is a pure function,
    so results match the sequential `make_scan_eval_step` exactly (bit-
    exact on CPU in tests). Sequence resets (new_seq) reproduce the
    sequential semantics: the GRU carry zeroes, and the affinity's
    previous-frame descriptors swap to the empty init state.

    Measured on one v5e chip at the 512-pt workload this is SLOWER than
    the sequential scan (224 vs 347 fps at B=8, 281 vs 310 at B=1): inside
    lax.scan there is no per-frame dispatch cost to amortize, and B×T
    batching blows the working set (e.g. DBSCAN's (B·T, N, N) adjacency)
    out of VMEM into HBM round-trips. Kept as the structural
    decomposition of the temporal dependency (useful for future sparse /
    multi-chip layouts) with the sequential scan remaining the production
    path.

    Returns step(variables, track_states[B], frames[B, T]) →
    (track_states', outputs dict with [B, T]-leading arrays).
    """
    from ..models.track4d import Track4D
    from ..tracker.association import match_structure, assign_ids

    def _apply(variables, method, *args, **kw):
        return model.apply(variables, *args, method=method, **kw)

    @jax.jit
    def step(variables, tstate: TrackState, frames_bt):
        ns_bt = frames_bt.new_seq                              # (B, T)
        b, t = ns_bt.shape
        ns_tb = jnp.swapaxes(ns_bt, 0, 1)

        # frame_idx per (B, T): resets to 0 at new_seq, else increments
        def fi_body(carry, ns):
            fi = jnp.where(ns, 0, carry)
            return fi + 1, fi
        fi_final, fi_tb = jax.lax.scan(
            fi_body, jnp.broadcast_to(tstate.frame_idx, (b,)), ns_tb)
        fi_bt = jnp.swapaxes(fi_tb, 0, 1)

        # --- A: per-frame features, batched over B and T ---
        def fs(frame):
            return _apply(variables, Track4D.frame_stage, frame,
                          train=False)
        cls, prop, gin = jax.vmap(jax.vmap(fs))(frames_bt)

        # --- B: GRU scan over T (carry: h [B, L, H]) ---
        def gru_body(h, x):
            gin_t, ns_t = x
            h = jnp.where(ns_t[:, None, None], 0.0, h)
            gout, h_new = jax.vmap(
                lambda g, hh: model.apply(variables, g, hh,
                                          method=Track4D.gru_stage))(
                gin_t, h)
            return h_new, gout
        h_final, gout_tb = jax.lax.scan(
            gru_body, tstate.h, (jnp.swapaxes(gin, 0, 1), ns_tb))
        gout = jnp.swapaxes(gout_tb, 0, 1)                     # (B, T, H)

        # --- C: per-frame outputs + matching, batched over B and T ---
        def os_(frame, c, p, g, fi):
            return model.apply(variables, frame, c, p, g, fi,
                               train=False, method=Track4D.output_stage)
        outs = jax.vmap(jax.vmap(os_))(frames_bt, cls, prop, gout, fi_bt)

        desc, valid = outs["desc"], outs["curr_valid"]
        k = desc.shape[2]
        # previous-frame descriptors: block-entry state at t=0, shifted
        # desc after; zeroed at sequence starts
        prev_desc = jnp.concatenate(
            [tstate.desc[:, None], desc[:, :-1]], axis=1)
        prev_valid = jnp.concatenate(
            [tstate.valid[:, None], valid[:, :-1]], axis=1)
        prev_gt = jnp.concatenate(
            [tstate.gt_id[:, None], outs["curr_gt"][:, :-1]], axis=1)
        prev_desc = jnp.where(ns_bt[..., None, None], 0.0, prev_desc)
        prev_valid = jnp.where(ns_bt[..., None], False, prev_valid)
        prev_gt = jnp.where(ns_bt[..., None], -1, prev_gt)

        aff = jax.vmap(jax.vmap(
            lambda dp, dc: _apply(variables, Track4D.affinity_stage,
                                  dp, dc)))(prev_desc, desc)
        m = jnp.sum(prev_valid.astype(jnp.int32), axis=-1)     # (B, T)
        n = outs["n"]
        ms = jax.vmap(jax.vmap(
            lambda a, mm, nn: match_structure(
                a, mm, nn, jnp.float32(model.sinkhorn_alpha),
                model.sinkhorn_iters, model.sinkhorn_tol)))(aff, m, n)

        # --- D: ID-inheritance scan over T ---
        def id_body(carry, x):
            tid_prev, next_id = carry
            ms_t, aff_t, ns_t = x
            tid_prev = jnp.where(ns_t[:, None], -1, tid_prev)
            res = jax.vmap(
                lambda s, pt, ni, a: assign_ids(
                    s, pt, ni, a, model.match_conf_thres))(
                ms_t, tid_prev, next_id, aff_t)
            return (res.track_id, res.next_id), (res.track_id, res.conf)
        ms_tb = jax.tree_util.tree_map(
            lambda x: jnp.swapaxes(x, 0, 1), ms)
        aff_tb = jnp.swapaxes(aff, 0, 1)
        (tid_last, next_id_final), (tid_tb, conf_tb) = jax.lax.scan(
            id_body, (tstate.track_id,
                      jnp.broadcast_to(tstate.next_id, (b,))),
            (ms_tb, aff_tb, ns_tb))
        track_id = jnp.swapaxes(tid_tb, 0, 1)                  # (B, T, K)
        conf = jnp.swapaxes(conf_tb, 0, 1)

        new_state = TrackState(
            h=h_final,
            desc=desc[:, -1],
            valid=valid[:, -1],
            track_id=tid_last,
            gt_id=outs["curr_gt"][:, -1],
            next_id=next_id_final,
            frame_idx=fi_final,
        )
        del k
        # NOTE: feats (B,T,N,139) is deliberately NOT returned — at the
        # bench workload it alone is 0.5 GB of HBM writes and erases the
        # pipelining win; it stays fused inside phase C.
        outputs = dict(
            flow=outs["flow"], warp=outs["warp"], cls=cls,
            labels=outs["labels"],
            track_id=track_id, conf=conf, aff=aff, m=m, n=n,
            sizes=outs["sizes"], prev_gt_id=prev_gt,
            prev_valid=prev_valid, curr_gt_id=outs["curr_gt"],
            curr_valid=valid,
        )
        return new_state, outputs

    return step


def _shard_eval(mesh, scan_eval):
    """Wrap an eval scan in shard_map over 'dp': streams are independent,
    so the sharded program contains ZERO collectives by construction
    (GSPMD instead replicated the (B, N, N) neighbor matrices through
    sort-lowered top_k — see make_scan_train_step). Asserted on the
    compiled HLO by the dryrun."""
    from jax.sharding import PartitionSpec as P
    return jax.jit(jax.shard_map(
        scan_eval, mesh=mesh,
        in_specs=(P(), P("dp"), P("dp")),
        out_specs=(P("dp"), P("dp")), check_vma=False))


def make_scan_eval_step(model, mesh=None):
    """lax.scan the eval step over a [T, ...] stack of frames per clip.

    Serial frame dependency (GRU h + prev objects) means within-clip work
    cannot parallelize — but scanning T frames per dispatch amortizes all
    host-device latency, and clips batch via vmap on top. This is the
    throughput path used by bench.py. With `mesh`, clip streams shard
    over 'dp' via shard_map (no collectives — streams are independent).
    """

    def scan_eval(variables, track_state: TrackState, frames_t):
        def one_clip(tstate, frames):
            def body(carry, frame):
                out, new_t = model.apply(variables, frame, carry,
                                         train=False)
                keep = {k: out[k] for k in
                        ("cls", "warp", "labels", "track_id", "conf", "n")}
                return new_t, keep
            return jax.lax.scan(body, tstate, frames)
        return jax.vmap(one_clip)(track_state, frames_t)

    if mesh is not None:
        return _shard_eval(mesh, scan_eval)
    return jax.jit(scan_eval)


def chain_contiguous(frame_numbers, new_seq) -> bool:
    """Host-side gate for the cached-backbone scan path.

    True iff, within the block, each frame's pc2 is the previous frame's
    pc1: frame numbers strictly consecutive (a skipped frame breaks the
    pair chain without raising new_seq — data/pipeline.py logs-and-
    continues) and no mid-block sequence reset (blocks flushed per clip
    never have one; this guards other callers). new_seq at index 0 is
    fine — the block-entry pc2 head is always computed fresh.
    """
    import numpy as np
    fno = np.asarray(frame_numbers)
    ns = np.asarray(new_seq)
    return bool(np.all(np.diff(fno) == 1) and not np.any(ns[1:]))


def make_scan_eval_step_cached(model, mesh=None):
    """Scan eval that carries the pc2 backbone features across frames.

    Frame t's pc2 IS frame t-1's pc1 in a contiguous stream, and in eval
    mode (frozen BN) the PNHead is a pure function of the cloud — so the
    per-frame step recomputing PNHead(pc2) (reference track4d.py:102-106)
    does redundant work: ~1/3 of the SA kernels and half the FP chain.
    This step computes the pc2 head ONCE at block entry and scans with
    the previous frame's f1 as the next frame's f2 — bit-identical to
    `make_scan_eval_step` whenever `chain_contiguous` holds (tested).

    Tail repeat-padding is safe: padded frames' cached f2 is wrong, but
    their outputs are discarded by the driver and the polluted track
    state is reset by the next clip's new_seq — exactly the existing
    contract of run_eval_epoch_scan.
    """
    from ..models.track4d import Track4D

    def scan_eval(variables, track_state: TrackState, frames_t):
        def one_clip(tstate, frames):
            frame0 = jax.tree_util.tree_map(lambda x: x[0], frames)
            f2_0 = model.apply(variables, frame0.pc2, frame0.ft2,
                               frame0.mask2, False,
                               method=Track4D.head_stage)

            def body(carry, frame):
                tstate, f2 = carry
                out, new_t, f1 = model.apply(
                    variables, frame, tstate, f2, train=False,
                    method=Track4D.step_cached)
                keep = {k: out[k] for k in
                        ("cls", "warp", "labels", "track_id", "conf", "n")}
                return (new_t, f1), keep

            (new_t, _), outs = jax.lax.scan(body, (tstate, f2_0), frames)
            return new_t, outs
        return jax.vmap(one_clip)(track_state, frames_t)

    if mesh is not None:
        return _shard_eval(mesh, scan_eval)
    return jax.jit(scan_eval)
