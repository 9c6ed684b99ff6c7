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
    # (the latter is very slow against a remote TPU backend).
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
               frames, pretrain):
    """One frame across all streams: grad → optimizer → new state."""
    grads, (new_track, items, new_stats) = jax.grad(
        loss_fn, has_aux=True)(ts.params, ts.batch_stats,
                               track_states, frames, pretrain)
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

    @jax.jit
    def train_step(ts: TrainState, track_states: TrackState,
                   frames, pretrain) -> Tuple[TrainState, TrackState,
                                              Dict[str, jnp.ndarray]]:
        return _sgd_frame(tx, loss_fn, ts, track_states, frames, pretrain)

    return train_step


def make_scan_train_step(model, tx):
    """T per-frame optimizer steps fused into ONE dispatch.

    The reference steps the optimizer once per frame with recurrent state
    detached between frames (src/main_utils.py:158-163,248-251). Those exact
    semantics survive fusion: the TrainState (params + Adam moments) is the
    lax.scan carry, so the compiled program performs T sequential
    grad→update→apply rounds — numerically identical to T `train_step`
    calls — while paying host/dispatch latency once per block instead of
    once per frame. Under a 'dp' mesh the mean-over-streams gradient makes
    XLA insert one psum per frame over ICI.

    Args to the returned fn: (ts, track_states[B], frames[B, T, ...],
    pretrain) → (ts', track_states', items[T, B]).
    """
    loss_fn = _make_loss_fn(model)

    @jax.jit
    def scan_train(ts: TrainState, track_states: TrackState, frames_bt,
                   pretrain):
        frames_tb = jax.tree_util.tree_map(
            lambda x: jnp.swapaxes(x, 0, 1), frames_bt)

        def body(carry, frames):
            ts, tstates = carry
            new_ts, new_track, items = _sgd_frame(
                tx, loss_fn, ts, tstates, frames, pretrain)
            return (new_ts, new_track), items

        (ts, track_states), items = jax.lax.scan(
            body, (ts, track_states), frames_tb)
        return ts, track_states, items

    return scan_train


def make_eval_step(model):
    """Returns eval_step(variables, track_states, frames) →
    (outputs, track_states'), batched over clips."""

    @jax.jit
    def eval_step(variables, track_states: TrackState, frames):
        def one(frame, tstate):
            return model.apply(variables, frame, tstate, train=False)
        return jax.vmap(one)(frames, track_states)

    return eval_step


def make_scan_eval_step(model):
    """lax.scan the eval step over a [T, ...] stack of frames per clip.

    Serial frame dependency (GRU h + prev objects) means within-clip work
    cannot parallelize — but scanning T frames per dispatch amortizes all
    host-device latency, and clips batch via vmap on top. This is the
    throughput path used by bench.py.
    """

    @jax.jit
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

    return scan_eval
