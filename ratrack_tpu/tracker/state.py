"""Recurrent per-clip tracking state carried across frames.

The reference threads python dicts + a GRU hidden tensor through the epoch
loop (`src/main_utils.py:57-59,158-163`): `objects_prev` (track-id → point
tensor), `mappings_prev` (GT-id → track-id), and `h`. Here the same
information lives in fixed-size arrays so the whole step stays one XLA
program:

  * prev object point sets → their 141-d descriptors (the only thing the
    association consumes, see track4d.py:200-214) in K_max compacted slots;
  * track identity → int32 ids per slot;
  * GT mapping → the matched GT label id per slot (negative = unmatched,
    uniquified per frame like the reference's random negative keys,
    track4d_utils.py:94-96);
  * GRU hidden state (layers, hidden);
  * next_id counter (reference Track4D.max_id) and a frame counter.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

DESC_DIM = 141  # 3 pos + 3 pos-var + 128 feat + 3 flow + 2 rrv + 2 rrv-var


class TrackState(NamedTuple):
    h: jnp.ndarray           # (gru_layers, 128) float32
    desc: jnp.ndarray        # (K, DESC_DIM) float32 — prev objects
    valid: jnp.ndarray       # (K,) bool
    track_id: jnp.ndarray    # (K,) int32
    gt_id: jnp.ndarray       # (K,) int32 (negative = unmatched)
    next_id: jnp.ndarray     # () int32
    frame_idx: jnp.ndarray   # () int32


def init_state(k_max: int, gru_layers: int = 5,
               hidden: int = 128) -> TrackState:
    return TrackState(
        h=jnp.zeros((gru_layers, hidden), jnp.float32),
        desc=jnp.zeros((k_max, DESC_DIM), jnp.float32),
        valid=jnp.zeros((k_max,), bool),
        track_id=jnp.full((k_max,), -1, jnp.int32),
        gt_id=jnp.full((k_max,), -1, jnp.int32),
        next_id=jnp.zeros((), jnp.int32),
        frame_idx=jnp.zeros((), jnp.int32),
    )


def reset_where(new_seq: jnp.ndarray, state: TrackState,
                fresh: TrackState) -> TrackState:
    """Per-element select: fresh state when new_seq else carried state.

    Reference resets objects_prev/mappings_prev/h at sequence boundaries
    (main_utils.py:70-74) but NOT max_id — track ids stay globally unique
    across clips within an epoch; we preserve that by carrying next_id.
    """
    import jax
    keep_next = state.next_id  # never reset
    out = jax.tree_util.tree_map(
        lambda f, s: jnp.where(new_seq, f, s), fresh, state)
    return out._replace(next_id=keep_next,
                        frame_idx=jnp.where(new_seq, 0, state.frame_idx))
