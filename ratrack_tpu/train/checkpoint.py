"""Checkpoint save/restore via orbax.

Reference behaviour (src/main.py:83-98, models/model.py:23-37): per-epoch
`model.last`, `model.last<ep>`, and best-loss `model.best` saves of the
model state only — resume restarts the LR schedule. Here the FULL
TrainState (params, batch_stats, optimizer state, step) is saved, closing
that resume gap, with the same last/last<ep>/best naming.
"""

from __future__ import annotations

import os

import orbax.checkpoint as ocp

from .step import TrainState


def _ckptr():
    return ocp.StandardCheckpointer()


def save_train_state(root: str, name: str, ts: TrainState) -> str:
    path = os.path.abspath(os.path.join(root, name))
    ckptr = _ckptr()
    ckptr.save(path, ts, force=True)
    ckptr.wait_until_finished()
    return path


def restore_train_state(root: str, name: str,
                        template: TrainState) -> TrainState:
    path = os.path.abspath(os.path.join(root, name))
    ckptr = _ckptr()
    restored = ckptr.restore(path, template)
    return restored


def latest_exists(root: str, name: str = "last") -> bool:
    return os.path.isdir(os.path.join(root, name))
