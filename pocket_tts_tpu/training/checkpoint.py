"""Training checkpoint/resume via orbax.

The reference is inference-only (its 'checkpointing' is weight loading;
SURVEY §5); since this stack adds a fine-tuning loop, it also gets real
train-state persistence: params + optimizer state + step, atomically saved
and restorable across processes/meshes.
"""

from __future__ import annotations

import logging
from pathlib import Path

import jax

from pocket_tts_tpu.training.flow_matching import TrainState

logger = logging.getLogger(__name__)


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(state: TrainState, path: str | Path) -> None:
    """Atomically save a TrainState to `path` (a directory)."""
    path = Path(path).absolute()
    _checkpointer().save(path, state, force=True)
    logger.info("Saved train state (step %d) to %s", int(state.step), path)


def restore_train_state(path: str | Path, template: TrainState) -> TrainState:
    """Restore a TrainState saved by save_train_state.

    `template` provides the tree structure/shapes/dtypes (build it with
    init_train_state on freshly initialized params).
    """
    path = Path(path).absolute()
    restored = _checkpointer().restore(path, item=template)
    logger.info("Restored train state (step %d) from %s", int(restored.step), path)
    return restored
