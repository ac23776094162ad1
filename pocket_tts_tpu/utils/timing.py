"""Lightweight timing / sizing instrumentation.

User-visible behavior mirrors the reference's timing logs
(reference: pocket_tts_mlx/utils/utils.py:15-46); on TPU, callers should
block_until_ready() before exiting the context for honest numbers.
"""

from __future__ import annotations

import logging
import time

import jax

logger = logging.getLogger(__name__)


class display_execution_time:
    """Context manager that logs '<task> took N ms' on exit."""

    def __init__(self, task_name: str, print_output: bool = True):
        self.task_name = task_name
        self.print_output = print_output
        self.start_time: float | None = None
        self.elapsed_time_ms: int | None = None

    def __enter__(self) -> "display_execution_time":
        self.start_time = time.monotonic()
        return self

    def __exit__(self, exc_type, exc_val, exc_tb) -> bool:
        self.elapsed_time_ms = int((time.monotonic() - self.start_time) * 1000)
        if self.print_output:
            logger.info("%s took %d ms", self.task_name, self.elapsed_time_ms)
        return False


def size_of_dict(state_dict: dict) -> int:
    """Reference-compatible alias (pocket_tts_mlx/utils/utils.py:15-25)."""
    return size_of_pytree(state_dict)


def size_of_pytree(tree) -> int:
    """Total byte size of all arrays in a pytree (params or streaming state)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "nbytes"):
            total += int(leaf.nbytes)
        elif hasattr(leaf, "size") and hasattr(leaf, "dtype"):
            total += int(leaf.size) * leaf.dtype.itemsize
    return total
