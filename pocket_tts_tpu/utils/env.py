"""One boolean-environment-variable parser for every runtime knob.

The knobs (POCKET_TTS_FUSED_BACKBONE, POCKET_TTS_NO_COMPILE_CACHE,
POCKET_TTS_OFFLINE, ...) previously parsed their values independently with
slightly different falsy sets, so "no"/"off" meant different things to
different flags. `env_flag` fixes one truthiness convention everywhere:
unset -> `default`; "0"/""/"false"/"off"/"no" (case/space-insensitive)
-> False; anything else -> True.
"""

from __future__ import annotations

import os

_FALSY = ("0", "", "false", "off", "no")


def env_flag(name: str, default: bool) -> bool:
    """Read a boolean env knob with the shared truthiness convention."""
    raw = os.environ.get(name)
    if raw is None:
        return default
    return raw.strip().lower() not in _FALSY
