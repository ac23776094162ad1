"""Asset resolution: local paths, http(s) URLs and hf:// URIs with caching.

URI scheme matches the reference so configs are interchangeable
(reference: pocket_tts_mlx/utils/utils.py:56-84):
  - plain path                -> returned as-is
  - http(s)://...            -> downloaded once into ~/.cache/pocket_tts
  - hf://repo/file@revision  -> resolved through huggingface_hub

Network libraries are imported lazily so fully-offline deployments (local
checkpoints only) need neither `requests` nor `huggingface_hub`.
"""

from __future__ import annotations

import hashlib
import logging
import os
from pathlib import Path

logger = logging.getLogger(__name__)


def _offline() -> bool:
    """Fail fast instead of burning retry timeouts on air-gapped machines."""
    from pocket_tts_tpu.utils.env import env_flag

    return env_flag("POCKET_TTS_OFFLINE", False)


def make_cache_directory() -> Path:
    """Create and return the on-disk cache for downloaded assets."""
    cache_dir = Path.home() / ".cache" / "pocket_tts"
    cache_dir.mkdir(parents=True, exist_ok=True)
    return cache_dir


def download_if_necessary(file_path: str) -> Path:
    """Resolve an asset URI to a local file, downloading into cache if needed."""
    if file_path.startswith(("http://", "https://")):
        if _offline():
            raise ConnectionError(f"POCKET_TTS_OFFLINE is set; cannot fetch {file_path}")
        import requests

        cache_dir = make_cache_directory()
        suffix = file_path.rsplit(".", 1)[-1]
        cached = cache_dir / (hashlib.sha256(file_path.encode()).hexdigest() + "." + suffix)
        if not cached.exists():
            logger.info("Downloading %s", file_path)
            response = requests.get(file_path)
            response.raise_for_status()
            tmp = cached.with_suffix(cached.suffix + ".tmp")
            tmp.write_bytes(response.content)
            tmp.rename(cached)
        return cached

    if file_path.startswith("hf://"):
        if _offline():
            raise ConnectionError(f"POCKET_TTS_OFFLINE is set; cannot fetch {file_path}")
        from huggingface_hub import hf_hub_download

        spec = file_path.removeprefix("hf://")
        parts = spec.split("/")
        repo_id = "/".join(parts[:2])
        filename = "/".join(parts[2:])
        revision = None
        if "@" in filename:
            filename, revision = filename.rsplit("@", 1)
        local = hf_hub_download(repo_id=repo_id, filename=filename, revision=revision)
        return Path(local)

    local = Path(file_path)
    if not local.exists():
        # Fail here (not deep inside the safetensors parser) so callers with
        # fallback chains — voice-cloning weights -> without-voice-cloning ->
        # random init (tts_model._load_weights) — can catch a clean error.
        raise FileNotFoundError(f"asset not found: {file_path}")
    return local
