"""Default runtime parameters for TTS generation.

Values mirror the reference defaults (pocket_tts_mlx/default_parameters.py:1-10)
so users switching backends get identical behavior.
"""

DEFAULT_AUDIO_PROMPT = "alba"
DEFAULT_VARIANT = "b6369a24"
DEFAULT_TEMPERATURE = 0.7
DEFAULT_LSD_DECODE_STEPS = 1
DEFAULT_NOISE_CLAMP = None
DEFAULT_EOS_THRESHOLD = -4.0
DEFAULT_FRAMES_AFTER_EOS = None
MAX_TOKEN_PER_CHUNK = 50

# TPU-specific runtime defaults (new capability, not in the reference).
# The decode loop runs as jitted lax.scan segments; the host only syncs once
# per segment to check EOS, instead of once per frame
# (reference syncs every frame: pocket_tts_mlx/models/tts_model.py:408).
DEFAULT_SEGMENT_FRAMES = 8
# KV-cache capacities are bucketed to multiples of this to bound the number of
# distinct jit compilations (static shapes; reference grows the cache
# dynamically instead: pocket_tts_mlx/models/tts_model.py:278-295).
KV_CAPACITY_BUCKET = 128
