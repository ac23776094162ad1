from pocket_tts_tpu.ops.norms import layer_norm, rms_norm_ddof1
from pocket_tts_tpu.ops.rope import apply_rope

__all__ = ["layer_norm", "rms_norm_ddof1", "apply_rope"]
