from pocket_tts_tpu.training.flow_matching import (
    TrainState,
    flow_matching_loss,
    make_train_step,
)

__all__ = ["TrainState", "flow_matching_loss", "make_train_step"]
