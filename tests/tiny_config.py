"""A miniature model config for fast CPU tests (same structure as b6369a24,
scaled down ~100x)."""

from pocket_tts_tpu.config.schema import Config

TINY = {
    "flow_lm": {
        "dtype": "float32",
        "flow": {"depth": 2, "dim": 32},
        "transformer": {
            "d_model": 64,
            "hidden_scale": 2,
            "max_period": 10000,
            "num_heads": 4,
            "num_layers": 2,
        },
        "lookup_table": {
            "dim": 64,
            "n_bins": 4000,
            "tokenizer": "sentencepiece",
            "tokenizer_path": "unavailable://",
        },
    },
    "mimi": {
        "dtype": "float32",
        "sample_rate": 24000,
        "channels": 1,
        "frame_rate": 12.5,
        "seanet": {
            "dimension": 48,
            "channels": 1,
            "n_filters": 4,
            "n_residual_layers": 1,
            "ratios": [6, 5, 4],
            "kernel_size": 7,
            "residual_kernel_size": 3,
            "last_kernel_size": 3,
            "dilation_base": 2,
            "pad_mode": "constant",
            "compress": 2,
        },
        "transformer": {
            "d_model": 48,
            "num_heads": 4,
            "num_layers": 1,
            "layer_scale": 0.01,
            "context": 32,
            "dim_feedforward": 96,
            "input_dimension": 48,
            "output_dimensions": [48],
        },
        "quantizer": {"dimension": 8, "output_dimension": 48},
    },
}


def tiny_config() -> Config:
    return Config(**TINY)
