"""Produce the golden JSON for the checkpoint-parity gate.

Run on a machine that HAS the real checkpoint:

    POCKET_TTS_CHECKPOINT=/path/to/tts_b6369a24.safetensors \
        python scripts/make_golden.py -o golden_b6369a24.json

The recorded values (first latent + first 64 waveform samples at temp=0 from
a seeded synthetic prompt) are deterministic: temp=0 zeroes the sampling
noise, so the same checkpoint must reproduce them on any backend and any
correct implementation — including the upstream torch one (see
docs/PARITY.md for the torch recipe). tests/test_checkpoint_parity.py
consumes the file via POCKET_TTS_GOLDEN.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output", default="golden.json")
    args = ap.parse_args()

    ckpt = os.environ.get("POCKET_TTS_CHECKPOINT", "")
    if not ckpt or not Path(ckpt).exists():
        raise SystemExit("set POCKET_TTS_CHECKPOINT=/path/to/checkpoint.safetensors")

    from pocket_tts_tpu.config.schema import builtin_config_path, load_config
    from pocket_tts_tpu.models.flow_lm import FlowLMModel
    from pocket_tts_tpu.models.generate import decode_mimi_frame
    from pocket_tts_tpu.models.mimi import MimiModel
    from pocket_tts_tpu.models.weights import load_state_dict
    from pocket_tts_tpu.utils.safetensors import load_safetensors

    cfg = load_config(builtin_config_path("b6369a24"))
    flow_lm = FlowLMModel(
        config=cfg.flow_lm,
        latent_dim=cfg.mimi.quantizer.dimension,
        speaker_dim=cfg.mimi.seanet.dimension,
    )
    mimi = MimiModel(config=cfg.mimi)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "flow_lm": flow_lm.init_params(k1, jnp.float32),
        "mimi": mimi.init_params(k2, jnp.float32),
    }
    load_state_dict(params, load_safetensors(Path(ckpt)), jnp.float32)

    # EXACTLY the computation in tests/test_checkpoint_parity.py.
    state = flow_lm.init_state(1, 256)
    prompt = (
        jax.random.normal(jax.random.PRNGKey(7), (1, 16, flow_lm.dim), jnp.float32) * 0.02
    )
    state = jax.jit(flow_lm.prefill)(
        params["flow_lm"], state, prompt, jnp.full((1,), 16, jnp.int32)
    )
    state, latent, _ = jax.jit(
        lambda p, s: flow_lm.decode_step(
            p, s,
            jnp.zeros((1, flow_lm.ldim), jnp.float32),
            jnp.ones((1,), jnp.bool_),
            jax.random.PRNGKey(0),
            jnp.float32(0.0),
            1, None, jnp.float32(-4.0),
        )
    )(params["flow_lm"], state)
    frame, _ = jax.jit(
        lambda p, l, s: decode_mimi_frame(p["flow_lm"], p["mimi"], mimi, l, s)
    )(params, latent, mimi.init_decode_state(1))

    # Tensor-checksum census: name -> (shape, dtype, sha256 of raw bytes)
    # for EVERY tensor in the checkpoint file. Pins the exact weight bytes
    # the goldens were produced from, so a later parity failure can be
    # attributed (different checkpoint build vs real numerics regression)
    # with no archaeology (VERDICT r4 item 8).
    import hashlib

    raw = load_safetensors(Path(ckpt))
    census = {
        name: {
            "shape": list(np.asarray(t).shape),
            "dtype": str(np.asarray(t).dtype),
            "sha256": hashlib.sha256(np.ascontiguousarray(t).tobytes()).hexdigest(),
        }
        for name, t in sorted(raw.items())
    }

    golden = {
        "checkpoint": Path(ckpt).name,
        "temp": 0.0,
        "prompt": "jax.random.normal(PRNGKey(7), (1, 16, 1024)) * 0.02",
        "latent0": np.asarray(latent)[0].astype(float).tolist(),
        "frame0_head": np.asarray(frame)[0][:64].astype(float).tolist(),
        "tensor_census": census,
    }
    Path(args.output).write_text(json.dumps(golden, indent=1))
    print(
        f"wrote {args.output}: latent0[{len(golden['latent0'])}], "
        f"frame0_head[{len(golden['frame0_head'])}], "
        f"census of {len(census)} tensors"
    )


if __name__ == "__main__":
    main()
