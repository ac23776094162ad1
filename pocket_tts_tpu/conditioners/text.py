"""Conditioner API compatible with the reference package layout.

(reference: pocket_tts_mlx/conditioners/base.py:12-39, text.py:15-45).
The heavy lifting lives in models/text.py (tokenizers) and the FlowLM
embedding table; these classes provide the same prepare/__call__ protocol for
users who consumed the reference's conditioner objects directly.
"""

from __future__ import annotations

from typing import Generic, TypeVar

import jax.numpy as jnp
import numpy as np

from pocket_tts_tpu.models.text import SentencePieceTokenizer, TokenizedText, make_tokenizer
from pocket_tts_tpu.ops.linear import embedding

Input = TypeVar("Input")

__all__ = ["BaseConditioner", "TokenizedText", "LUTConditioner", "SentencePieceTokenizer"]


class BaseConditioner(Generic[Input]):
    """Maps inputs to conditioning embeddings of width `dim`."""

    def __init__(self, dim: int, output_dim: int):
        self.dim = dim
        self.output_dim = output_dim

    def prepare(self, x: Input) -> Input:
        return x

    def _get_condition(self, inputs: Input) -> jnp.ndarray:
        raise NotImplementedError

    def __call__(self, inputs: Input) -> jnp.ndarray:
        out = self._get_condition(inputs)
        assert out.shape[-1] == self.dim
        return out


class LUTConditioner(BaseConditioner):
    """Lookup-table text conditioner: tokens -> embedding rows.

    `embed_weight` is the [n_bins+1, dim] table (e.g.
    params['flow_lm']['conditioner']['embed']['weight']).
    """

    def __init__(self, n_bins: int, tokenizer_path: str, dim: int, output_dim: int,
                 embed_weight: jnp.ndarray | None = None, tokenizer=None):
        super().__init__(dim=dim, output_dim=output_dim)
        self.tokenizer = tokenizer if tokenizer is not None else make_tokenizer(
            n_bins, tokenizer_path
        )
        self.embed_weight = embed_weight

    def prepare(self, x: str) -> TokenizedText:
        return self.tokenizer(x)

    def _get_condition(self, inputs: TokenizedText) -> jnp.ndarray:
        assert self.embed_weight is not None, "bind embed_weight before use"
        tokens = jnp.asarray(np.asarray(inputs.tokens), dtype=jnp.int32)
        return embedding(tokens, self.embed_weight)
