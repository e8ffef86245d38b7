"""Token embedding table + sinusoidal positional features.

Replaces the reference's AllenNLP embedder stack (models/all.py:47-100,
modules/neuralIR_encoder.py): an ``nn.Embed`` whose PAD row is multiplied out
by the mask, optional pre-trained (GloVe) init via a numpy matrix, and the
sinusoidal position encoding used by TK/TKL (published/ecai20_tk.py:145-194).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class TokenEmbedder(nn.Module):
    """Embedding lookup with masked (zeroed) padding positions."""

    vocab_size: int
    dim: int
    pretrained: Optional[np.ndarray] = None  # (vocab_size, dim) init matrix
    trainable: bool = True

    @nn.compact
    def __call__(self, ids: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        if self.pretrained is not None:
            init = lambda *_: jnp.asarray(self.pretrained)
        else:
            init = nn.initializers.normal(stddev=0.1)
        emb = nn.Embed(self.vocab_size, self.dim, embedding_init=init, name="token_embedding")(ids)
        if not self.trainable:
            emb = jax.lax.stop_gradient(emb)
        return emb * mask[..., None]


def sinusoidal_positions(length: int, dim: int, offset: int = 0) -> np.ndarray:
    """Standard transformer sinusoid table, shape (length, dim).

    ``offset`` shifts the position index — TK's `use_diff_posencoding` gives
    documents positions [offset, offset+length) so query and document
    contextualization don't share position identities (ecai20_tk.py:50-55)."""
    positions = np.arange(offset, offset + length, dtype=np.float32)[:, None]
    half = np.arange(0, dim, 2, dtype=np.float32)
    div = np.exp(half * -(math.log(10000.0) / dim))
    table = np.zeros((length, dim), dtype=np.float32)
    table[:, 0::2] = np.sin(positions * div)
    table[:, 1::2] = np.cos(positions * div[: dim // 2])
    return table
