"""Small from-scratch transformer encoder (Flax).

Used by the embedding-era contextualizers (TK/TKL/TK-Sparse, PARADE's chunk
aggregator). Post-norm layout matching torch's ``nn.TransformerEncoderLayer``
defaults as instantiated by the reference (ecai20_tk.py:57-58: dropout=0,
norm=None → no final LayerNorm): self-attention → residual+LN → FFN(relu) →
residual+LN. Padding is excluded via an additive attention bias.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

NEG_INF = -1e9


def padding_attention_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """(B, L) key mask → (B, 1, 1, L) boolean attention mask (True = attend).

    Rows that are entirely padding would softmax over an all-False mask; flax
    handles that by producing uniform attention, and those rows are zeroed by
    the pooling masks downstream anyway."""
    return (mask > 0)[:, None, None, :]


class TransformerEncoderLayer(nn.Module):
    dim: int
    num_heads: int
    ff_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        attn_mask = padding_attention_mask(mask)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.dim,
            out_features=self.dim,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            name="self_attention",
        )(x, x, x, mask=attn_mask)
        x = nn.LayerNorm(name="attention_norm")(x + attn)
        h = nn.Dense(self.ff_dim, name="ff_in")(x)
        h = nn.relu(h)
        h = nn.Dense(self.dim, name="ff_out")(h)
        return nn.LayerNorm(name="ff_norm")(x + h)


class TransformerEncoder(nn.Module):
    num_layers: int
    dim: int
    num_heads: int
    ff_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.dim, self.num_heads, self.ff_dim, self.dropout, name=f"layer_{i}"
            )(x, mask, deterministic)
        return x
