"""TKL (SIGIR'20) — TK for long documents via overlapping chunk windows.

Behavior contract: reference models/published/sigir20_tkl.py:12-393 —
document split into overlapping chunks (chunk 40, overlap 5) contextualized by
the TK transformer per chunk; kernel activations reassembled over the full
document; sliding-window (size 30, stride 2) pooling with a learned saturation
function (log / idf / embedding / linear variants); per-window scores; top-k
(3) region argmax with ±2 neighbors weighted by learned chunk scores.

TPU shape: instead of the reference's dynamic "pack non-empty chunks" gather
(sigir20_tkl.py:159-162), all chunks are computed and masked — static shapes,
full MXU batches; empty-chunk work is masked out of the result.
"""

from __future__ import annotations

from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from matchmaker_tpu.models.base import Batch, Output, Ranker
from matchmaker_tpu.models.knrm import small_uniform_init
from matchmaker_tpu.modules.embedder import TokenEmbedder, sinusoidal_positions
from matchmaker_tpu.modules.transformer import TransformerEncoder
from matchmaker_tpu.modules.pooling import unfold_chunks
from matchmaker_tpu.ops.kernel_pooling import (
    cosine_match_matrix,
    gaussian_kernel_mus,
    gaussian_kernel_sigmas,
    kernel_activations,
)


class TKL(Ranker):
    vocab_size: int
    dim: int
    kernels_mu: Optional[List[float]] = None
    kernels_sigma: Optional[List[float]] = None
    att_heads: int = 8
    att_layers: int = 2
    att_ff_dim: int = 100
    max_length: int = 2000
    chunk_size: int = 40
    overlap: int = 5
    sliding_window_size: int = 30
    sliding_window_stride: int = 2
    top_k_chunks: int = 3
    saturation: str = "log"  # log | idf | embedding | linear
    pretrained_embeddings: Optional[np.ndarray] = None

    @classmethod
    def from_config(cls, config, pretrained=None):
        return cls(
            vocab_size=config["_vocab_size"],
            dim=config.get("token_embedding_size", 300),
            kernels_mu=config.get("tk_kernels_mu"),
            kernels_sigma=config.get("tk_kernels_sigma"),
            att_heads=config.get("tk_att_heads", 8),
            att_layers=config.get("tk_att_layer", 2),
            att_ff_dim=config.get("tk_att_ff_dim", 100),
            max_length=config.get("max_doc_length", 2000),
            chunk_size=config.get("tkl_chunk_size", 40),
            overlap=config.get("tkl_overlap", 5),
            sliding_window_size=config.get("tkl_sliding_window_size", 30),
            top_k_chunks=config.get("tkl_top_k_chunks", 3),
            saturation=config.get("tkl_saturation", "log"),
            pretrained_embeddings=pretrained,
        )

    def setup(self):
        self.embedder = TokenEmbedder(self.vocab_size, self.dim, pretrained=self.pretrained_embeddings)
        mus = self.kernels_mu or gaussian_kernel_mus(11)
        sigmas = self.kernels_sigma or gaussian_kernel_sigmas(11)
        self.mu = jnp.asarray(mus)
        self.sigma = jnp.asarray(sigmas)
        n_kernels = len(mus)

        ext = self.chunk_size + 2 * self.overlap
        self.pos_q = jnp.asarray(sinusoidal_positions(512, self.dim))
        self.pos_d = jnp.asarray(sinusoidal_positions(ext, self.dim))
        self.contextualizer = TransformerEncoder(
            num_layers=self.att_layers, dim=self.dim, num_heads=self.att_heads, ff_dim=self.att_ff_dim
        )
        self.mixer = self.param("mixer", lambda *_: jnp.full((1,), 0.5))
        self.kernel_mult = self.param("kernel_mult", lambda *_: jnp.ones((1,)))
        self.chunk_scoring = self.param(
            "chunk_scoring", lambda *_: jnp.ones((1, self.top_k_chunks * 5))
        )
        self.dense = nn.Dense(1, use_bias=False, kernel_init=small_uniform_init, name="kernel_weights")
        if self.saturation in ("idf", "embedding", "linear"):
            self.saturation_linear = nn.Dense(1, name="saturation_linear")
            self.saturation_linear2 = nn.Dense(1, name="saturation_linear2")
            if self.saturation != "linear":
                self.saturation_linear3 = nn.Dense(1, name="saturation_linear3")
            if self.saturation == "embedding":
                self.sat_emb_reduce1 = nn.Dense(1, name="sat_emb_reduce1")
                self.sat_normer = nn.LayerNorm(name="sat_normer")

    def contextualize(self, emb, mask, positions):
        ctx = self.contextualizer(emb + positions[None, : emb.shape[1], :], mask)
        return self.mixer * emb + (1.0 - self.mixer) * ctx

    def __call__(self, batch: Batch, output_secondary: bool = False) -> Output:
        q_mask, d_mask = batch["query_mask"], batch["doc_mask"]
        q_emb = self.embedder(batch["query_ids"], q_mask)
        d_emb = self.embedder(batch["doc_ids"], d_mask)
        b, lq = q_mask.shape

        q_ctx = self.contextualize(q_emb, q_mask, self.pos_q)

        # ---- chunk the document (static shapes; empty chunks masked not packed)
        chunks = unfold_chunks(d_emb, self.chunk_size, self.overlap)  # (B, C, ext, D)
        chunk_mask = unfold_chunks(d_mask[..., None], self.chunk_size, self.overlap).squeeze(-1)
        n_chunks, ext = chunks.shape[1], chunks.shape[2]

        flat = chunks.reshape(b * n_chunks, ext, self.dim)
        flat_mask = chunk_mask.reshape(b * n_chunks, ext)
        flat_ctx = self.contextualize(flat, flat_mask, self.pos_d)

        inner = flat_ctx[:, self.overlap : self.overlap + self.chunk_size, :]
        inner_mask = flat_mask[:, self.overlap : self.overlap + self.chunk_size]

        # ---- kernel activations per chunk against the (repeated) query
        q_rep = jnp.repeat(q_ctx, n_chunks, axis=0)
        match = cosine_match_matrix(q_rep, inner)  # (B*C, Lq, chunk)
        acts = kernel_activations(match, self.mu, self.sigma) * inner_mask[:, None, :, None]
        # reassemble: (B, Lq, C*chunk, K)
        acts = acts.reshape(b, n_chunks, lq, self.chunk_size, -1).transpose(0, 2, 1, 3, 4)
        acts = acts.reshape(b, lq, n_chunks * self.chunk_size, -1)

        # ---- sliding-window pooling over document positions
        win, stride = self.sliding_window_size, self.sliding_window_stride
        doc_len = acts.shape[2]
        if doc_len < win:
            acts = jnp.pad(acts, ((0, 0), (0, 0), (0, win - doc_len), (0, 0)))
            doc_len = win
        n_windows = (doc_len - win) // stride + 1
        # (B, Lq, W, win, K) via gather of window slices
        idx = (jnp.arange(n_windows) * stride)[:, None] + jnp.arange(win)[None, :]
        windows = acts[:, :, idx, :]  # (B, Lq, W, win, K)
        per_kernel_query = windows.sum(axis=3)  # (B, Lq, W, K)
        win_lengths = (windows.sum(axis=-1) != 0).sum(axis=-1)  # (B, Lq, W)

        # ---- saturation
        if self.saturation == "log":
            sat = jnp.log(jnp.clip(per_kernel_query * self.kernel_mult[0], min=1e-10))
        else:
            if self.saturation == "idf":
                influence_a = nn.relu(
                    batch.get("query_idfs", jnp.zeros_like(q_mask))[:, :, None]
                ) * jnp.ones_like(win_lengths)
            elif self.saturation == "embedding":
                influence_a = self.sat_emb_reduce1(q_ctx).squeeze(-1)[:, :, None] * jnp.ones_like(
                    win_lengths
                )
            else:  # linear
                influence_a = nn.relu(
                    batch.get("query_idfs", jnp.zeros_like(q_mask))[:, :, None]
                ) * jnp.ones_like(win_lengths)
            influencer = jnp.stack([influence_a, win_lengths.astype(jnp.float32)], axis=-1)
            if self.saturation == "embedding":
                influencer = self.sat_normer(influencer)
            sat1 = self.saturation_linear(influencer).squeeze(-1)
            if self.saturation == "linear":
                sat2 = self.saturation_linear2(influencer).squeeze(-1)
                sat = sat1 * jnp.clip(per_kernel_query, min=1e-10).sum(axis=-1, keepdims=True) + sat2
                sat = jnp.broadcast_to(sat[..., None], per_kernel_query.shape)
            else:
                sat2 = 1.0 / self.saturation_linear2(influencer).squeeze(-1)
                sat3 = self.saturation_linear3(influencer).squeeze(-1)
                sat = (
                    sat1[..., None] * jnp.clip(per_kernel_query, min=1e-10) ** sat2[..., None]
                    - sat3[..., None]
                )

        sat = sat * q_mask[:, :, None, None] * (win_lengths > 0)[..., None]
        per_kernel = sat.sum(axis=1)  # (B, W, K)
        window_scores = self.dense(per_kernel).squeeze(-1)  # (B, W)

        # ---- top-k non-overlapping regions with ±2 neighbors
        if window_scores.shape[1] < self.top_k_chunks:
            window_scores = jnp.pad(
                window_scores, ((0, 0), (0, self.top_k_chunks - window_scores.shape[1]))
            )
        scores_sentinel = jnp.where(window_scores == 0, -9900.0, window_scores)
        w = scores_sentinel.shape[1]
        positions = jnp.arange(w)[None, :]
        region_scores = scores_sentinel
        top_idx = []
        for c in range(self.top_k_chunks):
            best = jnp.argmax(region_scores, axis=1)
            top_idx.append(best)
            in_region = jnp.abs(positions - best[:, None]) < win / 2
            region_scores = jnp.where(in_region, -10001.0 - c, region_scores)
        top_idx = jnp.stack(top_idx, axis=1)  # (B, k)
        neighbors = jnp.concatenate(
            [top_idx, top_idx - 1, top_idx + 1, top_idx - 2, top_idx + 2], axis=1
        )
        neighbors = jnp.clip(neighbors, 0, w - 1)
        gathered = jnp.take_along_axis(scores_sentinel, neighbors, axis=1)
        gathered = jnp.where(gathered <= -9900.0, 0.0, gathered)
        score = (gathered * self.chunk_scoring).sum(axis=1)

        out: Output = {"score": score}
        if output_secondary:
            out["secondary"] = {
                "window_scores": jnp.where(scores_sentinel <= -9900.0, 0.0, scores_sentinel),
                "top_non_overlapping_idx": top_idx,
            }
        return out
