"""Transformer primitives: attention, conv-FFN, FFT blocks.

Semantics match the reference's fairseq-style stack
(``modules/commons/common_layers.py``): pre-LN self-attention (no qkv bias),
conv-FFN with kernel 9 scaled by ``k^-0.5`` then GELU, padding-aware sinusoidal
positions, per-layer nonpadding masking. Layout is [B, T, C] throughout (the
reference's T×B×C layout is a cuDNN artifact with no benefit under XLA).

Initializers match the reference: xavier-uniform linears with zero bias,
normal(std=H^-0.5) embeddings with a zeroed padding row.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

xavier_uniform = nn.initializers.xavier_uniform()


def embedding_init(key, shape, dtype=jnp.float32, padding_idx: Optional[int] = 0):
    dim = shape[-1]
    w = jax.random.normal(key, shape, dtype) * (dim ** -0.5)
    if padding_idx is not None:
        w = w.at[padding_idx].set(0.0)
    return w


class Embedding(nn.Module):
    """Token embedding with reference init (normal std=H^-0.5, zero pad row)."""

    num_embeddings: int
    features: int
    padding_idx: Optional[int] = 0

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding",
            lambda k, s: embedding_init(k, s, padding_idx=self.padding_idx),
            (self.num_embeddings, self.features),
        )
        return jnp.take(table, ids, axis=0)


class Linear(nn.Module):
    """Dense with xavier-uniform weight and zero bias (reference ``Linear``)."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=xavier_uniform,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(x)


def sinusoidal_embedding_table(
    num_embeddings: int, embedding_dim: int, padding_idx: Optional[int] = 0
) -> np.ndarray:
    """fairseq/tensor2tensor sinusoid table: [sin | cos] blocks, zeroed pad row."""
    half_dim = embedding_dim // 2
    emb = math.log(10000) / (half_dim - 1)
    emb = np.exp(np.arange(half_dim, dtype=np.float64) * -emb)
    emb = np.arange(num_embeddings, dtype=np.float64)[:, None] * emb[None, :]
    emb = np.concatenate([np.sin(emb), np.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = np.concatenate([emb, np.zeros((num_embeddings, 1))], axis=1)
    if padding_idx is not None:
        emb[padding_idx, :] = 0
    return emb.astype(np.float32)


def make_positions(nonpad_mask: jnp.ndarray, padding_idx: int = 0) -> jnp.ndarray:
    """Padding-aware positions: first real token gets padding_idx+1."""
    mask = nonpad_mask.astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + padding_idx


class SinusoidalPositionalEmbedding(nn.Module):
    """Padding-aware sinusoidal positions (reference ``common_layers.py:95-150``)."""

    embedding_dim: int
    padding_idx: int = 0
    init_size: int = 2048

    @nn.compact
    def __call__(self, nonpad_mask: jnp.ndarray) -> jnp.ndarray:
        table = jnp.asarray(
            sinusoidal_embedding_table(
                self.init_size + self.padding_idx + 1, self.embedding_dim, self.padding_idx
            )
        )
        positions = make_positions(nonpad_mask, self.padding_idx)
        return jnp.take(table, positions, axis=0)


class MultiheadSelfAttention(nn.Module):
    """Self-attention equivalent to fairseq ``MultiheadAttention`` with
    ``self_attention=True, bias=False`` (as used by ``EncSALayer``).

    ``tp_axis``: Megatron-style tensor parallelism — heads sharded over the
    mesh axis (column-parallel in_proj, row-parallel out_proj); GSPMD inserts
    the single psum at the out_proj. Beyond reference parity (the reference is
    DP-only, SURVEY §2.9)."""

    embed_dim: int
    num_heads: int
    dtype: Optional[jnp.dtype] = None
    tp_axis: Optional[str] = None
    data_axis: str = "data"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, key_padding_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        from jax.sharding import PartitionSpec as P

        tp = self.tp_axis is not None and not self.is_initializing()
        cstr = (
            jax.lax.with_sharding_constraint if tp else (lambda arr, spec: arr)
        )
        head_spec = P(self.data_axis, None, self.tp_axis, None) if tp else None
        h, d = self.num_heads, self.embed_dim // self.num_heads
        scaling = d ** -0.5
        qkv = nn.Dense(
            3 * self.embed_dim,
            use_bias=False,
            kernel_init=xavier_uniform,
            dtype=self.dtype,
            name="in_proj",
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, t = x.shape[0], x.shape[1]
        q = cstr(q.reshape(b, t, h, d) * scaling, head_spec)
        k = cstr(k.reshape(b, t, h, d), head_spec)
        v = cstr(v.reshape(b, t, h, d), head_spec)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        if tp:
            attn = cstr(attn, P(self.data_axis, self.tp_axis, None, None))
        if key_padding_mask is not None:
            attn = jnp.where(
                key_padding_mask[:, None, None, :], jnp.finfo(jnp.float32).min, attn
            )
        attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = cstr(out, head_spec).reshape(b, t, self.embed_dim)
        out = nn.Dense(
            self.embed_dim,
            use_bias=False,
            kernel_init=xavier_uniform,
            dtype=self.dtype,
            name="out_proj",
        )(out)
        # row-parallel reduce: result replicated over the model axis
        return cstr(out, P(self.data_axis, None, None))


class TransformerFFNLayer(nn.Module):
    """Conv(k)->*k^-0.5->GELU->dropout->Linear FFN (reference ``common_layers.py:542-585``)."""

    hidden_size: int
    filter_size: int
    kernel_size: int = 9
    dropout: float = 0.0
    act: str = "gelu"
    dtype: Optional[jnp.dtype] = None
    tp_axis: Optional[str] = None
    data_axis: str = "data"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        from jax.sharding import PartitionSpec as P

        tp = self.tp_axis is not None and not self.is_initializing()
        x = nn.Conv(
            self.filter_size,
            kernel_size=(self.kernel_size,),
            padding="SAME",
            dtype=self.dtype,
            name="ffn_1",
        )(x)
        if tp:
            # column-parallel expansion: the 4H filter channels shard, the
            # k=9 conv + GELU stay local
            x = jax.lax.with_sharding_constraint(
                x, P(self.data_axis, None, self.tp_axis)
            )
        x = x * self.kernel_size ** -0.5
        if self.act == "gelu":
            x = jax.nn.gelu(x, approximate=False)
        elif self.act == "relu":
            x = jax.nn.relu(x)
        elif self.act == "swish":
            x = jax.nn.silu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = Linear(self.hidden_size, dtype=self.dtype, name="ffn_2")(x)
        if tp:
            # row-parallel contraction: psum over the model axis
            x = jax.lax.with_sharding_constraint(
                x, P(self.data_axis, None, None)
            )
        return x


class EncSALayer(nn.Module):
    """Pre-LN encoder layer: LN->MHA->res->mask, LN->FFN->res->mask."""

    hidden_size: int
    num_heads: int
    dropout: float = 0.1
    kernel_size: int = 9
    act: str = "gelu"
    dtype: Optional[jnp.dtype] = None
    tp_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        padding_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        nonpad = (1 - padding_mask.astype(x.dtype))[:, :, None]
        if self.num_heads > 0:
            residual = x
            x = nn.LayerNorm(name="layer_norm1")(x)
            x = MultiheadSelfAttention(
                self.hidden_size, self.num_heads, dtype=self.dtype,
                tp_axis=self.tp_axis, name="self_attn"
            )(x, key_padding_mask=padding_mask)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            x = (residual + x) * nonpad
        residual = x
        x = nn.LayerNorm(name="layer_norm2")(x)
        x = TransformerFFNLayer(
            self.hidden_size,
            4 * self.hidden_size,
            kernel_size=self.kernel_size,
            dropout=self.dropout,
            act=self.act,
            dtype=self.dtype,
            tp_axis=self.tp_axis,
            name="ffn",
        )(x, deterministic=deterministic)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return (residual + x) * nonpad


class FFTBlocks(nn.Module):
    """Stack of EncSALayers with optional positions and final LayerNorm
    (reference ``modules/fastspeech/tts_modules.py:232-288``)."""

    hidden_size: int
    num_layers: int
    ffn_kernel_size: int = 9
    dropout: float = 0.1
    num_heads: int = 2
    use_pos_embed: bool = True
    use_last_norm: bool = True
    max_positions: int = 2000
    dtype: Optional[jnp.dtype] = None
    tp_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        padding_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        nonpad = (1 - padding_mask.astype(x.dtype))[:, :, None]
        if self.use_pos_embed:
            alpha = self.param("pos_embed_alpha", nn.initializers.ones, (1,))
            positions = alpha * SinusoidalPositionalEmbedding(
                self.hidden_size, init_size=self.max_positions, name="embed_positions"
            )(1 - padding_mask)
            x = x + positions
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = x * nonpad
        for i in range(self.num_layers):
            x = EncSALayer(
                self.hidden_size,
                self.num_heads,
                dropout=self.dropout,
                kernel_size=self.ffn_kernel_size,
                dtype=self.dtype,
                tp_axis=self.tp_axis,
                name=f"layers_{i}",
            )(x, padding_mask, deterministic=deterministic) * nonpad
        if self.use_last_norm:
            x = nn.LayerNorm(name="layer_norm")(x) * nonpad
        return x


class SinusoidalPosEmb(nn.Module):
    """Diffusion-timestep embedding (reference ``modules/decoder/wavenet.py:26-38``)."""

    dim: int

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half_dim = self.dim // 2
        emb = math.log(10000) / (half_dim - 1)
        emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
        emb = t.astype(jnp.float32)[:, None] * emb[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


def mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(jax.nn.softplus(x))
