"""Whisper transformer (encoder + decoder) in Flax.

Rebuild of the reference's vendored OpenAI Whisper model
(/root/reference/utils/whisper_extractor/model.py:15-268). The SVC pipeline
only exercises ``embed_audio`` — the [B, 80, 3000] log-mel → [B, 1500, 1024]
AudioEncoder pass (utils/whisper.py:13-28) — but the decoder is implemented
for API-surface completeness (greedy decoding lives in
models/whisper_decoding.py).

TPU-first choices:
* bf16 matmuls with f32 LayerNorm/softmax (the reference's fp16-tolerant
  LayerNorm subclass, model.py:29-31, becomes an explicit f32 island),
* encoder blocks run under ``jax.lax.scan`` over stacked per-layer params
  (``scan_layers=True``) so the 24-layer medium encoder compiles as one
  loop instead of 24 inlined blocks — faster compiles, identical math,
* attention uses one fused QKV einsum per projection and
  ``jax.nn.dot_product_attention`` semantics expressed explicitly (the
  1/√d scale is split as d^-0.25 on q and k exactly like the reference,
  model.py:88-101, to keep bf16 ranges tame),
* KV caching for the decoder is a functional carry, not forward hooks
  (model.py:234-264).

Checkpoint name/size registry mirrors whisper_extractor/__init__.py:18-30;
in this zero-egress environment checkpoints must already be on disk.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class WhisperDims:
    """Model dimensions (= the reference's ModelDimensions, model.py:15-27)."""

    n_mels: int = 80
    n_audio_ctx: int = 1500
    n_audio_state: int = 1024
    n_audio_head: int = 16
    n_audio_layer: int = 24
    n_vocab: int = 51865
    n_text_ctx: int = 448
    n_text_state: int = 1024
    n_text_head: int = 16
    n_text_layer: int = 24


# Known model sizes (dims only — the sha256/URL download table of
# whisper_extractor/__init__.py:18-30 is moot in a zero-egress environment;
# load from a local path instead).
WHISPER_SIZES: Dict[str, WhisperDims] = {
    "tiny": WhisperDims(80, 1500, 384, 6, 4, 51865, 448, 384, 6, 4),
    "base": WhisperDims(80, 1500, 512, 8, 6, 51865, 448, 512, 8, 6),
    "small": WhisperDims(80, 1500, 768, 12, 12, 51865, 448, 768, 12, 12),
    "medium": WhisperDims(80, 1500, 1024, 16, 24, 51865, 448, 1024, 16, 24),
    "large-v1": WhisperDims(80, 1500, 1280, 20, 32, 51865, 448, 1280, 20, 32),
    "large-v2": WhisperDims(80, 1500, 1280, 20, 32, 51865, 448, 1280, 20, 32),
    "large": WhisperDims(80, 1500, 1280, 20, 32, 51865, 448, 1280, 20, 32),
}


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """Sinusoidal positional embedding (model.py:48-54)."""
    assert channels % 2 == 0
    log_inc = np.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


# perf A/B hook (perf_whisper.py): bf16 LN normalise/affine with f32
# stats. Never set in production unless the BENCH_NOTES A/B graduated it.
_DEBUG = {"fast_norms": False}


class _LayerNormF32(nn.Module):
    """LayerNorm computed in f32 regardless of input dtype (model.py:29-31)."""

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        if _DEBUG["fast_norms"] and x.dtype == jnp.bfloat16:
            # stats stay f32 (cancellation); the elementwise normalise +
            # affine run at the storage width — halves those fusions'
            # register/HBM traffic on the [T, 1024] activations
            norm = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
            return norm * scale.astype(x.dtype) + bias.astype(x.dtype)
        y = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return y.astype(x.dtype)


def _attention(q, k, v, n_head: int, mask: Optional[jnp.ndarray] = None,
               use_pallas: bool = True):
    """Split-scale attention (model.py:88-101): q,k scaled by d^-0.25 each."""
    b, tq, d = q.shape
    tk = k.shape[1]
    if (use_pallas and mask is None and tq == tk and tq >= 256
            and jax.default_backend() == "tpu"):
        # encoder self-attention: the blocked Pallas kernel keeps the
        # [tq, tk] f32 score matrix in VMEM (same f32-softmax numerics).
        # Callers running under tensor parallelism pass use_pallas=False —
        # GSPMD cannot partition the opaque pallas_call, so head-sharded
        # activations would be all-gathered around it.
        from svc_inference_pipeline_tpu.ops.pallas.attention import encoder_attention

        return encoder_attention(q, k, v, n_head)
    hd = d // n_head
    scale = hd**-0.25
    q = q.reshape(b, tq, n_head, hd).transpose(0, 2, 1, 3) * scale
    k = k.reshape(b, tk, n_head, hd).transpose(0, 2, 3, 1) * scale
    v = v.reshape(b, tk, n_head, hd).transpose(0, 2, 1, 3)
    qk = jnp.einsum("bhqd,bhdk->bhqk", q, k)
    if mask is not None:
        qk = qk + mask[:tq, :tk]
    w = jax.nn.softmax(qk.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    return out.transpose(0, 2, 1, 3).reshape(b, tq, d)


class MultiHeadAttention(nn.Module):
    n_state: int
    n_head: int
    use_pallas_attn: bool = True
    # explicit compute dtype for the Dense layers: with the default (None)
    # flax promotes through the f32 bias params, silently lifting the whole
    # residual stream back to f32 even when inputs/kernels are bf16
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, xa=None, mask=None, kv: Optional[Tuple] = None,
                 kv_buffer: Optional[Tuple] = None, offset=0):
        """Self-attention (xa None) or cross-attention. ``kv`` is an optional
        precomputed (k, v) — the functional analogue of the reference's
        forward-hook KV cache (model.py:75-84). ``kv_buffer`` is a fixed-size
        (k, v) pair of [B, T_max, n_state] buffers for O(1)-per-token
        incremental decoding: the freshly computed k/v rows are written at
        ``offset`` (a traced scalar is fine) and attention runs over the whole
        buffer — the caller's mask hides the not-yet-written tail."""
        q = nn.Dense(self.n_state, dtype=self.dtype, name="query")(x)
        if kv is not None:
            k, v = kv
        else:
            src = x if xa is None else xa
            k = nn.Dense(self.n_state, use_bias=False, dtype=self.dtype,
                         name="key")(src)
            v = nn.Dense(self.n_state, dtype=self.dtype, name="value")(src)
        if kv_buffer is not None:
            kb, vb = kv_buffer
            k = jax.lax.dynamic_update_slice_in_dim(kb, k.astype(kb.dtype), offset, 1)
            v = jax.lax.dynamic_update_slice_in_dim(vb, v.astype(vb.dtype), offset, 1)
        out = _attention(q, k, v, self.n_head, mask, use_pallas=self.use_pallas_attn)
        return nn.Dense(self.n_state, dtype=self.dtype, name="out")(out), (k, v)


class ResidualAttentionBlock(nn.Module):
    n_state: int
    n_head: int
    cross_attention: bool = False
    use_pallas_attn: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, xa=None, mask=None, cross_kv=None, self_kv=None,
                 self_buffer=None, offset=0):
        h, self_kv_out = MultiHeadAttention(
            self.n_state, self.n_head, use_pallas_attn=self.use_pallas_attn,
            dtype=self.dtype, name="attn",
        )(
            _LayerNormF32(name="attn_ln")(x), mask=mask, kv=self_kv,
            kv_buffer=self_buffer, offset=offset,
        )
        x = x + h
        cross_kv_out = None
        if self.cross_attention:
            h, cross_kv_out = MultiHeadAttention(
                self.n_state, self.n_head, dtype=self.dtype, name="cross_attn"
            )(_LayerNormF32(name="cross_attn_ln")(x), xa=xa, kv=cross_kv)
            x = x + h
        y = _LayerNormF32(name="mlp_ln")(x)
        y = nn.Dense(self.n_state * 4, dtype=self.dtype, name="mlp_0")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.n_state, dtype=self.dtype, name="mlp_2")(y)
        return x + y, (self_kv_out, cross_kv_out)


class WhisperAudioEncoder(nn.Module):
    """[B, n_mels, 3000] log-mel → [B, 1500, n_state] (model.py:132-160)."""

    dims: WhisperDims
    compute_dtype: jnp.dtype = jnp.float32
    scan_layers: bool = False
    use_pallas_attn: bool = True

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        d = self.dims
        x = mel.transpose(0, 2, 1).astype(self.compute_dtype)  # [B, 3000, n_mels]
        # dtype= is explicit everywhere below: the f32 bias/LN params would
        # otherwise promote each layer's output (and hence the residual
        # stream) back to f32, doubling the elementwise/HBM traffic that the
        # bf16 compute_dtype is supposed to halve
        x = nn.gelu(
            nn.Conv(d.n_audio_state, (3,), padding=[(1, 1)],
                    dtype=self.compute_dtype, name="conv1")(x),
            approximate=False,
        )
        x = nn.gelu(
            nn.Conv(d.n_audio_state, (3,), strides=(2,), padding=[(1, 1)],
                    dtype=self.compute_dtype, name="conv2")(x),
            approximate=False,
        )
        assert x.shape[1:] == (d.n_audio_ctx, d.n_audio_state), x.shape
        x = x + jnp.asarray(sinusoids(d.n_audio_ctx, d.n_audio_state)).astype(x.dtype)

        if self.scan_layers:
            block = nn.remat(ResidualAttentionBlock, prevent_cse=False)
            ScanBlocks = nn.scan(
                _ScannedBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=d.n_audio_layer,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )
            x, _ = ScanBlocks(
                d.n_audio_state, d.n_audio_head,
                use_pallas_attn=self.use_pallas_attn,
                dtype=self.compute_dtype, name="blocks",
            )(x, None)
        else:
            for i in range(d.n_audio_layer):
                x, _ = ResidualAttentionBlock(
                    d.n_audio_state, d.n_audio_head,
                    use_pallas_attn=self.use_pallas_attn,
                    dtype=self.compute_dtype, name=f"block_{i}",
                )(x)

        x = _LayerNormF32(name="ln_post")(x)
        return x.astype(jnp.float32)


class _ScannedBlock(nn.Module):
    n_state: int
    n_head: int
    use_pallas_attn: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, _):
        y, _ = ResidualAttentionBlock(
            self.n_state, self.n_head, use_pallas_attn=self.use_pallas_attn,
            dtype=self.dtype, name="block",
        )(x)
        return y, None


class WhisperTextDecoder(nn.Module):
    """Token decoder with functional KV cache (model.py:163-195)."""

    dims: WhisperDims
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,  # [B, T]
        audio_features: jnp.ndarray,  # [B, 1500, n_state]
        cache: Optional[Dict[str, Any]] = None,
        offset: int = 0,
    ):
        d = self.dims
        pos_emb = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (d.n_text_ctx, d.n_text_state),
        )
        tok_emb = nn.Embed(d.n_vocab, d.n_text_state, name="token_embedding")
        tq = tokens.shape[-1]
        x = tok_emb(tokens) + jax.lax.dynamic_slice_in_dim(pos_emb, offset, tq, 0)
        x = x.astype(self.compute_dtype)
        xa = audio_features.astype(self.compute_dtype)

        # incremental mode: ``cache`` carries fixed-size [B, T_max, d] self-KV
        # buffers (``self_{i}``) — new rows are written at ``offset`` (traced
        # scalar OK) and the mask hides every buffer column past the current
        # position, so stale rows beyond it are never attended
        incremental = cache is not None and "self_0" in cache
        if incremental:
            t_max = cache["self_0"][0].shape[1]
            rows = offset + jnp.arange(tq)[:, None]
            cols = jnp.arange(t_max)[None, :]
            mask = jnp.where(cols <= rows, 0.0, -jnp.inf).astype(jnp.float32)
        else:
            mask = jnp.triu(
                jnp.full((d.n_text_ctx, d.n_text_ctx), -jnp.inf, dtype=jnp.float32), k=1
            )

        new_cache: Dict[str, Any] = {}
        for i in range(d.n_text_layer):
            cross_kv = cache.get(f"cross_{i}") if cache else None
            self_buffer = cache.get(f"self_{i}") if incremental else None
            x, (self_kv, cross_kv_out) = ResidualAttentionBlock(
                d.n_text_state, d.n_text_head, cross_attention=True, name=f"block_{i}"
            )(x, xa=xa, mask=mask, cross_kv=cross_kv,
              self_buffer=self_buffer, offset=offset)
            new_cache[f"cross_{i}"] = cross_kv if cross_kv is not None else cross_kv_out
            new_cache[f"self_{i}"] = self_kv

        x = _LayerNormF32(name="ln")(x)
        logits = jnp.einsum(
            "btd,vd->btv", x.astype(jnp.float32), tok_emb.embedding.astype(jnp.float32)
        )
        return logits, new_cache


def is_multilingual(dims: WhisperDims) -> bool:
    return dims.n_vocab == 51865
