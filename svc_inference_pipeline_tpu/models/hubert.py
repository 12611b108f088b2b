"""HuBERT / ContentVec content encoder in Flax.

The reference loads a fairseq ContentVec checkpoint and takes layer-9
features projected to 256 dims (/root/reference/utils/hubert.py:14-46);
fairseq itself is not a dependency here — the architecture (HuBERT-base:
7-layer conv feature extractor at 320× decimation, 12-layer post-LN
transformer, 768 dims) is implemented natively and checkpoints are
converted from the fairseq layout (checkpoints/hubert_convert.py).

Numerics are validated against the transformers library's HubertModel
(same lineage as fairseq) in tests/test_hubert_parity.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    conv_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 2, 2),
        (512, 2, 2),
    )
    encoder_dim: int = 768
    encoder_layers: int = 12
    encoder_heads: int = 12
    encoder_ffn_dim: int = 3072
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    final_dim: int = 256  # final_proj output (ContentVec features)


class _ConvFeatureExtractor(nn.Module):
    """Waveform [B, L] → features [B, S, 512] at 320× decimation.

    fairseq default "group_norm" mode: GroupNorm(512, 512) after the first
    conv only; all convs bias-free; GELU after each.
    """

    cfg: HubertConfig

    @nn.compact
    def __call__(self, x):
        x = x[..., None]  # [B, L, 1]
        for i, (dim, k, stride) in enumerate(self.cfg.conv_layers):
            x = nn.Conv(
                dim,
                kernel_size=(k,),
                strides=(stride,),
                padding="VALID",
                use_bias=False,
                name=f"conv_{i}",
            )(x)
            if i == 0:
                x = nn.GroupNorm(num_groups=dim, epsilon=1e-5, name="group_norm")(x)
            x = nn.gelu(x, approximate=False)
        return x


class _SelfAttention(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        h = self.heads
        hd = self.dim // h
        q = nn.Dense(self.dim, name="q_proj")(x) * (hd**-0.5)
        k = nn.Dense(self.dim, name="k_proj")(x)
        v = nn.Dense(self.dim, name="v_proj")(x)
        b, t, _ = x.shape
        q = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, h, hd).transpose(0, 2, 3, 1)
        v = v.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        w = jax.nn.softmax(jnp.einsum("bhqd,bhdk->bhqk", q, k).astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
        return nn.Dense(self.dim, name="out_proj")(out)


class _EncoderLayer(nn.Module):
    """Post-LN transformer layer (fairseq layer_norm_first=False)."""

    cfg: HubertConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = x + _SelfAttention(c.encoder_dim, c.encoder_heads, name="self_attn")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="self_attn_layer_norm")(x)
        y = nn.Dense(c.encoder_ffn_dim, name="fc1")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c.encoder_dim, name="fc2")(y)
        x = x + y
        return nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)


class HubertModel(nn.Module):
    """HuBERT-base feature extractor.

    ``__call__(wav [B, L], output_layer=9, final_proj=True)`` →
    [B, S, 256] — matching get_hubert_content (utils/hubert.py:31-46):
    layer-9 transformer output through final_proj.
    """

    cfg: HubertConfig = HubertConfig()

    @nn.compact
    def __call__(self, wav: jnp.ndarray, output_layer: int = 9, final_proj: bool = True):
        c = self.cfg
        feats = _ConvFeatureExtractor(c, name="feature_extractor")(wav)
        feats = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(feats)
        x = nn.Dense(c.encoder_dim, name="post_extract_proj")(feats)

        # convolutional relative positional embedding (k=128, 16 groups,
        # weight-norm folded by the converter), SamePad trims one sample
        pad = c.pos_conv_kernel // 2
        pos = nn.Conv(
            c.encoder_dim,
            kernel_size=(c.pos_conv_kernel,),
            padding=[(pad, pad)],
            feature_group_count=c.pos_conv_groups,
            name="pos_conv",
        )(x)
        if c.pos_conv_kernel % 2 == 0:
            pos = pos[:, :-1, :]
        x = x + nn.gelu(pos, approximate=False)
        x = nn.LayerNorm(epsilon=1e-5, name="encoder_layer_norm")(x)

        assert 1 <= output_layer <= c.encoder_layers
        for i in range(output_layer):
            x = _EncoderLayer(c, name=f"layer_{i}")(x)

        if final_proj:
            x = nn.Dense(c.final_dim, name="final_proj")(x)
        return x
