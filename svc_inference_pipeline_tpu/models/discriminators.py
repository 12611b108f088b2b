"""BigVGAN discriminators: multi-period (MPD) + multi-resolution (MRD).

The reference ships these as dead code — defined but never exercised (no
training path; /root/reference/modules/bigvgan.py:635-883, SURVEY §2.8).
Here they are live: training/gan.py drives them in the adversarial
vocoder objective.

Channels-last layouts: waveforms [B, T], period reshape → [B, T/p, p, C].
Weight-norm is folded at conversion (spectral-norm checkpoints fold the
same way — at inference/discrimination time the parametrisation is just a
reparametrised weight).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.1


def _get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


class PeriodDiscriminator(nn.Module):
    """One period branch (bigvgan.py:635-713): fold the waveform into
    [T/p, p] and run a 2-D conv stack with (k,1) kernels."""

    period: int
    d_mult: float = 1.0
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        b, t = x.shape
        p = self.period
        if t % p != 0:
            pad = p - (t % p)
            x = jnp.concatenate([x, x[:, -pad:][:, ::-1]], axis=1)  # reflect
            t = t + pad
        h = x.reshape(b, t // p, p, 1)

        fmap = []
        channels = [32, 128, 512, 1024]
        for i, ch in enumerate(channels):
            h = nn.Conv(
                int(ch * self.d_mult),
                kernel_size=(self.kernel_size, 1),
                strides=(self.stride, 1),
                padding=[(_get_padding(5, 1), _get_padding(5, 1)), (0, 0)],
                name=f"conv_{i}",
            )(h)
            h = jax.nn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        h = nn.Conv(
            int(1024 * self.d_mult),
            kernel_size=(self.kernel_size, 1),
            padding=[(2, 2), (0, 0)],
            name="conv_4",
        )(h)
        h = jax.nn.leaky_relu(h, LRELU_SLOPE)
        fmap.append(h)
        h = nn.Conv(1, kernel_size=(3, 1), padding=[(1, 1), (0, 0)], name="conv_post")(h)
        fmap.append(h)
        return h.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """Periods from cfg.mpd_reshapes (default [2,3,5,7,11], bigvgan.py:716-739)."""

    cfg: Any

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        outs_r, outs_g, fmaps_r, fmaps_g = [], [], [], []
        for p in self.cfg.mpd_reshapes:
            d = PeriodDiscriminator(
                p, self.cfg.discriminator_channel_mult, name=f"period_{p}"
            )
            o_r, f_r = d(y)
            o_g, f_g = d(y_hat)
            outs_r.append(o_r)
            outs_g.append(o_g)
            fmaps_r.append(f_r)
            fmaps_g.append(f_g)
        return outs_r, outs_g, fmaps_r, fmaps_g


class ResolutionDiscriminator(nn.Module):
    """One STFT-magnitude resolution branch (bigvgan.py:742-853)."""

    resolution: Sequence[int]  # (n_fft, hop, win)
    d_mult: float = 1.0

    def _spectrogram(self, x: jnp.ndarray) -> jnp.ndarray:
        from svc_inference_pipeline_tpu.ops.mel import stft_magnitude

        n_fft, hop, win = self.resolution
        pad = (n_fft - hop) // 2
        # reference uses |.|₂ over (re,im) — equal to our magnitude with 0 floor
        mag = stft_magnitude(
            x, n_fft=n_fft, hop=hop, win_length=win, pad=(pad, pad),
            pad_mode="reflect", magnitude_floor=0.0,
        )
        return mag  # [B, F, TT]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        h = self._spectrogram(x)[..., None].transpose(0, 2, 1, 3)  # [B, TT, F, 1]
        fmap = []
        specs = [
            dict(kernel_size=(3, 9), strides=(1, 1)),
            dict(kernel_size=(3, 9), strides=(1, 2)),
            dict(kernel_size=(3, 9), strides=(1, 2)),
            dict(kernel_size=(3, 9), strides=(1, 2)),
            dict(kernel_size=(3, 3), strides=(1, 1)),
        ]
        for i, s in enumerate(specs):
            kh, kw = s["kernel_size"]
            h = nn.Conv(
                int(32 * self.d_mult),
                kernel_size=s["kernel_size"],
                strides=s["strides"],
                padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)],
                name=f"conv_{i}",
            )(h)
            h = jax.nn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        h = nn.Conv(1, kernel_size=(3, 3), padding=[(1, 1), (1, 1)], name="conv_post")(h)
        fmap.append(h)
        return h.reshape(h.shape[0], -1), fmap


class MultiResolutionDiscriminator(nn.Module):
    """Resolutions from cfg.resolutions (bigvgan.py:856-883)."""

    cfg: Any

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        outs_r, outs_g, fmaps_r, fmaps_g = [], [], [], []
        for res in self.cfg.resolutions:
            d = ResolutionDiscriminator(
                tuple(res), self.cfg.discriminator_channel_mult,
                name=f"resolution_{res[0]}",
            )
            o_r, f_r = d(y)
            o_g, f_g = d(y_hat)
            outs_r.append(o_r)
            outs_g.append(o_g)
            fmaps_r.append(f_r)
            fmaps_g.append(f_g)
        return outs_r, outs_g, fmaps_r, fmaps_g
