"""BigVGAN vocoder generator, TPU-native.

Functional rebuild of /root/reference/modules/bigvgan.py:14-632 with
channels-last [B, T, C] layout:

* Snake / SnakeBeta periodic activations (x + sin²(αx)/β, optional
  log-scale parameters — config: snakebeta + logscale),
* anti-aliased activation sandwich (2× windowed-sinc upsample → snake →
  2× low-pass downsample) — the dominant op count of the whole vocoder;
  a fused Pallas kernel backs it on TPU (ops/pallas/snake.py), with this
  XLA composition as the reference path,
* AMPBlock1/2 multi-dilation residual stacks,
* 6 transposed-conv upsampling stages (rates 4,4,2,2,2,2 = ×256 == hop).

Weight-norm parametrisation is *folded at conversion time*
(checkpoints/torch_convert.py) — the reference keeps g·v/‖v‖ live at
inference because it never calls remove_weight_norm (bigvgan.py:624-631);
folding is numerically identical and removes a normalisation per step.

Filter design: Kaiser-windowed sinc low-pass from the standard
Oppenheim–Schafer design formula (β from stop-band attenuation), matching
the reference's filters (bigvgan.py:162-193) bit-for-bit in f32 — verified
by the parity tests.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Kaiser-windowed sinc filter design (numpy, f64 → f32)
# ---------------------------------------------------------------------------


def _kaiser_window(n: int, beta: float) -> np.ndarray:
    """Symmetric Kaiser window (torch.kaiser_window(periodic=False))."""
    k = np.arange(n, dtype=np.float64)
    x = 2.0 * k / (n - 1) - 1.0
    return np.i0(beta * np.sqrt(np.maximum(0.0, 1.0 - x * x))) / np.i0(beta)


@lru_cache(maxsize=None)
def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Low-pass FIR [kernel_size], sum-normalised (bigvgan.py:162-193)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2

    delta_f = 4.0 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21.0) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = _kaiser_window(kernel_size, beta)

    if even:
        time = np.arange(-half_size, half_size, dtype=np.float64) + 0.5
    else:
        time = np.arange(kernel_size, dtype=np.float64) - half_size

    if cutoff == 0:
        return np.zeros(kernel_size, dtype=np.float32)
    filt = 2.0 * cutoff * window * np.sinc(2.0 * cutoff * time)
    filt /= filt.sum()
    return filt.astype(np.float32)


# ---------------------------------------------------------------------------
# Depthwise filtering primitives (channels-last)
# ---------------------------------------------------------------------------


def _depthwise_conv(x: jnp.ndarray, filt: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """x [B,T,C] ⊛ filt [K] per channel, stride, VALID padding."""
    c = x.shape[-1]
    kernel = jnp.broadcast_to(filt[:, None, None], (filt.shape[0], 1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=c,
    )


def upsample1d(x: jnp.ndarray, ratio: int, kernel_size: Optional[int] = None) -> jnp.ndarray:
    """Windowed-sinc ×ratio upsampling (bigvgan.py:259-287 semantics)."""
    k = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    pad = k // ratio - 1
    pad_left = pad * ratio + (k - ratio) // 2
    pad_right = pad * ratio + (k - ratio + 1) // 2
    filt = jnp.asarray(kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, k))

    x = jnp.pad(x, [(0, 0), (pad, pad), (0, 0)], mode="edge")
    c = x.shape[-1]
    kernel = jnp.broadcast_to(jnp.flip(filt)[:, None, None], (k, 1, c)).astype(x.dtype)
    # torch conv_transpose1d(stride=ratio, padding=0) ≡ lhs-dilated conv with
    # (k-1) padding and a flipped kernel.
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(ratio,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=c,
    )
    y = ratio * y
    return y[:, pad_left : y.shape[1] - pad_right, :]


def downsample1d(x: jnp.ndarray, ratio: int, kernel_size: Optional[int] = None) -> jnp.ndarray:
    """Low-pass + decimate ×ratio (bigvgan.py:196-231,290-307 semantics)."""
    k = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    even = k % 2 == 0
    pad_left = k // 2 - int(even)
    pad_right = k // 2
    filt = jnp.asarray(kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, k))
    x = jnp.pad(x, [(0, 0), (pad_left, pad_right), (0, 0)], mode="edge")
    return _depthwise_conv(x, filt, stride=ratio)


# ---------------------------------------------------------------------------
# Snake activations
# ---------------------------------------------------------------------------


def snake(x: jnp.ndarray, alpha: jnp.ndarray, logscale: bool) -> jnp.ndarray:
    """x + (1/α)·sin²(αx); α per channel (bigvgan.py:42-95)."""
    if logscale:
        alpha = jnp.exp(alpha)
    return x + (1.0 / (alpha + 1e-9)) * jnp.square(jnp.sin(x * alpha))


def snake_beta(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray, logscale: bool) -> jnp.ndarray:
    """x + (1/β)·sin²(αx); separate frequency/magnitude (bigvgan.py:98-159)."""
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    return x + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(x * alpha))


class SnakeAct(nn.Module):
    """Parameterised snake/snakebeta over the channel axis."""

    channels: int
    kind: str  # "snake" | "snakebeta"
    logscale: bool

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros if self.logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,))
        if self.kind == "snake":
            return snake(x, alpha, self.logscale)
        beta = self.param("beta", init, (self.channels,))
        return snake_beta(x, alpha, beta, self.logscale)


class Activation1d(nn.Module):
    """Anti-aliased activation: 2× upsample → snake → 2× downsample.

    The reference wraps *every* nonlinearity in the generator this way
    (bigvgan.py:234-256) — the waveform-rate tensor is processed at 2× rate
    around each activation. ``use_pallas`` routes to the fused kernel.
    """

    channels: int
    kind: str
    logscale: bool
    up_ratio: int = 2
    down_ratio: int = 2
    up_kernel_size: int = 12
    down_kernel_size: int = 12
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros if self.logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,))
        beta = (
            self.param("beta", init, (self.channels,))
            if self.kind == "snakebeta"
            else alpha
        )
        if self.use_pallas:
            from svc_inference_pipeline_tpu.ops.pallas.snake import fused_activation1d

            return fused_activation1d(
                x, alpha, beta, self.kind, self.logscale,
                self.up_ratio, self.down_ratio,
                self.up_kernel_size, self.down_kernel_size,
            )
        y = upsample1d(x, self.up_ratio, self.up_kernel_size)
        if self.kind == "snake":
            y = snake(y, alpha, self.logscale)
        else:
            y = snake_beta(y, alpha, beta, self.logscale)
        return downsample1d(y, self.down_ratio, self.down_kernel_size)


# ---------------------------------------------------------------------------
# Conv helpers with torch semantics
# ---------------------------------------------------------------------------


class _ConvKernel(nn.Module):
    """nn.Conv-compatible parameter holder (kernel [k, Cin, Cout] + bias)."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, cin: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class TorchConv1d(nn.Module):
    """Conv1d with torch's symmetric padding p = d(k-1)/2 (same length).

    Computed as ONE concat-tap matmul ([T, k·Cin] @ [k·Cin, Cout]) instead
    of ``conv_general_dilated`` — XLA's NWC conv lowering runs the big
    dilated vocoder convs at ~18% MXU, the im2col matmul at ~2-3× that
    (profiled on v5e; the same trick the denoiser scan uses). Parameter
    tree is unchanged (``conv/kernel`` [k, Cin, Cout], ``conv/bias``)."""

    features: int
    kernel_size: int
    dilation: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k, d = self.kernel_size, self.dilation
        pad = d * (k - 1) // 2
        cin = x.shape[-1]
        kernel, bias = _ConvKernel(self.features, k, name="conv")(cin)
        dtype = self.dtype or x.dtype
        xb = x.astype(dtype)
        if k == 1:
            y = xb @ kernel[0].astype(dtype)
        else:
            t_len = x.shape[1]
            xp = jnp.pad(xb, [(0, 0), (pad, pad + max(0, d * (k - 1) - 2 * pad)), (0, 0)])
            taps = jnp.concatenate(
                [xp[:, m * d : m * d + t_len] for m in range(k)], axis=-1
            )  # [B, T, k·Cin]
            y = taps @ kernel.reshape(k * cin, self.features).astype(dtype)
        return y + bias.astype(y.dtype)


class TorchConvTranspose1d(nn.Module):
    """ConvTranspose1d(k, stride u, padding (k-u)//2) with torch semantics.

    Output length (T-1)·u − 2p + k = T·u for the BigVGAN configuration.
    Kernel is stored [K, Cout, Cin] (converter maps torch's [Cin, Cout, K]).
    """

    features: int
    kernel_size: int
    stride: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k, u = self.kernel_size, self.stride
        p = (k - u) // 2
        # the polyphase rewrite emits exactly T·u samples, which equals
        # torch's (T−1)·u − 2p + k only when k − 2p == u — true for every
        # BigVGAN config (k = 2u or odd k with p=(k−u)//2 rounding making
        # k−2p==u+1 is NOT supported). Fail loudly outside that family
        # instead of silently changing the output length.
        if k - 2 * p != u:
            raise ValueError(
                f"TorchConvTranspose1d: kernel={k}, stride={u}, padding={p} "
                f"gives torch output length (T-1)*{u} - {2 * p} + {k} != T*{u}; "
                "the polyphase fast path only supports k - 2*(k-u)//2 == u"
            )
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.normal(0.01),
            (k, self.features, cin),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # polyphase decomposition as matmuls: torch's
        #   y[o] = Σ_{i: 0 ≤ o+p−u·i < k} x[i] @ K[o+p−u·i]ᵀ
        # at o = u·t + r becomes, with j = t − i,
        #   y_r[t] = Σ_j x[t−j] @ K[u·j + r + p]ᵀ  (j spans ≤ ⌈k/u⌉ values)
        # — u phase matmuls interleaved by reshape, instead of XLA's
        # lhs-dilated conv over a half-zeros input (measured ~2× faster)
        dtype = self.dtype or x.dtype
        t_len = x.shape[1]
        max_j = (k - 1) // u + 1
        xp = jnp.pad(x.astype(dtype), [(0, 0), (max_j, max_j), (0, 0)])
        phases = []
        for r in range(u):
            acc = None
            for j in range(-max_j, max_j + 1):
                m = u * j + r + p
                if not (0 <= m < k):
                    continue
                w = kernel[m].T.astype(dtype)  # [Cin, Cout]
                seg = xp[:, max_j - j : max_j - j + t_len] @ w
                acc = seg if acc is None else acc + seg
            phases.append(acc)
        y = jnp.stack(phases, axis=2).reshape(x.shape[0], t_len * u, self.features)
        return y + bias.astype(y.dtype)


# ---------------------------------------------------------------------------
# AMP blocks + generator
# ---------------------------------------------------------------------------


class _ActParams(nn.Module):
    """alpha/beta holder with Activation1d-compatible param paths."""

    channels: int
    kind: str
    logscale: bool

    @nn.compact
    def __call__(self):
        init = nn.initializers.zeros if self.logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,))
        beta = (
            self.param("beta", init, (self.channels,))
            if self.kind == "snakebeta"
            else alpha
        )
        return alpha, beta


class _KernelBias(nn.Module):
    features: int
    kernel_size: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.normal(0.01),
            (self.kernel_size, self.features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _ConvParams(nn.Module):
    """kernel/bias holder at TorchConv1d-compatible param paths
    (<name>/conv/{kernel [k,Cin,Cout], bias}) — the converter layout."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self):
        return _KernelBias(self.features, self.kernel_size, name="conv")()


class _AMPBlockParams(nn.Module):
    """Parameter holder matching AMPBlock1's exact param tree
    (act1_j/alpha, conv1_j/conv/kernel, …) for the stage-fused Pallas path.

    Returns a tuple over pairs of (w1, b1, w2, b2, alpha1, beta1, alpha2,
    beta2) — the layout ops/pallas/amp_stage.fused_amp_stage consumes."""

    cfg: Any
    channels: int
    kernel_size: int
    dilations: Sequence[int]

    @nn.compact
    def __call__(self):
        kind = self.cfg.activation
        logscale = self.cfg.snake_logscale
        pairs = []
        for j in range(len(self.dilations)):
            a1, b1 = _ActParams(self.channels, kind, logscale, name=f"act1_{j}")()
            a2, b2 = _ActParams(self.channels, kind, logscale, name=f"act2_{j}")()
            w1, bias1 = _ConvParams(self.channels, self.kernel_size, name=f"conv1_{j}")()
            w2, bias2 = _ConvParams(self.channels, self.kernel_size, name=f"conv2_{j}")()
            pairs.append((w1, bias1, w2, bias2, a1, b1, a2, b2))
        return tuple(pairs)


class AMPBlock1(nn.Module):
    """3 × (dilated conv + plain conv), 6 anti-aliased activations
    (bigvgan.py:310-439)."""

    cfg: Any
    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)
    use_pallas: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        kind = self.cfg.activation
        logscale = self.cfg.snake_logscale
        # narrow-channel stages (C ≤ 128): the whole act→conv→act→conv→add
        # pair runs as one fused Pallas kernel — XLA's NWC convs pad channels
        # to 128 lanes, making these stages per-op-overhead bound
        fuse_pair = self.use_pallas and self.channels <= 384
        for j, d in enumerate(self.dilations):
            if fuse_pair:
                from svc_inference_pipeline_tpu.ops.pallas.amp_pair import fused_amp_pair

                c = self.channels
                # param holders keep the exact converter paths
                # (act1_j/alpha, conv1_j/conv/kernel, …)
                a1, b1 = _ActParams(c, kind, logscale, name=f"act1_{j}")()
                a2, b2 = _ActParams(c, kind, logscale, name=f"act2_{j}")()
                w1, bias1 = _ConvParams(c, self.kernel_size, name=f"conv1_{j}")()
                w2, bias2 = _ConvParams(c, self.kernel_size, name=f"conv2_{j}")()
                x = fused_amp_pair(
                    x, w1, bias1, w2, bias2, a1, b1, a2, b2,
                    k=self.kernel_size, d=d, kind=kind, logscale=logscale,
                )
                continue
            xt = Activation1d(
                self.channels, kind, logscale, name=f"act1_{j}", use_pallas=self.use_pallas
            )(x)
            xt = TorchConv1d(self.channels, self.kernel_size, d, name=f"conv1_{j}", dtype=self.dtype)(xt)
            xt = Activation1d(
                self.channels, kind, logscale, name=f"act2_{j}", use_pallas=self.use_pallas
            )(xt)
            xt = TorchConv1d(self.channels, self.kernel_size, 1, name=f"conv2_{j}", dtype=self.dtype)(xt)
            x = xt + x
        return x


class AMPBlock2(nn.Module):
    """2 × dilated conv variant (bigvgan.py:442-516)."""

    cfg: Any
    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3)
    use_pallas: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        kind = self.cfg.activation
        logscale = self.cfg.snake_logscale
        for j, d in enumerate(self.dilations):
            xt = Activation1d(
                self.channels, kind, logscale, name=f"act_{j}", use_pallas=self.use_pallas
            )(x)
            xt = TorchConv1d(self.channels, self.kernel_size, d, name=f"conv_{j}", dtype=self.dtype)(xt)
            x = xt + x
        return x


class BigVGANGenerator(nn.Module):
    """mel [B, T, n_mels] → waveform [B, T×256] (bigvgan.py:519-632).

    ``cfg`` is the vocoder config subtree. ``use_pallas`` enables the fused
    Activation1d kernel on TPU.
    """

    cfg: Any
    use_pallas: bool = False
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        dtype = self.compute_dtype or mel.dtype
        num_kernels = len(cfg.resblock_kernel_sizes)
        block_cls = AMPBlock1 if cfg.resblock == "1" else AMPBlock2

        x = TorchConv1d(cfg.upsample_initial_channel, 7, name="conv_pre", dtype=dtype)(
            mel.astype(dtype)
        )

        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            x = TorchConvTranspose1d(ch, k, u, name=f"up_{i}", dtype=dtype)(x)
            # EVERY stage runs as ONE fused Pallas kernel — 18 convs,
            # 18 snake sandwiches, residuals and the mean per launch
            # (ops/pallas/amp_stage.py). C ≤ 64 phase-packs time-steps
            # into the idle lanes; C = 768 streams its weights from HBM
            # one conv at a time (the full set would blow VMEM).
            fuse_stage = (
                self.use_pallas and ch <= 768 and cfg.resblock == "1"
            )
            if fuse_stage:
                from svc_inference_pipeline_tpu.ops.pallas.amp_stage import fused_amp_stage

                block_params = tuple(
                    _AMPBlockParams(cfg, ch, rk, tuple(rd), name=f"resblock_{i}_{j}")()
                    for j, (rk, rd) in enumerate(
                        zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
                    )
                )
                x = fused_amp_stage(
                    x,
                    block_params,
                    ks=tuple(cfg.resblock_kernel_sizes),
                    dils_per_block=tuple(
                        tuple(rd) for rd in cfg.resblock_dilation_sizes
                    ),
                    kind=cfg.activation,
                    logscale=cfg.snake_logscale,
                )
                continue
            acc = None
            for j, (rk, rd) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
            ):
                y = block_cls(
                    cfg,
                    ch,
                    rk,
                    tuple(rd),
                    name=f"resblock_{i}_{j}",
                    use_pallas=self.use_pallas,
                    dtype=dtype,
                )(x)
                acc = y if acc is None else acc + y
            x = acc / num_kernels

        x = Activation1d(
            ch, cfg.activation, cfg.snake_logscale, name="activation_post",
            use_pallas=self.use_pallas,
        )(x)
        x = TorchConv1d(1, 7, name="conv_post", dtype=dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))[..., 0]


def vocoder_output_to_audio(wave: jnp.ndarray, n_frames: int, hop_length: int) -> jnp.ndarray:
    """Trim to frames×hop and apply the reference's 20-frame linear fade-out
    (modules/bigvgan_inference.py:33-42)."""
    n = n_frames * hop_length
    wave = wave[..., :n]
    fade_len = 20 * hop_length
    fade = jnp.linspace(1.0, 0.0, fade_len)
    return wave.at[..., -fade_len:].multiply(fade)


def vocoder_output_finalize(
    wave: jnp.ndarray,  # [B, padded_frames*hop]
    n_true: jnp.ndarray,  # [B] int32 — true frame count per row
    hop_length: int,
    pcm16: bool = False,
    volume_peak: float = 0.9,
) -> jnp.ndarray:
    """Device-side output finalisation at the TRUE (unpadded) length.

    Masked form of the reference's post-processing so it runs inside the
    one jit on padded shapes: the 20-frame linear fade-out + trim-to-zero
    (modules/bigvgan_inference.py:33-42), and optionally the WAV writer's
    peak-normalise-to-0.9 + PCM16 quantisation (utils/util.py:20-37) — with
    ``pcm16`` the fetched bytes are exactly the WAV payload, halving the
    host transfer over the device↔host link.
    """
    fade_len = 20 * hop_length
    idx = jnp.arange(wave.shape[-1])[None, :]
    n_end = (n_true.astype(jnp.int32) * hop_length)[:, None]
    j = (idx - (n_end - fade_len)).astype(jnp.float32)
    # linspace(1, 0, L)[j] = 1 − j/(L−1); 1 before the window, 0 past the end
    factor = jnp.clip(1.0 - j / (fade_len - 1), 0.0, 1.0)
    factor = jnp.where(idx >= n_end, 0.0, factor)
    wave = wave * factor
    if not pcm16:
        return wave
    peak = jnp.max(jnp.abs(wave), axis=-1, keepdims=True)
    scale = jnp.where(peak > 0, volume_peak / jnp.maximum(peak, 1e-30), 1.0)
    pcm = jnp.clip(jnp.round(wave * scale * 32767.0), -32768, 32767)
    return pcm.astype(jnp.int16)
