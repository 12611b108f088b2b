"""Fused anti-aliased snake activation — Pallas TPU kernel.

BigVGAN wraps every nonlinearity in (2× sinc upsample → snake → 2× sinc
downsample) (/root/reference/modules/bigvgan.py:234-256). Composed from XLA
ops that is 3 depthwise convolutions plus a materialised 2×-rate
intermediate — these sandwiches (36 per generator forward) dominate the
vocoder's HBM traffic.

This kernel fuses the full sandwich into ONE VMEM pass per tile:

* the ratio-2 transposed conv splits into two 6-tap polyphase FIRs
  (even/odd output phases) evaluated as static shifted slices,
* snake/snakebeta applied in-register on each phase,
* the 12-tap low-pass decimator folds into 6 taps per phase — the
  2×-rate signal never exists in memory.

Derivation (UpSample1d/DownSample1d exact semantics, bigvgan.py:259-307):
with x_p = edge-pad(x, 5) and h the 12-tap kaiser-sinc filter,
    even[j] = 2·Σ_{m=2..7} x[j+m−5]·h[15−2m]
    odd[j]  = 2·Σ_{m=3..8} x[j+m−5]·h[16−2m]
    out[j]  = Σ_{m=0..5} snake(odd)[j+m−3]·h[2m] + snake(even)[j+m−2]·h[2m+1]
so out[0..T) needs x[−8..T+8) — a ±8 halo, applied globally by the caller
(edge mode) so tile boundaries see the true signal edge. Tiles stream
HBM→VMEM by explicit async DMA with the halo overlap.

HBM traffic: read T·C·4 bytes (+halo), write T·C·4 — the floor.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from svc_inference_pipeline_tpu.models import bigvgan as _bg

HALO = 8
LANE = 128


def _phase_taps(kernel_size: int = 12, ratio: int = 2):
    """Per-phase tap lists of the up/down filters (python floats — the taps
    are compile-time constants baked into the kernel)."""
    h = _bg.kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    even_up = [float(h[15 - 2 * m]) for m in range(2, 8)]
    odd_up = [float(h[16 - 2 * m]) for m in range(3, 9)]
    down_odd = [float(h[2 * m]) for m in range(6)]
    down_even = [float(h[2 * m + 1]) for m in range(6)]
    return even_up, odd_up, down_even, down_odd


def _make_kernel(t_tile: int, even_up, odd_up, down_even, down_odd):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from svc_inference_pipeline_tpu.ops.pallas.amp_stage import _sin2_coeffs

    sin2_c = _sin2_coeffs()
    inv_pi = float(1.0 / np.pi)

    def sin2(u):
        """sin²(u) via range-reduced even polynomial (see amp_stage.sin2) —
        ~4× cheaper than the transcendental sin lowering on the VPU."""
        r = u * inv_pi
        y = r - jnp.floor(r + 0.5)
        t = y * y
        c = sin2_c[0]
        for coef in sin2_c[1:]:
            c = c * t + coef
        return 0.5 - 0.5 * c

    n_phase = t_tile + 6  # rows of each up-phase feeding the decimator

    def kernel(x_hbm, alpha_ref, inv_beta_ref, out_ref):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        ci = pl.program_id(2)

        def body(tile_ref, sem):
            dma = pltpu.make_async_copy(
                x_hbm.at[
                    bi,
                    pl.ds(ti * t_tile, t_tile + 2 * HALO),
                    pl.ds(ci * LANE, LANE),
                ],
                tile_ref,
                sem,
            )
            dma.start()
            dma.wait()
            tile = tile_ref[:]  # [t_tile + 16, LANE]
            alpha = alpha_ref[0]  # [1, LANE]
            inv_beta = inv_beta_ref[0]

            # filter + activation in f32 — Mosaic has no bf16 sin lowering,
            # and the periodic activation wants the precision anyway
            tile32 = tile.astype(jnp.float32)
            even = tile32[2 : 2 + n_phase, :] * even_up[0]
            odd = tile32[3 : 3 + n_phase, :] * odd_up[0]
            for m in range(1, 6):
                even = even + tile32[m + 2 : m + 2 + n_phase, :] * even_up[m]
                odd = odd + tile32[m + 3 : m + 3 + n_phase, :] * odd_up[m]

            # ×2 transposed-conv gain, then the periodic activation
            even = 2.0 * even
            odd = 2.0 * odd
            alpha32 = alpha.astype(jnp.float32)
            inv_beta32 = inv_beta.astype(jnp.float32)
            even = even + inv_beta32 * sin2(even * alpha32)
            odd = odd + inv_beta32 * sin2(odd * alpha32)

            out = odd[0:t_tile, :] * down_odd[0] + even[1 : 1 + t_tile, :] * down_even[0]
            for m in range(1, 6):
                out = out + odd[m : m + t_tile, :] * down_odd[m]
                out = out + even[m + 1 : m + 1 + t_tile, :] * down_even[m]
            out_ref[0] = out.astype(out_ref.dtype)

        pl.run_scoped(
            body,
            pltpu.VMEM((t_tile + 2 * HALO, LANE), out_ref.dtype),
            pltpu.SemaphoreType.DMA,
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("kind", "logscale", "t_tile", "interpret"))
def _fused_impl(
    x: jnp.ndarray,  # [B, T, C]
    alpha: jnp.ndarray,  # [C]
    beta: jnp.ndarray,  # [C]
    kind: str,
    logscale: bool,
    t_tile: int,
    interpret: bool,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = interpret or jax.default_backend() != "tpu"

    b, t, c = x.shape
    dtype = x.dtype

    if logscale:
        alpha_eff = jnp.exp(alpha)
        beta_eff = jnp.exp(beta) if kind == "snakebeta" else alpha_eff
    else:
        alpha_eff = alpha
        beta_eff = beta if kind == "snakebeta" else alpha
    inv_beta = 1.0 / (beta_eff + 1e-9)

    t_pad = -(-t // t_tile) * t_tile
    c_pad = -(-c // LANE) * LANE
    xp = jnp.pad(x, [(0, 0), (HALO, HALO), (0, 0)], mode="edge")
    xp = jnp.pad(xp, [(0, 0), (0, t_pad - t), (0, c_pad - c)])
    alpha_p = jnp.pad(alpha_eff, (0, c_pad - c), constant_values=1.0).astype(dtype)
    inv_beta_p = jnp.pad(inv_beta, (0, c_pad - c), constant_values=1.0).astype(dtype)

    kernel = _make_kernel(t_tile, *_phase_taps())
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c_pad), dtype),
        grid=(b, t_pad // t_tile, c_pad // LANE),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM, DMA'd manually
            pl.BlockSpec((1, 1, LANE), lambda bi, ti, ci: (0, 0, ci), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANE), lambda bi, ti, ci: (0, 0, ci), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t_tile, LANE), lambda bi, ti, ci: (bi, ti, ci), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xp, alpha_p[None, None, :], inv_beta_p[None, None, :])
    return out[:, :t, :c]


def fused_activation1d(
    x: jnp.ndarray,
    alpha: jnp.ndarray,
    beta: jnp.ndarray,
    kind: str = "snakebeta",
    logscale: bool = True,
    up_ratio: int = 2,
    down_ratio: int = 2,
    up_kernel_size: int = 12,
    down_kernel_size: int = 12,
    t_tile: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for models.bigvgan.Activation1d's XLA path.

    Only the production configuration (ratio 2/2, kernels 12/12) is fused;
    other shapes fall back to the composed XLA ops.
    """
    if (up_ratio, down_ratio, up_kernel_size, down_kernel_size) != (2, 2, 12, 12):
        y = _bg.upsample1d(x, up_ratio, up_kernel_size)
        if kind == "snake":
            y = _bg.snake(y, alpha, logscale)
        else:
            y = _bg.snake_beta(y, alpha, beta, logscale)
        return _bg.downsample1d(y, down_ratio, down_kernel_size)

    if t_tile is None:
        t = x.shape[1]
        t_tile = max(256, min(2048, -(-t // 256) * 256 // max(t // 2048, 1)))
        t_tile = min(t_tile, 2048)
    out = _fused_impl(x, alpha, beta, kind, logscale, t_tile, interpret)

    # Boundary semantics: the composed path replicate-pads the UPSAMPLED
    # signal for the decimator while the fused kernel extends x through the
    # upsampler — they differ on the outer 3 samples each side. Patch those
    # six samples with the exact composed computation on 16-sample slices.
    def _exact(seg):
        y = _bg.upsample1d(seg, 2, 12)
        if kind == "snake":
            y = _bg.snake(y, alpha, logscale)
        else:
            y = _bg.snake_beta(y, alpha, beta, logscale)
        return _bg.downsample1d(y, 2, 12)

    edge = min(16, x.shape[1])
    head = _exact(x[:, :edge, :])[:, :3, :].astype(out.dtype)
    tail = _exact(x[:, -edge:, :])[:, -3:, :].astype(out.dtype)
    out = out.at[:, :3, :].set(head).at[:, -3:, :].set(tail)
    return out
