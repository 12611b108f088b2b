"""Sampling-optimised DiffSVC denoiser: per-step work only.

During the reverse process the conditioner and the diffusion-step encoder
outputs are CONSTANT given (cond, t) — yet the reference (and the naive
module) recompute, per step: 20 conditioner 1×1 convs (≈20% of step FLOPs)
and the step-embedding MLP. This module hoists everything that does not
depend on x_t out of the scan:

* ``precompute(params, cond, num_steps)`` →
    - cond_projs  [L, B, T, 2C] — all layers' conditioner projections,
    - step_rows   [S, L, C]     — all steps' diffusion projections,
* ``denoise_step(params, pre, x, t)`` — the remaining x-dependent math,
  numerically IDENTICAL to ``DiffSVCDenoiser.__call__`` (parity-tested).

Works directly on the converted parameter pytree (same layout as the flax
module), so checkpoints need no extra conversion.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from svc_inference_pipeline_tpu.models.diffsvc import step_embedding


class Precomputed(NamedTuple):
    cond_projs: jnp.ndarray  # [L, B, T, 2C]
    step_rows: jnp.ndarray  # [S, L, C]


def _dense(p, x):
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def precompute(params: Any, cond: jnp.ndarray, num_steps: int, cfg,
               compute_dtype=jnp.bfloat16) -> Precomputed:
    """Hoist all (cond, t)-only work out of the sampling scan."""
    L = cfg.residual_layer_num
    cond = cond.astype(compute_dtype)
    cond_projs = jnp.stack(
        [_dense(params[f"residual_{i}"]["conditioner_projection"], cond) for i in range(L)]
    )  # [L, B, T, 2C]

    ts = jnp.arange(num_steps, dtype=jnp.float32)
    emb = step_embedding(ts, 128)  # [S, 128] f32 (matches StepEncoder)
    h = jax.nn.silu(_dense(params["diffusion_embedding"]["projection1"], emb))
    h = jax.nn.silu(_dense(params["diffusion_embedding"]["projection2"], h))
    h = h.astype(compute_dtype)
    step_rows = jnp.stack(
        [_dense(params[f"residual_{i}"]["diffusion_projection"], h) for i in range(L)],
        axis=1,
    )  # [S, L, C]
    return Precomputed(cond_projs, step_rows)


def denoise_step(params: Any, pre: Precomputed, x: jnp.ndarray, t: jnp.ndarray,
                 cfg, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """ε(x_t, ·, t) using precomputed conditioning. ``t`` is a scalar index."""
    L = cfg.residual_layer_num
    c = cfg.residual_channels

    h = jax.nn.relu(_dense(params["mel_preprocess"], x.astype(compute_dtype)))
    steps_t = pre.step_rows[t]  # [L, C]

    t_len = x.shape[1]
    skip_sum = jnp.zeros((*h.shape[:-1], c), dtype=jnp.float32)
    for i in range(L):
        p = params[f"residual_{i}"]
        y = h + steps_t[i]
        d = 2 ** (i % cfg.dilation_cycle_length)
        # dilated k=3 conv as three shifted matmuls (im2col) — measured ~13%
        # faster than lax.conv at these shapes (B=1, T≈1k, MXU-bound)
        w = p["dilated_conv"]["kernel"].astype(compute_dtype)  # [3, C, 2C]
        if cfg.residual_kernel_size == 3:
            # concat-tap im2col: ONE [T,3C]@[3C,2C] matmul instead of three
            # summed [T,C]@[C,2C] — measured ~5% faster per DDPM step on v5e
            # (deeper K amortises MXU ramp; fewer f32 accumulator merges)
            yp = jnp.pad(y, [(0, 0), (d, d), (0, 0)])
            y3 = jnp.concatenate(
                [yp[:, :t_len], yp[:, d : d + t_len], yp[:, 2 * d : 2 * d + t_len]],
                axis=-1,
            )  # [B, T, 3C]
            y = y3 @ w.reshape(3 * w.shape[1], w.shape[2])
        else:
            y = jax.lax.conv_general_dilated(
                y, w, (1,), [(d * (cfg.residual_kernel_size - 1) // 2,) * 2],
                rhs_dilation=(d,), dimension_numbers=("NWC", "WIO", "NWC"),
            )
        y = y + p["dilated_conv"]["bias"].astype(compute_dtype)
        y = y + pre.cond_projs[i]
        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        y = _dense(p["output_projection"], y)
        residual, skip = jnp.split(y, 2, axis=-1)
        h = (h + residual) * np.float32(1.0 / math.sqrt(2.0)).astype(compute_dtype)
        skip_sum = skip_sum + skip.astype(jnp.float32)

    out = skip_sum * np.float32(1.0 / math.sqrt(L))
    out = jax.nn.relu(_dense(params["skip_projection"], out.astype(compute_dtype)))
    out = _dense(params["output_projection"], out)
    return out.astype(jnp.float32)


def make_fast_denoise_fn(params: Any, cond: jnp.ndarray, num_steps: int, cfg,
                         compute_dtype=jnp.bfloat16):
    """(denoise_fn compatible with the samplers, closing over hoisted state).

    The returned fn takes ``t`` as [B, 1] like the module-based path but
    only uses t[0, 0] (single shared step per batch — true for all
    samplers here and for the reference, diffsvcrepo_inference.py:228,235).
    """
    pre = precompute(params, cond, num_steps, cfg, compute_dtype)

    def fn(x, _cond_unused, t):
        return denoise_step(params, pre, x, t[0, 0], cfg, compute_dtype)

    return fn
