"""DDIM sampling (Song et al. 2021) — deterministic fast path.

No reference counterpart (its only fast path is the broken PLMS,
diffsvcrepo_inference.py:91-151); provided as a third sampler family:
deterministic (η=0) or stochastic (η>0) strided sampling with the same
denoiser contract as ddpm/plms.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from svc_inference_pipeline_tpu.sampling.ddpm import INIT_NOISE_STD, DenoiseFn
from svc_inference_pipeline_tpu.sampling.schedule import DiffusionSchedule


def ddim_sample(
    denoise_fn: DenoiseFn,
    cond: jnp.ndarray,
    key: jax.Array,
    shape: Sequence[int],
    schedule: DiffusionSchedule,
    speedup: int = 10,
    eta: float = 0.0,
    clip_denoised: bool = True,
) -> jnp.ndarray:
    """DDIM reverse process with stride ``speedup`` → x₀ [B, T, M].

    x_{t−s} = √ᾱ_{t−s}·x̂₀ + √(1−ᾱ_{t−s}−σ²)·ε̂ + σ·z,
    σ = η·√((1−ᾱ_{t−s})/(1−ᾱ_t))·√(1−ᾱ_t/ᾱ_{t−s}).
    """
    num_steps = schedule.num_steps
    ts = np.arange(0, num_steps, speedup)[::-1].copy()

    key, init_key = jax.random.split(key)
    x = INIT_NOISE_STD * jax.random.normal(init_key, tuple(shape), dtype=jnp.float32)
    step_keys = jax.random.split(key, len(ts))
    b = shape[0]

    a_cum = schedule.alphas_cumprod

    def body(x, inp):
        t, k = inp
        t_prev = jnp.maximum(t - speedup, 0)
        t_b = jnp.full((b, 1), t, dtype=jnp.int32)
        eps = denoise_fn(x, cond, t_b)

        a_t = a_cum[t]
        # ᾱ before step 0 is 1 (x₀ itself)
        a_prev = jnp.where(t_prev == t, a_cum[0], a_cum[t_prev])
        a_prev = jnp.where(t == 0, 1.0, a_prev)

        x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)

        sigma = (
            eta
            * jnp.sqrt((1.0 - a_prev) / (1.0 - a_t))
            * jnp.sqrt(1.0 - a_t / a_prev)
        )
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * eps
        noise = jax.random.normal(k, x.shape, dtype=x.dtype)
        x_next = jnp.sqrt(a_prev) * x0 + dir_xt + sigma * noise * (t > 0)
        return x_next, None

    x, _ = jax.lax.scan(body, x, (jnp.asarray(ts, dtype=jnp.int32), step_keys))
    return x
