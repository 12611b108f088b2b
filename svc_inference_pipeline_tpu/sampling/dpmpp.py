"""DPM-Solver++(2M) sampling (Lu et al. 2022) — high-order fast path.

No reference counterpart (its only fast path is the broken PLMS,
/root/reference/modules/diffsvcrepo_inference.py:91-151). A second-order
multistep exponential-integrator in x̂₀ space: at the same step count it
tracks the full trajectory closer than PLMS/DDIM, so speedups of 10-50×
keep more of the 1000-step quality.

Math (VP diffusion, ε-prediction model):
    α_t = √ᾱ_t,  σ_t = √(1−ᾱ_t),  λ_t = log(α_t/σ_t)
    x̂₀ = (x − σ_t ε̂)/α_t
    h_i = λ_{t_next} − λ_t               (> 0 toward data)
    D_i = (1 + 1/(2r_i)) x̂₀_i − 1/(2r_i) x̂₀_{i−1},  r_i = h_{i−1}/h_i
          (first step: D = x̂₀ — the first-order update, ≡ DDIM η=0)
    x_{t_next} = (σ_{t_next}/σ_t) x − α_{t_next}·expm1(−h_i)·D_i

Timestep grid: endpoint-inclusive ``linspace(T−1, 0, n)`` — unlike the
strided ``arange`` convention (ddim/plms, inherited from the reference),
the first solver step always starts at the highest-noise time T−1, so
the integrated λ-range does not shrink as the stride grows. Order-of-
convergence and DDIM-equivalence are oracle-tested (tests/test_sampling).

One ``lax.scan`` with a (x, x̂₀_prev, h_prev, first) carry; the same
denoiser contract as ddpm/plms/ddim, so it drives the fused Pallas
kernel unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from svc_inference_pipeline_tpu.sampling.ddpm import INIT_NOISE_STD, DenoiseFn
from svc_inference_pipeline_tpu.sampling.schedule import DiffusionSchedule


def dpmpp_timesteps(num_steps: int, speedup: int) -> np.ndarray:
    """Endpoint-inclusive descending grid: ≈ num_steps/speedup solver
    steps from T−1 down to 0."""
    n = max(2, int(round(num_steps / max(speedup, 1))) + 1)
    ts = np.round(np.linspace(num_steps - 1, 0, n)).astype(np.int64)
    return np.unique(ts)[::-1].copy()


def dpmpp_sample(
    denoise_fn: DenoiseFn,
    cond: jnp.ndarray,
    key: jax.Array,
    shape: Sequence[int],
    schedule: DiffusionSchedule,
    speedup: int = 10,
    order: int = 2,
    clip_denoised: bool = True,
    timesteps: Optional[Sequence[int]] = None,
) -> jnp.ndarray:
    """DPM-Solver++ reverse process → x₀ [B, T, M].

    ``order=2`` is the 2M multistep solver; ``order=1`` is the first-order
    update (numerically identical to DDIM η=0 on the same grid, tested).
    ``timesteps`` overrides the grid (descending, last entry 0)."""
    assert order in (1, 2), order
    num_steps = schedule.num_steps
    if timesteps is None:
        ts = dpmpp_timesteps(num_steps, speedup)
    else:
        ts = np.asarray(timesteps, dtype=np.int64)
        assert (np.diff(ts) < 0).all() and ts[-1] == 0, "descending grid ending at 0"
    # (t, t_next) transition pairs; the final (0, 0) row triggers the
    # x̂₀ projection that ends the trajectory
    t_next = np.append(ts[1:], 0)

    # same key discipline as ddim_sample (deterministic solver, but the
    # init draw matches DDIM's for the same key)
    key, init_key = jax.random.split(key)
    x = INIT_NOISE_STD * jax.random.normal(init_key, tuple(shape), dtype=jnp.float32)
    b = shape[0]

    a_cum = schedule.alphas_cumprod
    alphas = jnp.sqrt(a_cum)
    sigmas = jnp.sqrt(1.0 - a_cum)
    lambdas = jnp.log(alphas / sigmas)

    def body(carry, inp):
        x, x0_prev, h_prev, first = carry
        t, tn = inp
        t_b = jnp.full((b, 1), t, dtype=jnp.int32)
        eps = denoise_fn(x, cond, t_b)

        x0 = (x - sigmas[t] * eps) / alphas[t]
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)

        h = lambdas[tn] - lambdas[t]
        if order == 2:
            # 2M extrapolation from the previous x̂₀ (first step: r term off)
            r = h_prev / jnp.where(h == 0.0, 1.0, h)
            c = jnp.where(first, 0.0, 1.0 / (2.0 * jnp.maximum(r, 1e-20)))
            d = (1.0 + c) * x0 - c * x0_prev
        else:
            d = x0
        x_next = (sigmas[tn] / sigmas[t]) * x - alphas[tn] * jnp.expm1(-h) * d
        # final step (t == 0): the trajectory ends at x̂₀
        x_next = jnp.where(t == 0, x0, x_next)
        return (x_next, x0, h, jnp.zeros((), bool)), None

    carry = (x, jnp.zeros_like(x), jnp.zeros((), jnp.float32), jnp.ones((), bool))
    xs = (jnp.asarray(ts, dtype=jnp.int32), jnp.asarray(t_next, dtype=jnp.int32))
    (x, _, _, _), _ = jax.lax.scan(body, carry, xs)
    return x
