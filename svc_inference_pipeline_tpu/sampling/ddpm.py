"""Ancestral DDPM sampling as a single ``jax.lax.scan``.

The reference runs a 1000-iteration Python loop launching ~60 torch kernels
per step (/root/reference/modules/diffsvcrepo_inference.py:234-235) and
churns layouts between [B,T,M] and [B,1,M,T] every step (:66-68). Here the
whole reverse process is ONE compiled scan over precomputed schedule arrays
in a fixed [B,T,M] layout: XLA fuses each step body and the loop runs
entirely on device.

Numeric contract preserved (diffsvcrepo_inference.py:36-88,207-214):
* init noise x_T ~ N(0, (1/1.2)²) — not N(0,1),
* x̂₀ clamped to [−1, 1],
* posterior mean c₁·x̂₀ + c₂·x_t, noise scaled by exp(½ log σ²),
* no noise injected at t = 0.

PRNG: deterministic `jax.random` keys split per step (replacing
torch.normal global-state draws).
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

from svc_inference_pipeline_tpu.sampling.schedule import DiffusionSchedule

INIT_NOISE_STD = 1.0 / 1.2  # diffsvcrepo_inference.py:209

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def p_sample_step(
    denoise_fn: DenoiseFn,
    schedule: DiffusionSchedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    cond: jnp.ndarray,
    key: jax.Array,
    clip_denoised: bool = True,
) -> jnp.ndarray:
    """One reverse step x_t → x_{t−1}. ``t`` is a scalar int array."""
    b = x.shape[0]
    t_b = jnp.full((b, 1), t, dtype=jnp.int32)
    eps = denoise_fn(x, cond, t_b)

    x0 = schedule.sqrt_recip_alphas_cumprod[t] * x - schedule.sqrt_recipm1_alphas_cumprod[t] * eps
    if clip_denoised:
        x0 = jnp.clip(x0, -1.0, 1.0)

    mean = schedule.posterior_mean_coef1[t] * x0 + schedule.posterior_mean_coef2[t] * x
    log_var = schedule.posterior_log_variance_clipped[t]
    noise = jax.random.normal(key, x.shape, dtype=x.dtype)
    nonzero = (t > 0).astype(x.dtype)
    return mean + nonzero * jnp.exp(0.5 * log_var) * noise


def ddpm_sample(
    denoise_fn: DenoiseFn,
    cond: jnp.ndarray,
    key: jax.Array,
    shape: Sequence[int],
    schedule: DiffusionSchedule,
    clip_denoised: bool = True,
    unroll: int = 8,
) -> jnp.ndarray:
    """Full reverse process → x₀ of ``shape`` [B, T, M].

    ``denoise_fn(x [B,T,M], cond [B,T,D], t [B,1]) → ε [B,T,M]``.
    ``unroll`` duplicates the step body in the compiled loop (identical
    numerics; measured ~9% faster at unroll=8 on v5e — amortised loop
    bookkeeping and cross-step scheduling). The largest divisor of
    ``num_steps`` not exceeding it is used.
    """
    num_steps = schedule.num_steps
    key, init_key = jax.random.split(key)
    x = INIT_NOISE_STD * jax.random.normal(init_key, tuple(shape), dtype=jnp.float32)

    step_keys = jax.random.split(key, num_steps)

    def body(x, inp):
        t, k = inp
        x = p_sample_step(denoise_fn, schedule, x, t, cond, k, clip_denoised)
        return x, None

    ts = jnp.arange(num_steps - 1, -1, -1, dtype=jnp.int32)
    unroll_eff = max(u for u in range(1, unroll + 1) if num_steps % u == 0)
    x, _ = jax.lax.scan(body, x, (ts, step_keys), unroll=unroll_eff)
    return x


def ddpm_training_loss(
    denoise_fn: DenoiseFn,
    x0: jnp.ndarray,
    cond: jnp.ndarray,
    key: jax.Array,
    schedule: DiffusionSchedule,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ε-prediction MSE at a uniformly sampled step (training objective).

    The reference ships no exercised training path (SURVEY §2.9); this is
    the standard DiffSVC/DiffWave objective matching the denoiser contract.
    Returns (loss, t) for logging.
    """
    b = x0.shape[0]
    t_key, n_key = jax.random.split(key)
    t = jax.random.randint(t_key, (b,), 0, schedule.num_steps)
    noise = jax.random.normal(n_key, x0.shape, dtype=x0.dtype)
    x_t = schedule.q_sample(x0, t, noise)
    eps = denoise_fn(x_t, cond, t[:, None])
    loss = jnp.mean(jnp.square(eps - noise))
    return loss, t
