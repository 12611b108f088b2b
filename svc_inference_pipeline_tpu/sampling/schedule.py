"""Diffusion noise schedule and derived constants — pure and precomputed.

The reference rebuilds these as module-level torch globals on every
inference call (/root/reference/modules/diffsvcrepo_inference.py:8-17,
163-197) and mutates the config to store the schedule
(modules/diffsvc.py:248-252). Here the schedule is an immutable pytree
computed once in float64 and cast to f32, usable inside jit/scan.

Contract (diffsvcrepo_inference.py:169-197):
    betas           = linspace(1e-4, 0.02, 1000)      (from factors)
    alphas          = 1 − betas
    ᾱ_t             = cumprod(alphas)
    ᾱ_{t−1}         = [1, ᾱ_0 … ᾱ_{T−2}]
    √(1/ᾱ), √(1/ᾱ−1)                                   (x₀ prediction)
    c₁ = β√ᾱ_{t−1}/(1−ᾱ),  c₂ = (1−ᾱ_{t−1})√α/(1−ᾱ)   (posterior mean)
    σ² = β(1−ᾱ_{t−1})/(1−ᾱ),  log σ² clipped at 1e-20
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class DiffusionSchedule:
    """Precomputed DDPM constants, all shape [T] float32."""

    def __init__(self, **arrays):
        self.__dict__.update(arrays)

    # pytree protocol -----------------------------------------------------
    def tree_flatten(self):
        keys = sorted(self.__dict__.keys())
        return tuple(self.__dict__[k] for k in keys), keys

    @classmethod
    def tree_unflatten(cls, keys, values):
        return cls(**dict(zip(keys, values)))

    # constructors --------------------------------------------------------
    @classmethod
    def from_betas(cls, betas: np.ndarray) -> "DiffusionSchedule":
        betas = np.asarray(betas, dtype=np.float64)
        alphas = 1.0 - betas
        a_cum = np.cumprod(alphas)
        a_prev = np.append(1.0, a_cum[:-1])

        post_var = betas * (1.0 - a_prev) / (1.0 - a_cum)
        arrays = dict(
            betas=betas,
            alphas_cumprod=a_cum,
            alphas_cumprod_prev=a_prev,
            sqrt_alphas_cumprod=np.sqrt(a_cum),
            sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - a_cum),
            sqrt_recip_alphas_cumprod=np.sqrt(1.0 / a_cum),
            sqrt_recipm1_alphas_cumprod=np.sqrt(1.0 / a_cum - 1.0),
            posterior_mean_coef1=betas * np.sqrt(a_prev) / (1.0 - a_cum),
            posterior_mean_coef2=(1.0 - a_prev) * np.sqrt(alphas) / (1.0 - a_cum),
            posterior_log_variance_clipped=np.log(np.maximum(post_var, 1e-20)),
        )
        return cls(**{k: jnp.asarray(v, dtype=jnp.float32) for k, v in arrays.items()})

    @classmethod
    def from_factors(cls, factors) -> "DiffusionSchedule":
        """Linear schedule from [start, end, steps] (config
        ``noise_schedule_factors``; the reference's explicit 1000-entry list
        is this same linspace, modules/diffsvc.py:248-252)."""
        start, end, steps = factors
        return cls.from_betas(np.linspace(start, end, int(steps)))

    @classmethod
    def from_config(cls, mapper_cfg: Any) -> "DiffusionSchedule":
        if "noise_schedule" in mapper_cfg and mapper_cfg.get("noise_schedule"):
            return cls.from_betas(np.asarray(mapper_cfg.noise_schedule))
        return cls.from_factors(mapper_cfg.noise_schedule_factors)

    # training utilities ---------------------------------------------------
    @property
    def num_steps(self) -> int:
        return int(self.betas.shape[0])

    def q_sample(self, x0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        """Forward process: x_t = √ᾱ_t x₀ + √(1−ᾱ_t) ε. ``t`` is [B]."""
        a = self.sqrt_alphas_cumprod[t][:, None, None]
        b = self.sqrt_one_minus_alphas_cumprod[t][:, None, None]
        return a * x0 + b * noise

    def predict_start_from_noise(self, x_t, t, noise):
        """x̂₀ = √(1/ᾱ_t)·x_t − √(1/ᾱ_t − 1)·ε (diffsvcrepo_inference.py:36-40)."""
        return (
            self.sqrt_recip_alphas_cumprod[t] * x_t
            - self.sqrt_recipm1_alphas_cumprod[t] * noise
        )
