"""Fused Activation1d kernel vs the XLA composition (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svc_inference_pipeline_tpu.models.bigvgan import downsample1d, snake, snake_beta, upsample1d
from svc_inference_pipeline_tpu.ops.pallas.snake import fused_activation1d


def _reference_path(x, alpha, beta, kind, logscale):
    y = upsample1d(x, 2, 12)
    y = snake(y, alpha, logscale) if kind == "snake" else snake_beta(y, alpha, beta, logscale)
    return downsample1d(y, 2, 12)


@pytest.mark.parametrize("kind,logscale", [("snakebeta", True), ("snake", False)])
@pytest.mark.parametrize("t,c", [(256, 128), (300, 24), (1500, 96)])
def test_fused_matches_xla_composition(kind, logscale, t, c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, t, c)), dtype=jnp.float32)
    alpha = jnp.asarray(rng.standard_normal(c) * 0.3, dtype=jnp.float32)
    beta = jnp.asarray(rng.standard_normal(c) * 0.3, dtype=jnp.float32)

    ref = np.asarray(_reference_path(x, alpha, beta, kind, logscale))
    got = np.asarray(
        fused_activation1d(
            x, alpha, beta, kind, logscale, t_tile=256, interpret=True
        )
    )
    assert got.shape == ref.shape
    err = np.abs(got - ref).max()
    assert err < 2e-5, f"fused kernel max err {err} ({kind}, T={t}, C={c})"


def test_fused_batch():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 200, 32)), dtype=jnp.float32)
    alpha = jnp.zeros(32)
    beta = jnp.zeros(32)
    ref = np.asarray(_reference_path(x, alpha, beta, "snakebeta", True))
    got = np.asarray(
        fused_activation1d(x, alpha, beta, "snakebeta", True, t_tile=256, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_fallback_for_other_ratios():
    x = jnp.ones((1, 64, 8))
    alpha = jnp.zeros(8)
    out = fused_activation1d(x, alpha, alpha, "snake", False, up_ratio=4, down_ratio=4,
                             up_kernel_size=24, down_kernel_size=24)
    assert out.shape[1] == 64
