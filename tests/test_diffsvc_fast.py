"""Fast (hoisted) denoiser must match the flax module exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svc_inference_pipeline_tpu.models.diffsvc import DiffSVCDenoiser
from svc_inference_pipeline_tpu.models.diffsvc_fast import make_fast_denoise_fn, precompute
from svc_inference_pipeline_tpu.utils.devices import fast_random_params


@pytest.fixture(scope="module")
def setup(cfg):
    mcfg = cfg.mapper.replace(residual_layer_num=4)
    model = DiffSVCDenoiser(mcfg, compute_dtype=jnp.float32)
    b, t = 1, 24
    x = jnp.asarray(np.random.default_rng(0).standard_normal((b, t, 100)), jnp.float32)
    cond = jnp.asarray(np.random.default_rng(1).standard_normal((b, t, 384)), jnp.float32)
    params = fast_random_params(
        lambda: model.init(jax.random.PRNGKey(0), x, cond, jnp.zeros((b, 1), jnp.int32))
    )["params"]
    return mcfg, model, params, x, cond


@pytest.mark.parametrize("t_step", [0, 25, 49])
def test_fast_matches_module_f32(setup, t_step):
    mcfg, model, params, x, cond = setup
    ref = np.asarray(
        model.apply({"params": params}, x, cond, jnp.full((1, 1), t_step, jnp.int32))
    )
    fn = make_fast_denoise_fn(params, cond, 50, mcfg, compute_dtype=jnp.float32)
    got = np.asarray(fn(x, cond, jnp.full((1, 1), t_step, jnp.int32)))
    err = np.abs(got - ref).max()
    assert err < 1e-5, f"fast denoiser diverges at t={t_step}: {err}"


def test_fast_bf16_close_to_f32(setup):
    mcfg, model, params, x, cond = setup
    f32 = make_fast_denoise_fn(params, cond, 50, mcfg, compute_dtype=jnp.float32)
    bf16 = make_fast_denoise_fn(params, cond, 50, mcfg, compute_dtype=jnp.bfloat16)
    t = jnp.full((1, 1), 10, jnp.int32)
    a, b = np.asarray(f32(x, cond, t)), np.asarray(bf16(x, cond, t))
    assert np.abs(a - b).max() < 0.1  # bf16 rounding only


def test_precompute_shapes(setup):
    mcfg, model, params, x, cond = setup
    pre = precompute(params, cond, 50, mcfg)
    assert pre.cond_projs.shape == (4, 1, 24, 768)
    assert pre.step_rows.shape == (50, 4, 384)


def test_fast_in_ddpm_scan_matches_module_path(setup):
    """Full 50-step DDPM with the fast path == with the module path."""
    from svc_inference_pipeline_tpu.sampling.ddpm import ddpm_sample
    from svc_inference_pipeline_tpu.sampling.schedule import DiffusionSchedule

    mcfg, model, params, x, cond = setup
    sched = DiffusionSchedule.from_factors([0.0001, 0.02, 50])
    key = jax.random.PRNGKey(7)

    def module_fn(xx, cc, tt):
        return model.apply({"params": params}, xx, cc, tt)

    fast_fn = make_fast_denoise_fn(params, cond, 50, mcfg, compute_dtype=jnp.float32)

    a = np.asarray(ddpm_sample(module_fn, cond, key, x.shape, sched))
    b = np.asarray(ddpm_sample(fast_fn, cond, key, x.shape, sched))
    # per-step differences are ~1e-5 (pure reassociation) but feed back
    # through the posterior recursion; 5e-3 bounds the 50-step accumulation
    np.testing.assert_allclose(a, b, atol=5e-3)
