"""Fused whole-denoiser Pallas kernel vs the reference fast path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svc_inference_pipeline_tpu.models.diffsvc import DiffSVCDenoiser
from svc_inference_pipeline_tpu.models.diffsvc_fast import make_fast_denoise_fn
from svc_inference_pipeline_tpu.ops.pallas.denoiser_step import make_pallas_denoise_fn
from svc_inference_pipeline_tpu.utils.devices import fast_random_params


@pytest.fixture(scope="module")
def setup(cfg):
    mcfg = cfg.mapper.replace(residual_layer_num=6)  # covers dilations 1..8 + wrap
    model = DiffSVCDenoiser(mcfg, compute_dtype=jnp.float32)
    b, t = 1, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, 100)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, t, 384)), jnp.float32)
    params = fast_random_params(
        lambda: model.init(jax.random.PRNGKey(0), x, cond, jnp.zeros((b, 1), jnp.int32))
    )["params"]
    return mcfg, params, x, cond


@pytest.mark.parametrize("t_step", [0, 7, 49])
def test_pallas_denoiser_matches_fast_path_f32(setup, t_step):
    mcfg, params, x, cond = setup
    ref_fn = make_fast_denoise_fn(params, cond, 50, mcfg, compute_dtype=jnp.float32)
    pal_fn = make_pallas_denoise_fn(params, cond, 50, mcfg,
                                    compute_dtype=jnp.float32, interpret=True)
    t = jnp.full((1, 1), t_step, jnp.int32)
    ref = np.asarray(ref_fn(x, cond, t))
    got = np.asarray(pal_fn(x, cond, t))
    assert got.shape == ref.shape
    err = np.abs(got - ref).max()
    assert err < 1e-4, f"pallas denoiser err {err} at t={t_step}"


def test_pallas_denoiser_bf16_close(setup):
    mcfg, params, x, cond = setup
    ref_fn = make_fast_denoise_fn(params, cond, 50, mcfg, compute_dtype=jnp.float32)
    pal_fn = make_pallas_denoise_fn(params, cond, 50, mcfg,
                                    compute_dtype=jnp.bfloat16, interpret=True)
    t = jnp.full((1, 1), 10, jnp.int32)
    ref = np.asarray(ref_fn(x, cond, t))
    got = np.asarray(pal_fn(x, cond, t))
    assert np.abs(got - ref).max() < 0.15  # bf16 weights + activations


def test_pallas_denoiser_batched(setup, cfg):
    """grid=(B,L): each batch element matches the fast path independently."""
    mcfg, params, _x, _cond = setup
    b, t = 3, 64
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((b, t, 100)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, t, 384)), jnp.float32)
    ref_fn = make_fast_denoise_fn(params, cond, 50, mcfg, compute_dtype=jnp.float32)
    pal_fn = make_pallas_denoise_fn(params, cond, 50, mcfg,
                                    compute_dtype=jnp.float32, interpret=True)
    tstep = jnp.full((1, 1), 21, jnp.int32)
    ref = np.asarray(ref_fn(x, cond, tstep))
    got = np.asarray(pal_fn(x, cond, tstep))
    assert got.shape == ref.shape == (b, t, 100)
    err = np.abs(got - ref).max()
    assert err < 1e-4, f"batched pallas denoiser err {err}"


def test_pallas_denoiser_in_scan(setup):
    """Runs inside a lax.scan (the sampler usage) without retrace issues."""
    from svc_inference_pipeline_tpu.sampling.ddpm import ddpm_sample
    from svc_inference_pipeline_tpu.sampling.schedule import DiffusionSchedule

    mcfg, params, x, cond = setup
    sched = DiffusionSchedule.from_factors([0.0001, 0.02, 10])
    fn = make_pallas_denoise_fn(params, cond, 10, mcfg,
                                compute_dtype=jnp.float32, interpret=True)
    out = ddpm_sample(fn, cond, jax.random.PRNGKey(0), x.shape, sched)
    assert np.isfinite(np.asarray(out)).all()


def test_fused_ddpm_sampler_matches_composed_scan(setup):
    """fn.fused_ddpm (sampler update inside the kernel epilogue) draws the
    same noise and computes the same f32 update as ddpm_sample composed
    with the plain kernel — outputs must agree to f32 reassociation."""
    from svc_inference_pipeline_tpu.sampling.ddpm import ddpm_sample
    from svc_inference_pipeline_tpu.sampling.schedule import DiffusionSchedule

    mcfg, params, x, cond = setup
    sched = DiffusionSchedule.from_factors([0.0001, 0.02, 10])
    fn = make_pallas_denoise_fn(params, cond, 10, mcfg,
                                compute_dtype=jnp.float32, interpret=True)
    key = jax.random.PRNGKey(3)
    ref = np.asarray(ddpm_sample(fn, cond, key, x.shape, sched))
    got = np.asarray(fn.fused_ddpm(key, x.shape, sched))
    assert got.shape == ref.shape
    err = np.abs(got - ref).max()
    assert err < 1e-4, f"fused ddpm sampler err {err}"


def test_fused_ddpm_sampler_batched(setup):
    """B>1 (grid=(B, L)): per-clip noise independence is preserved."""
    from svc_inference_pipeline_tpu.sampling.ddpm import ddpm_sample
    from svc_inference_pipeline_tpu.sampling.schedule import DiffusionSchedule

    mcfg, params, _x, _cond = setup
    b, t = 2, 64
    rng = np.random.default_rng(11)
    cond = jnp.asarray(rng.standard_normal((b, t, 384)), jnp.float32)
    sched = DiffusionSchedule.from_factors([0.0001, 0.02, 8])
    fn = make_pallas_denoise_fn(params, cond, 8, mcfg,
                                compute_dtype=jnp.float32, interpret=True)
    key = jax.random.PRNGKey(4)
    shape = (b, t, 100)
    ref = np.asarray(ddpm_sample(fn, cond, key, shape, sched))
    got = np.asarray(fn.fused_ddpm(key, shape, sched))
    err = np.abs(got - ref).max()
    assert err < 1e-4, f"batched fused ddpm err {err}"


def test_fused_ddpm_sampler_predraw_guard(setup, monkeypatch):
    """Above the pre-draw memory cap the sampler falls back to per-step z
    draws — same keys, so the waveform is identical either way."""
    from svc_inference_pipeline_tpu.ops.pallas import denoiser_step
    from svc_inference_pipeline_tpu.sampling.schedule import DiffusionSchedule

    mcfg, params, x, cond = setup
    sched = DiffusionSchedule.from_factors([0.0001, 0.02, 10])
    fn = make_pallas_denoise_fn(params, cond, 10, mcfg,
                                compute_dtype=jnp.float32, interpret=True)
    key = jax.random.PRNGKey(5)
    pre = np.asarray(fn.fused_ddpm(key, x.shape, sched))
    monkeypatch.setattr(denoiser_step, "_PREDRAW_Z_MAX_BYTES", 0)
    per_step = np.asarray(fn.fused_ddpm(key, x.shape, sched))
    np.testing.assert_array_equal(pre, per_step)
