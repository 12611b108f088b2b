"""Sampler numerics vs float64 numpy oracles of the reference equations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svc_inference_pipeline_tpu.sampling.ddpm import ddpm_sample, ddpm_training_loss, p_sample_step
from svc_inference_pipeline_tpu.sampling.plms import plms_sample
from svc_inference_pipeline_tpu.sampling.schedule import DiffusionSchedule

T_STEPS = 50  # small schedule for oracle loops
SHAPE = (1, 12, 8)  # [B, T, M]


def _linear_denoiser(scale=0.3, bias=0.01):
    """A deterministic fake ε-model: ε̂ = scale·x + bias·(t/T) + 0.05·cond-mean."""

    def fn(x, cond, t):
        tt = t.astype(jnp.float32)[..., None] / T_STEPS
        return scale * x + bias * tt + 0.05 * jnp.mean(cond, axis=-1, keepdims=True)

    return fn


def _oracle_schedule(n):
    betas = np.linspace(1e-4, 0.02, n).astype(np.float64)
    alphas = 1 - betas
    a_cum = np.cumprod(alphas)
    a_prev = np.append(1.0, a_cum[:-1])
    return betas, alphas, a_cum, a_prev


@pytest.fixture(scope="module")
def schedule():
    return DiffusionSchedule.from_betas(np.linspace(1e-4, 0.02, T_STEPS))


@pytest.fixture(scope="module")
def cond():
    return jnp.asarray(np.random.default_rng(0).standard_normal((1, 12, 4)), dtype=jnp.float32)


def test_schedule_matches_reference_equations(schedule):
    betas, alphas, a_cum, a_prev = _oracle_schedule(T_STEPS)
    np.testing.assert_allclose(schedule.sqrt_recip_alphas_cumprod, np.sqrt(1 / a_cum), rtol=1e-6)
    np.testing.assert_allclose(schedule.sqrt_recipm1_alphas_cumprod, np.sqrt(1 / a_cum - 1), rtol=1e-6)
    np.testing.assert_allclose(
        schedule.posterior_mean_coef1, betas * np.sqrt(a_prev) / (1 - a_cum), rtol=1e-6
    )
    np.testing.assert_allclose(
        schedule.posterior_mean_coef2, (1 - a_prev) * np.sqrt(alphas) / (1 - a_cum), rtol=1e-6
    )
    post_var = betas * (1 - a_prev) / (1 - a_cum)
    np.testing.assert_allclose(
        schedule.posterior_log_variance_clipped,
        np.log(np.maximum(post_var, 1e-20)),
        rtol=1e-5,
    )


def test_schedule_from_factors_equals_linspace():
    a = DiffusionSchedule.from_factors([0.0001, 0.02, 100])
    b = DiffusionSchedule.from_betas(np.linspace(0.0001, 0.02, 100))
    np.testing.assert_array_equal(np.asarray(a.betas), np.asarray(b.betas))


def test_single_step_matches_numpy_oracle(schedule, cond):
    """One p_sample step vs the reference update equations in numpy f64."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal(SHAPE).astype(np.float32)
    t = 20
    key = jax.random.PRNGKey(0)

    denoise = _linear_denoiser()
    ours = np.asarray(
        p_sample_step(denoise, schedule, jnp.asarray(x), jnp.int32(t), cond, key)
    )

    # oracle
    betas, alphas, a_cum, a_prev = _oracle_schedule(T_STEPS)
    eps = np.asarray(denoise(jnp.asarray(x), cond, jnp.full((1, 1), t)))
    x0 = np.sqrt(1 / a_cum[t]) * x - np.sqrt(1 / a_cum[t] - 1) * eps
    x0 = np.clip(x0, -1, 1)
    c1 = betas[t] * np.sqrt(a_prev[t]) / (1 - a_cum[t])
    c2 = (1 - a_prev[t]) * np.sqrt(alphas[t]) / (1 - a_cum[t])
    mean = c1 * x0 + c2 * x
    log_var = np.log(max(betas[t] * (1 - a_prev[t]) / (1 - a_cum[t]), 1e-20))
    noise = np.asarray(jax.random.normal(key, SHAPE))
    expected = mean + np.exp(0.5 * log_var) * noise

    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


def test_no_noise_at_t0(schedule, cond):
    x = jnp.ones(SHAPE)
    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    denoise = _linear_denoiser()
    a = np.asarray(p_sample_step(denoise, schedule, x, jnp.int32(0), cond, k1))
    b = np.asarray(p_sample_step(denoise, schedule, x, jnp.int32(0), cond, k2))
    np.testing.assert_array_equal(a, b)  # key-independent ⇒ no noise injected


def test_full_ddpm_matches_python_loop(schedule, cond):
    """The lax.scan must equal an explicit python loop over p_sample_step."""
    denoise = _linear_denoiser()
    key = jax.random.PRNGKey(42)

    ours = np.asarray(ddpm_sample(denoise, cond, key, SHAPE, schedule))

    key2, init_key = jax.random.split(key)
    x = np.asarray(INIT := (1 / 1.2) * jax.random.normal(init_key, SHAPE, dtype=jnp.float32))
    step_keys = jax.random.split(key2, T_STEPS)
    xs = jnp.asarray(x)
    for i, t in enumerate(range(T_STEPS - 1, -1, -1)):
        xs = p_sample_step(denoise, schedule, xs, jnp.int32(t), cond, step_keys[i])
    np.testing.assert_allclose(ours, np.asarray(xs), rtol=1e-4, atol=1e-5)


def test_init_noise_std(schedule, cond):
    """x_T ~ N(0, (1/1.2)²) — verify via a pass-through of the first step."""
    big = (4, 64, 64)
    key = jax.random.PRNGKey(7)
    _, init_key = jax.random.split(key)
    x = (1 / 1.2) * jax.random.normal(init_key, big, dtype=jnp.float32)
    assert abs(float(jnp.std(x)) - 1 / 1.2) < 0.02


def test_ddpm_deterministic_under_same_key(schedule, cond):
    denoise = _linear_denoiser()
    a = np.asarray(ddpm_sample(denoise, cond, jax.random.PRNGKey(3), SHAPE, schedule))
    b = np.asarray(ddpm_sample(denoise, cond, jax.random.PRNGKey(3), SHAPE, schedule))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(ddpm_sample(denoise, cond, jax.random.PRNGKey(4), SHAPE, schedule))
    assert np.abs(a - c).max() > 1e-6


def test_plms_matches_numpy_oracle(schedule, cond):
    """PLMS scan vs a straight-line numpy implementation of the corrected
    algorithm (Adams–Bashforth orders 1-4 + transfer formula)."""
    denoise = _linear_denoiser()
    key = jax.random.PRNGKey(5)
    speedup = 5

    ours = np.asarray(plms_sample(denoise, cond, key, SHAPE, schedule, speedup=speedup))

    # oracle
    _, _, a_cum, _ = _oracle_schedule(T_STEPS)

    def transfer(x, eps, t, tp):
        at, ap = a_cum[t], a_cum[tp]
        sq_t, sq_p = np.sqrt(at), np.sqrt(ap)
        delta = (ap - at) * (
            x / (sq_t * (sq_t + sq_p))
            - eps / (sq_t * (np.sqrt((1 - ap) * at) + np.sqrt((1 - at) * ap)))
        )
        return x + delta

    def eps_np(x, t):
        return np.asarray(denoise(jnp.asarray(x), cond, jnp.full((1, 1), t)))

    x = np.asarray((1 / 1.2) * jax.random.normal(key, SHAPE, dtype=jnp.float32))
    hist = []
    for t in list(range(0, T_STEPS, speedup))[::-1]:
        tp = max(t - speedup, 0)
        eps = eps_np(x, t)
        if len(hist) == 0:
            x_pred = transfer(x, eps, t, tp)
            eps_prev = eps_np(x_pred, tp)
            eps_prime = (eps + eps_prev) / 2
        elif len(hist) == 1:
            eps_prime = (3 * eps - hist[-1]) / 2
        elif len(hist) == 2:
            eps_prime = (23 * eps - 16 * hist[-1] + 5 * hist[-2]) / 12
        else:
            eps_prime = (55 * eps - 59 * hist[-1] + 37 * hist[-2] - 9 * hist[-3]) / 24
        x = transfer(x, eps_prime, t, tp)
        hist.append(eps)

    np.testing.assert_allclose(ours, x, rtol=1e-3, atol=1e-4)


def test_plms_approximates_ddpm():
    """On a contractive toy model PLMS@speedup≈5 should land near the DDPM
    mean trajectory (loose tolerance — different noise realisations)."""
    sched = DiffusionSchedule.from_betas(np.linspace(1e-4, 0.02, 200))
    cond = jnp.zeros((1, 4, 4))
    denoise = _linear_denoiser(scale=0.9, bias=0.0)
    key = jax.random.PRNGKey(0)
    full = np.asarray(ddpm_sample(denoise, cond, key, (1, 4, 8), sched))
    fast = np.asarray(plms_sample(denoise, cond, key, (1, 4, 8), sched, speedup=5))
    # stability: neither sampler may blow up on a contractive model
    # (PLMS carries no clamp, matching the reference's formulation)
    assert np.abs(full).max() < 2.0 and np.abs(fast).max() < 2.0
    assert np.isfinite(full).all() and np.isfinite(fast).all()


def test_training_loss_finite(schedule, cond):
    denoise = _linear_denoiser()
    x0 = jnp.asarray(np.random.default_rng(2).standard_normal(SHAPE), dtype=jnp.float32)
    loss, t = ddpm_training_loss(denoise, x0, cond, jax.random.PRNGKey(0), schedule)
    assert np.isfinite(float(loss))
    assert t.shape == (1,)


# --------------------------------------------------------------------------
# DPM-Solver++ (sampling/dpmpp.py)
# --------------------------------------------------------------------------


def test_dpmpp_order1_equals_ddim_eta0(schedule, cond):
    """The first-order DPM-Solver++ update is DDIM η=0 in exponential-
    integrator form — array-for-array on the same key and grid (clipping
    off: DDIM mixes the raw model ε with the clipped x̂₀, DPM++ is
    consistently x̂₀-space, so the identity holds unclipped)."""
    from svc_inference_pipeline_tpu.sampling.ddim import ddim_sample
    from svc_inference_pipeline_tpu.sampling.dpmpp import dpmpp_sample

    fn = _linear_denoiser()
    key = jax.random.PRNGKey(5)
    speedup = 5
    ddim_grid = np.arange(0, T_STEPS, speedup)[::-1].copy()
    a = np.asarray(ddim_sample(fn, cond, key, SHAPE, schedule, speedup=speedup,
                               eta=0.0, clip_denoised=False))
    b = np.asarray(dpmpp_sample(fn, cond, key, SHAPE, schedule, order=1,
                                clip_denoised=False, timesteps=ddim_grid))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_dpmpp_2m_beats_first_order(schedule, cond):
    """2M tracks the fine-grid trajectory closer than the first-order
    solver on the same coarse grid (the point of the method), and the
    advantage grows as the grid refines (second-order convergence)."""
    from svc_inference_pipeline_tpu.sampling.dpmpp import dpmpp_sample

    fn = _linear_denoiser()
    key = jax.random.PRNGKey(7)
    fine = np.arange(T_STEPS - 1, -1, -1)
    exact = np.asarray(dpmpp_sample(fn, cond, key, SHAPE, schedule,
                                    clip_denoised=False, timesteps=fine))
    ratios = []
    for speedup in (5, 2):
        o1 = np.asarray(dpmpp_sample(fn, cond, key, SHAPE, schedule, order=1,
                                     speedup=speedup, clip_denoised=False))
        o2 = np.asarray(dpmpp_sample(fn, cond, key, SHAPE, schedule, order=2,
                                     speedup=speedup, clip_denoised=False))
        e1 = np.abs(o1 - exact).mean()
        e2 = np.abs(o2 - exact).mean()
        assert e2 < e1, (speedup, e1, e2)
        ratios.append(e1 / e2)
    assert ratios[1] > ratios[0], ratios  # finer grid → bigger 2M advantage


def test_dpmpp_deterministic_and_finite(schedule, cond):
    from svc_inference_pipeline_tpu.sampling.dpmpp import dpmpp_sample

    fn = _linear_denoiser()
    a = np.asarray(dpmpp_sample(fn, cond, jax.random.PRNGKey(1), SHAPE, schedule))
    b = np.asarray(dpmpp_sample(fn, cond, jax.random.PRNGKey(1), SHAPE, schedule))
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all()
    assert a.shape == SHAPE


def test_dpmpp_grid_endpoints():
    from svc_inference_pipeline_tpu.sampling.dpmpp import dpmpp_timesteps

    for speedup in (1, 2, 5, 10):
        ts = dpmpp_timesteps(50, speedup)
        assert ts[0] == 49 and ts[-1] == 0, (speedup, ts)
        assert (np.diff(ts) < 0).all()
    assert len(dpmpp_timesteps(50, 1)) == 50


def test_dpmpp_numpy_oracle(schedule, cond):
    """Full float64 numpy re-derivation of the 2M update chain."""
    from svc_inference_pipeline_tpu.sampling.dpmpp import dpmpp_sample, dpmpp_timesteps
    from svc_inference_pipeline_tpu.sampling.ddpm import INIT_NOISE_STD

    fn = _linear_denoiser()
    key = jax.random.PRNGKey(9)
    speedup = 7
    ours = np.asarray(dpmpp_sample(fn, cond, key, SHAPE, schedule, speedup=speedup))

    _, _, a_cum, _ = _oracle_schedule(T_STEPS)
    alphas = np.sqrt(a_cum)
    sigmas = np.sqrt(1.0 - a_cum)
    lambdas = np.log(alphas / sigmas)
    _, init_key = jax.random.split(key)
    x = INIT_NOISE_STD * np.asarray(
        jax.random.normal(init_key, SHAPE, dtype=jnp.float32)
    ).astype(np.float64)
    ts = dpmpp_timesteps(T_STEPS, speedup)
    x0_prev, h_prev, first = None, None, True
    for i, t in enumerate(ts):
        tn = ts[i + 1] if i + 1 < len(ts) else 0
        eps = np.asarray(fn(jnp.asarray(x, jnp.float32), cond,
                            jnp.full((1, 1), t, jnp.int32))).astype(np.float64)
        x0 = np.clip((x - sigmas[t] * eps) / alphas[t], -1.0, 1.0)
        h = lambdas[tn] - lambdas[t]
        if first or h == 0.0:
            d = x0
        else:
            r = h_prev / h
            d = (1.0 + 1.0 / (2 * r)) * x0 - (1.0 / (2 * r)) * x0_prev
        x_next = (sigmas[tn] / sigmas[t]) * x - alphas[tn] * np.expm1(-h) * d
        if t == 0:
            x_next = x0
        x, x0_prev, h_prev, first = x_next, x0, h, False
    np.testing.assert_allclose(ours, x, rtol=2e-4, atol=2e-5)


def test_dpmpp_fidelity_on_real_denoiser():
    """On the real DiffSVC architecture with the production 1000-step
    schedule, dpmpp@10 tracks the fine-grid ODE trajectory orders of
    magnitude closer than ddim@10 (measured 0.0026 vs 0.98 mel-MAE on a
    random-weight field; plms' eps-space AB extrapolation can diverge
    outright there, so it is reported but not asserted)."""
    from svc_inference_pipeline_tpu.config import HParams
    from svc_inference_pipeline_tpu.models.diffsvc import DiffSVCDenoiser
    from svc_inference_pipeline_tpu.models.diffsvc_fast import make_fast_denoise_fn
    from svc_inference_pipeline_tpu.sampling.ddim import ddim_sample
    from svc_inference_pipeline_tpu.sampling.dpmpp import dpmpp_sample

    L, C, M, T = 4, 128, 32, 64
    mcfg = HParams(
        input_content_dim={"whisper": 32}, content_feature=["whisper"],
        conditioner_size=C, residual_layer_num=L, residual_channels=C,
        residual_kernel_size=3, dilation_cycle_length=2, n_mel=M,
        noise_schedule_factors=[1e-4, 0.02, 1000], diffusion_fc_size=128,
    )
    den = DiffSVCDenoiser(mcfg)
    key = jax.random.PRNGKey(0)
    params = den.init(
        key, jnp.zeros((1, T, M)), jnp.zeros((1, T, C)), jnp.zeros((1, 1), jnp.int32)
    )["params"]
    rng = np.random.default_rng(1)
    params["output_projection"]["kernel"] = jnp.asarray(
        rng.standard_normal(params["output_projection"]["kernel"].shape) * 0.05,
        jnp.float32,
    )
    cond = jnp.asarray(rng.standard_normal((1, T, C)) * 0.3, jnp.float32)
    sched = DiffusionSchedule.from_config(mcfg)
    fn = make_fast_denoise_fn(params, cond, 1000, mcfg, compute_dtype=jnp.float32)
    shape = (1, T, M)
    k = jax.random.PRNGKey(3)

    exact = np.asarray(dpmpp_sample(fn, cond, k, shape, sched, speedup=1))
    e_dpmpp = np.abs(np.asarray(dpmpp_sample(fn, cond, k, shape, sched, speedup=10)) - exact).mean()
    e_ddim = np.abs(np.asarray(ddim_sample(fn, cond, k, shape, sched, speedup=10, eta=0.0)) - exact).mean()
    assert e_dpmpp < 0.05, e_dpmpp
    assert e_dpmpp < e_ddim / 10.0, (e_dpmpp, e_ddim)
