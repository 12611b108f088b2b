"""Int8-quantized fused denoiser kernel vs the f32 fast path.

The int8 mode (``make_pallas_denoise_fn(..., quantize="int8")``) runs the
two hot per-layer matmuls (dilated conv, output projection) on the int8
MXU: symmetric per-output-channel weight scales, a dynamic per-tensor
activation scale for the conv input, and a static 1/127 scale for the
bounded gate output.  It is an opt-in accuracy/speed trade — these tests
pin the accuracy side (relative error vs the f32 fast path) and the
mechanical invariants (scale shapes, fallback wiring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svc_inference_pipeline_tpu.models.diffsvc import DiffSVCDenoiser
from svc_inference_pipeline_tpu.models.diffsvc_fast import make_fast_denoise_fn
from svc_inference_pipeline_tpu.ops.pallas.denoiser_step import (
    make_pallas_denoise_fn,
    stack_denoiser_params,
)
from svc_inference_pipeline_tpu.utils.devices import fast_random_params


def _randomize(params, seed=0):
    """Replace every weight with N(0, 0.05) noise — init leaves the final
    output projection zero, which would make any parity test vacuous."""
    rng = np.random.default_rng(seed)
    return jax.tree.map(
        lambda p: jnp.asarray(
            (rng.standard_normal(p.shape) * 0.05).astype(np.float32), p.dtype
        ),
        params,
    )


@pytest.fixture(scope="module")
def setup(cfg):
    mcfg = cfg.mapper.replace(residual_layer_num=6)  # dilations 1..8 + wrap
    model = DiffSVCDenoiser(mcfg, compute_dtype=jnp.float32)
    b, t = 1, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, 100)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, t, 384)), jnp.float32)
    params = _randomize(
        fast_random_params(
            lambda: model.init(
                jax.random.PRNGKey(0), x, cond, jnp.zeros((b, 1), jnp.int32)
            )
        )["params"]
    )
    return mcfg, params, x, cond


def test_stacked_int8_shapes_and_scales(setup):
    mcfg, params, _x, _cond = setup
    st = stack_denoiser_params(params, mcfg, jnp.bfloat16, quantize="int8")
    L, c = mcfg.residual_layer_num, mcfg.residual_channels
    assert st.w1.dtype == jnp.int8 and st.w1.shape == (L, 3 * c, 2 * c)
    assert st.wout.dtype == jnp.int8 and st.wout.shape == (L, c, 2 * c)
    assert st.w1s.shape == (L, 1, 2 * c) and st.w1s.dtype == jnp.float32
    assert st.wouts.shape == (L, 1, 2 * c) and st.wouts.dtype == jnp.float32
    # dequantized weights reproduce the originals to within one quantum
    w1_ref = np.stack(
        [
            np.asarray(
                params[f"residual_{i}"]["dilated_conv"]["kernel"], np.float32
            ).reshape(3 * c, 2 * c)
            for i in range(L)
        ]
    )
    deq = np.asarray(st.w1, np.float32) * np.asarray(st.w1s)
    quantum = np.asarray(st.w1s)  # one int8 step per column
    assert (np.abs(deq - w1_ref) <= 0.5 * quantum + 1e-7).all()
    # unquantized mode leaves scales unset
    st_bf = stack_denoiser_params(params, mcfg, jnp.bfloat16)
    assert st_bf.w1s is None and st_bf.wouts is None
    with pytest.raises(ValueError):
        stack_denoiser_params(params, mcfg, jnp.bfloat16, quantize="int4")


@pytest.mark.parametrize("t_step", [0, 7, 49])
def test_int8_denoiser_close_to_f32(setup, t_step):
    mcfg, params, x, cond = setup
    ref_fn = make_fast_denoise_fn(params, cond, 50, mcfg, compute_dtype=jnp.float32)
    q_fn = make_pallas_denoise_fn(
        params, cond, 50, mcfg, compute_dtype=jnp.float32, interpret=True,
        quantize="int8",
    )
    t = jnp.full((1, 1), t_step, jnp.int32)
    ref = np.asarray(ref_fn(x, cond, t))
    got = np.asarray(q_fn(x, cond, t))
    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    rel = np.abs(got - ref).max() / scale
    assert rel < 0.05, f"int8 denoiser rel err {rel} at t={t_step}"
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999, f"int8 denoiser corr {corr} at t={t_step}"


def test_int8_fused_ddpm_sampler_close(setup):
    """Full DDPM chain with the int8 kernel stays close to the f32 chain
    (same keys → same noise; only the denoiser output differs)."""
    from svc_inference_pipeline_tpu.sampling.ddpm import ddpm_sample
    from svc_inference_pipeline_tpu.sampling.schedule import DiffusionSchedule

    mcfg, params, x, cond = setup
    sched = DiffusionSchedule.from_factors([0.0001, 0.02, 10])
    f32_fn = make_pallas_denoise_fn(
        params, cond, 10, mcfg, compute_dtype=jnp.float32, interpret=True
    )
    q_fn = make_pallas_denoise_fn(
        params, cond, 10, mcfg, compute_dtype=jnp.float32, interpret=True,
        quantize="int8",
    )
    key = jax.random.PRNGKey(3)
    ref = np.asarray(ddpm_sample(f32_fn, cond, key, x.shape, sched))
    got = np.asarray(q_fn.fused_ddpm(key, x.shape, sched))
    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    rel = np.abs(got - ref).max() / scale
    assert rel < 0.1, f"int8 fused ddpm rel err {rel}"
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.995, f"int8 fused ddpm corr {corr}"


def test_int8_batched(setup):
    mcfg, params, _x, _cond = setup
    b, t = 2, 64
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((b, t, 100)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, t, 384)), jnp.float32)
    ref_fn = make_fast_denoise_fn(params, cond, 50, mcfg, compute_dtype=jnp.float32)
    q_fn = make_pallas_denoise_fn(
        params, cond, 50, mcfg, compute_dtype=jnp.float32, interpret=True,
        quantize="int8",
    )
    tstep = jnp.full((1, 1), 21, jnp.int32)
    ref = np.asarray(ref_fn(x, cond, tstep))
    got = np.asarray(q_fn(x, cond, tstep))
    assert got.shape == ref.shape == (b, t, 100)
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.05, f"batched int8 rel err {rel}"


def test_int8_w1_stacked_layout(setup):
    """int8-w1: w1 int8 + scales, wout at the compute dtype, no wout scales."""
    mcfg, params, _x, _cond = setup
    st = stack_denoiser_params(params, mcfg, jnp.bfloat16, quantize="int8-w1")
    assert st.w1.dtype == jnp.int8 and st.w1s is not None
    assert st.wout.dtype == jnp.bfloat16 and st.wouts is None


def test_int8_w1_quality_gate(setup):
    """The QUALITY GATE for the qualified int8 mode (VERDICT r4 #2):
    int8-w1 (dilated conv int8, output projection at compute dtype) must
    keep the full DDPM chain's final mel at corr >= 0.9999 vs the f32
    chain. Measured on this shape: 0.999992 (production shape: 0.999928 —
    BENCH_NOTES round-5 table); full int8 fails this gate (0.99981)."""
    from svc_inference_pipeline_tpu.sampling.schedule import DiffusionSchedule

    mcfg, params, x, cond = setup
    sched = DiffusionSchedule.from_factors([0.0001, 0.02, 100])
    ref_fn = make_pallas_denoise_fn(
        params, cond, 100, mcfg, compute_dtype=jnp.float32, interpret=True
    )
    q_fn = make_pallas_denoise_fn(
        params, cond, 100, mcfg, compute_dtype=jnp.float32, interpret=True,
        quantize="int8-w1",
    )
    key = jax.random.PRNGKey(3)
    ref = np.asarray(ref_fn.fused_ddpm(key, x.shape, sched))
    got = np.asarray(q_fn.fused_ddpm(key, x.shape, sched))
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr >= 0.9999, f"int8-w1 gate: final-mel corr {corr:.6f} < 0.9999"


def test_quantize_tail_full_equals_unquantized(setup):
    """tail == num_steps routes EVERY step through the full-precision
    stack — the chain must be bit-identical to quantize=None (same keys,
    same kernel, same weights)."""
    from svc_inference_pipeline_tpu.sampling.schedule import DiffusionSchedule

    mcfg, params, x, cond = setup
    sched = DiffusionSchedule.from_factors([0.0001, 0.02, 10])
    ref_fn = make_pallas_denoise_fn(
        params, cond, 10, mcfg, compute_dtype=jnp.float32, interpret=True
    )
    q_fn = make_pallas_denoise_fn(
        params, cond, 10, mcfg, compute_dtype=jnp.float32, interpret=True,
        quantize="int8", quantize_tail=10,
    )
    key = jax.random.PRNGKey(5)
    ref = np.asarray(ref_fn.fused_ddpm(key, x.shape, sched))
    got = np.asarray(q_fn.fused_ddpm(key, x.shape, sched))
    np.testing.assert_array_equal(got, ref)


def test_quantize_tail_interpolates(setup):
    """A partial tail lands strictly between full int8 and full precision
    (error decreases monotonically as the tail grows)."""
    from svc_inference_pipeline_tpu.sampling.schedule import DiffusionSchedule

    mcfg, params, x, cond = setup
    sched = DiffusionSchedule.from_factors([0.0001, 0.02, 20])
    key = jax.random.PRNGKey(11)

    def run(quantize, tail=0):
        fn = make_pallas_denoise_fn(
            params, cond, 20, mcfg, compute_dtype=jnp.float32, interpret=True,
            quantize=quantize, quantize_tail=tail,
        )
        return np.asarray(fn.fused_ddpm(key, x.shape, sched))

    ref = run(None)
    errs = [
        float(np.sqrt(np.mean((run("int8", tail=k) - ref) ** 2)))
        for k in (0, 5, 20)
    ]
    assert errs[2] == 0.0
    assert errs[1] < errs[0], f"tail must reduce error: {errs}"
