"""Fused AMP stage mega-kernel vs the composed XLA path (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from svc_inference_pipeline_tpu.ops.pallas.amp_pair import _xla_pair
from svc_inference_pipeline_tpu.ops.pallas.amp_stage import _xla_stage, fused_amp_stage

# >2 min on the 1-CPU CI host (per-file durations audit, BENCH_NOTES.md)
pytestmark = pytest.mark.slow


def _pair_params(c, k, rng):
    return (
        jnp.asarray(rng.standard_normal((k, c, c)) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal(c) * 0.05, jnp.float32),
        jnp.asarray(rng.standard_normal((k, c, c)) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal(c) * 0.05, jnp.float32),
        jnp.asarray(rng.standard_normal(c) * 0.2, jnp.float32),
        jnp.asarray(rng.standard_normal(c) * 0.2, jnp.float32),
        jnp.asarray(rng.standard_normal(c) * 0.2, jnp.float32),
        jnp.asarray(rng.standard_normal(c) * 0.2, jnp.float32),
    )


def _stage_params(c, ks, dils, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        tuple(_pair_params(c, k, rng) for _ in dset) for k, dset in zip(ks, dils)
    )


PROD_KS = (3, 7, 11)
PROD_DILS = ((1, 3, 5),) * 3


@pytest.mark.parametrize("t,c", [(800, 24), (1100, 96), (700, 192), (520, 384), (400, 768)])
def test_fused_stage_matches_xla(t, c):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, t, c)) * 0.5, jnp.float32)
    params = _stage_params(c, PROD_KS, PROD_DILS)

    ref = np.asarray(_xla_stage(x, params, PROD_KS, PROD_DILS, "snakebeta", True))
    got = np.asarray(
        fused_amp_stage(x, params, PROD_KS, PROD_DILS, "snakebeta", True,
                        t_tile=256, interpret=True)
    )
    assert got.shape == ref.shape
    # three sequential pairs grow the activations ~10× each with these
    # random weights — bound the RELATIVE error (f32 reassociation drift)
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 1e-4, f"amp stage max rel err {err} (T={t}, C={c})"


def test_xla_stage_is_the_amp_block_mean():
    """The boundary oracle itself equals mean-of-sequential-pairs."""
    rng = np.random.default_rng(2)
    c = 16
    x = jnp.asarray(rng.standard_normal((1, 200, c)) * 0.5, jnp.float32)
    params = _stage_params(c, (3, 5), ((1, 3), (1, 3)), seed=3)

    acc = None
    for blk, (k, dset) in enumerate(zip((3, 5), ((1, 3), (1, 3)))):
        a = x
        for j, d in enumerate(dset):
            a = _xla_pair(a, *params[blk][j], k, d, "snakebeta", True)
        acc = a if acc is None else acc + a
    ref = np.asarray(acc / 2)
    got = np.asarray(_xla_stage(x, params, (3, 5), ((1, 3), (1, 3)), "snakebeta", True))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_fused_stage_bf16_batch():
    rng = np.random.default_rng(4)
    c = 48
    x = jnp.asarray(rng.standard_normal((2, 600, c)) * 0.3, jnp.bfloat16)
    params = _stage_params(c, PROD_KS, PROD_DILS, seed=5)
    ref = np.asarray(
        _xla_stage(x, params, PROD_KS, PROD_DILS, "snakebeta", True)
    ).astype(np.float32)
    got = np.asarray(
        fused_amp_stage(x, params, PROD_KS, PROD_DILS, "snakebeta", True,
                        t_tile=256, interpret=True)
    ).astype(np.float32)
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.02, rel  # bf16 IO tolerance (relative)


def test_fused_stage_bf16_mxu_fir_packed():
    """g=4 packed bf16 routes the act FIRs through banded MXU matmuls
    (_fir_mxu_mats); output must match both the f32 XLA oracle (to bf16
    rounding) and the VPU tap-chain formulation (round-4 kernel lever)."""
    import jax

    from svc_inference_pipeline_tpu.ops.pallas import amp_stage

    rng = np.random.default_rng(6)
    c = 24  # → g = 4, the mxu_fir regime
    x = jnp.asarray(rng.standard_normal((1, 2048, c)) * 0.3, jnp.bfloat16)
    params = _stage_params(c, PROD_KS, PROD_DILS, seed=7)
    ref = np.asarray(
        _xla_stage(x.astype(jnp.float32), params, PROD_KS, PROD_DILS,
                   "snakebeta", True)
    )

    got = np.asarray(
        fused_amp_stage(x, params, PROD_KS, PROD_DILS, "snakebeta", True,
                        interpret=True)
    ).astype(np.float32)
    amp_stage._DEBUG["no_mxu_fir"] = True
    try:
        jax.clear_caches()
        vpu = np.asarray(
            fused_amp_stage(x, params, PROD_KS, PROD_DILS, "snakebeta", True,
                            interpret=True)
        ).astype(np.float32)
    finally:
        amp_stage._DEBUG["no_mxu_fir"] = False
        jax.clear_caches()

    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 0.02  # bf16 IO tolerance
    # the MXU formulation stays within the same bf16 noise class as the
    # VPU path (both round the FIR operands to bf16, in different places)
    assert np.abs(got - vpu).max() / scale < 0.02
