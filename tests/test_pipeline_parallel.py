"""GPipe pipeline parallelism for the denoiser (parallel/pp.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svc_inference_pipeline_tpu.config import HParams
from svc_inference_pipeline_tpu.models.diffsvc import DiffSVCDenoiser
from svc_inference_pipeline_tpu.models.diffsvc_fast import make_fast_denoise_fn
from svc_inference_pipeline_tpu.parallel.pp import PIPE_AXIS, pp_denoise_fn
from jax.sharding import Mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

L, C, M, T = 8, 64, 16, 32
NUM_STEPS = 50


@pytest.fixture(scope="module")
def setup():
    mcfg = HParams(
        input_content_dim={"whisper": 32},
        content_feature=["whisper"],
        conditioner_size=C,
        residual_layer_num=L,
        residual_channels=C,
        residual_kernel_size=3,
        dilation_cycle_length=4,
        n_mel=M,
        noise_schedule_factors=[1e-4, 0.02, NUM_STEPS],
        diffusion_fc_size=128,
    )
    den = DiffSVCDenoiser(mcfg)
    key = jax.random.PRNGKey(0)
    params = den.init(
        key,
        jnp.zeros((1, T, M)),
        jnp.zeros((1, T, C)),
        jnp.zeros((1, 1), jnp.int32),
    )["params"]
    rng = np.random.default_rng(1)
    # the reference zero-inits the final output projection (diffsvc.py:278-282)
    # → ε ≡ 0 at init, which would make these tests vacuous; randomise it
    params["output_projection"]["kernel"] = jnp.asarray(
        rng.standard_normal(params["output_projection"]["kernel"].shape) * 0.1,
        jnp.float32,
    )
    b = 4
    x = jnp.asarray(rng.standard_normal((b, T, M)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, T, C)) * 0.3, jnp.float32)
    t = jnp.asarray([7, 7, 23, 23], jnp.int32)  # shared step per microbatch
    return mcfg, params, x, cond, t


def _pipe_mesh(n_stages):
    devs = np.asarray(jax.devices()[:n_stages]).reshape(n_stages)
    return Mesh(devs, axis_names=(PIPE_AXIS,))


@pytest.mark.parametrize("n_stages", [2, 4])
def test_pp_forward_matches_single_device(setup, n_stages):
    mcfg, params, x, cond, t = setup
    # reference path evaluates each microbatch at its own step
    refs = []
    for i in range(0, 4, 2):
        ref_fn = make_fast_denoise_fn(params, cond[i : i + 2], NUM_STEPS, mcfg, jnp.float32)
        refs.append(np.asarray(ref_fn(x[i : i + 2], None, t[i : i + 2, None])))
    ref = np.concatenate(refs, axis=0)

    mesh = _pipe_mesh(n_stages)
    out = np.asarray(
        pp_denoise_fn(params, cond, t, x, mesh, mcfg, NUM_STEPS, n_micro=2)
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_pp_gradients_flow(setup):
    """jax.grad through the pipeline (reverse pipeline via ppermute
    transpose) produces finite, nonzero grads for every stage's params."""
    mcfg, params, x, cond, t = setup
    mesh = _pipe_mesh(4)

    def loss_fn(p):
        eps = pp_denoise_fn(p, cond, t, x, mesh, mcfg, NUM_STEPS, n_micro=2)
        return jnp.mean(jnp.square(eps))

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(
        {k: v for k, v in g.items() if k.startswith("residual_")}
    )
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0.0
