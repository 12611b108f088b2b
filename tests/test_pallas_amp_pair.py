"""Fused AMP conv-pair kernel vs the XLA composition (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svc_inference_pipeline_tpu.ops.pallas.amp_pair import _xla_pair, fused_amp_pair


def _params(c, k, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        w1=jnp.asarray(rng.standard_normal((k, c, c)) * 0.1, jnp.float32),
        b1=jnp.asarray(rng.standard_normal(c) * 0.05, jnp.float32),
        w2=jnp.asarray(rng.standard_normal((k, c, c)) * 0.1, jnp.float32),
        b2=jnp.asarray(rng.standard_normal(c) * 0.05, jnp.float32),
        alpha1=jnp.asarray(rng.standard_normal(c) * 0.2, jnp.float32),
        beta1=jnp.asarray(rng.standard_normal(c) * 0.2, jnp.float32),
        alpha2=jnp.asarray(rng.standard_normal(c) * 0.2, jnp.float32),
        beta2=jnp.asarray(rng.standard_normal(c) * 0.2, jnp.float32),
    )


@pytest.mark.parametrize("k,d", [(3, 1), (3, 5), (7, 3), (11, 5)])
@pytest.mark.parametrize("t,c", [(512, 24), (700, 96)])
def test_fused_pair_matches_xla(k, d, t, c):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, t, c)) * 0.5, jnp.float32)
    p = _params(c, k)

    ref = np.asarray(_xla_pair(x, **{k2: v for k2, v in p.items()}, k=k, d=d,
                               kind="snakebeta", logscale=True))
    got = np.asarray(
        fused_amp_pair(x, **p, k=k, d=d, kind="snakebeta", logscale=True,
                       t_tile=256, interpret=True)
    )
    assert got.shape == ref.shape
    err = np.abs(got - ref).max()
    assert err < 5e-4, f"amp pair max err {err} (k={k}, d={d}, T={t}, C={c})"


def test_fused_pair_bf16_io():
    rng = np.random.default_rng(2)
    c, k, d = 48, 3, 1
    x = jnp.asarray(rng.standard_normal((1, 400, c)) * 0.5, jnp.bfloat16)
    p = _params(c, k)
    ref = np.asarray(
        _xla_pair(x, **p, k=k, d=d, kind="snakebeta", logscale=True)
    ).astype(np.float32)
    got = np.asarray(
        fused_amp_pair(x, **p, k=k, d=d, kind="snakebeta", logscale=True,
                       t_tile=256, interpret=True)
    ).astype(np.float32)
    assert np.abs(got - ref).max() < 0.05  # bf16 IO tolerance


def test_fused_pair_batch():
    rng = np.random.default_rng(3)
    c, k, d = 24, 7, 3
    x = jnp.asarray(rng.standard_normal((2, 300, c)) * 0.3, jnp.float32)
    p = _params(c, k)
    ref = np.asarray(_xla_pair(x, **p, k=k, d=d, kind="snakebeta", logscale=True))
    got = np.asarray(
        fused_amp_pair(x, **p, k=k, d=d, kind="snakebeta", logscale=True,
                       t_tile=256, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=5e-4)
