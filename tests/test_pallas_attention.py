"""Blocked encoder-attention Pallas kernel vs the XLA formulation.

The kernel (ops/pallas/attention.py) replaces whisper._attention for the
encoder's unmasked full-context case on TPU; interpret mode checks the
numerics here on CPU. The XLA path is itself parity-tested against torch
whisper in test_whisper_parity.py, so agreement with it is agreement with
the reference (whisper_extractor/model.py:88-101).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svc_inference_pipeline_tpu.models.whisper import _attention
from svc_inference_pipeline_tpu.ops.pallas.attention import encoder_attention


def _ref(q, k, v, n_head):
    # use_pallas=False forces the einsum/softmax formulation even if the
    # backend gate would fire
    return _attention(q, k, v, n_head, use_pallas=False)


@pytest.mark.parametrize(
    "b,t,d,h",
    [
        (1, 512, 128, 2),   # exact block multiple
        (2, 300, 128, 4),   # padded keys/queries (300 → 512), multi-batch
        (1, 1500, 256, 4),  # whisper production length, 1500 → 3×512
    ],
)
def test_encoder_attention_matches_xla_f32(b, t, d, h):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    ref = np.asarray(_ref(q, k, v, h))
    got = np.asarray(encoder_attention(q, k, v, h, interpret=True))
    assert got.shape == ref.shape
    err = np.abs(got - ref).max()
    assert err < 1e-5, f"attention kernel err {err}"


def test_encoder_attention_bf16_inputs():
    """bf16 activations: scores and softmax stay f32 inside the kernel,
    matching the XLA path's f32-softmax cast (whisper.py:110)."""
    rng = np.random.default_rng(1)
    b, t, d, h = 1, 384, 128, 2
    q = jnp.asarray(rng.standard_normal((b, t, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, t, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, t, d)), jnp.bfloat16)
    ref = np.asarray(_ref(q, k, v, h), np.float32)
    got = np.asarray(encoder_attention(q, k, v, h, interpret=True), np.float32)
    assert got.dtype == ref.dtype
    err = np.abs(got - ref).max()
    assert err < 2e-2, f"bf16 attention kernel err {err}"


def test_padded_tail_softmax_isolated():
    """Padded key columns must not leak probability mass: compare a
    T=400 (padded to 512) run against numpy attention computed at T=400."""
    rng = np.random.default_rng(2)
    b, t, d, h = 1, 400, 64, 1
    q = rng.standard_normal((b, t, d)).astype(np.float32)
    k = rng.standard_normal((b, t, d)).astype(np.float32)
    v = rng.standard_normal((b, t, d)).astype(np.float32)
    scale = (d // h) ** -0.25
    s = (q[0] * scale) @ (k[0] * scale).T
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = p @ v[0]
    got = np.asarray(
        encoder_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), h,
                          interpret=True)
    )[0]
    err = np.abs(got - ref).max()
    assert err < 1e-5, f"padded-tail err {err}"
