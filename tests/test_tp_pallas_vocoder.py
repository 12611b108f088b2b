"""TP inference keeps the fused Pallas vocoder kernels (VERDICT r3 item #3).

The overlap-save time-chunked vocoder (parallel/tp_vocoder.py) must match
the unchunked generator to float tolerance — both as a pure function and
end-to-end through ``SVCPipeline.convert`` on the 8-device CPU mesh with
``use_pallas_vocoder`` forced on (the kernels run in interpret mode off
TPU). No reference counterpart: capability beyond
/root/reference/modules/bigvgan.py:519-632 per SURVEY §2.9.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svc_inference_pipeline_tpu.config import HParams
from svc_inference_pipeline_tpu.parallel.mesh import make_mesh
from svc_inference_pipeline_tpu.parallel.tp_vocoder import (
    chunked_vocoder_apply,
    vocoder_receptive_radius,
)

# slow: >2 min on the 1-CPU CI host (per-file durations audit, BENCH_NOTES.md)
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices"),
]


def _small_vocoder(cfg, channels=64):
    from svc_inference_pipeline_tpu.models.bigvgan import BigVGANGenerator

    d = cfg.to_dict()
    d["vocoder"]["upsample_initial_channel"] = channels
    small = HParams(**d)
    gen = BigVGANGenerator(small.vocoder, compute_dtype=jnp.float32)
    mel = jnp.asarray(
        0.1 * np.random.default_rng(0).standard_normal((1, 64, 100)), jnp.float32
    )
    params = gen.init(jax.random.PRNGKey(0), mel)["params"]
    # amplify: lecun-init activations decay to ~1e-8 through the stack,
    # which would mask a halo bug below float tolerance
    params = jax.tree_util.tree_map(
        lambda x: x * 6.0 if x.ndim >= 2 else x, params
    )
    return small, gen, params


def test_chunked_matches_full(cfg):
    """Pure-function overlap-save parity at the analytic halo."""
    small, gen, params = _small_vocoder(cfg)
    halo = vocoder_receptive_radius(small.vocoder)
    t = 4 * max(halo, 48)  # 4 chunks, each ≥ halo frames
    mel = jnp.asarray(
        0.1 * np.random.default_rng(1).standard_normal((2, t, 100)), jnp.float32
    )
    apply_fn = lambda m: gen.apply({"params": params}, m)  # noqa: E731
    full = np.asarray(apply_fn(mel))
    chunked = np.asarray(
        chunked_vocoder_apply(apply_fn, mel, n_chunks=4, halo=halo, hop=256)
    )
    assert chunked.shape == full.shape
    np.testing.assert_allclose(chunked, full, rtol=1e-5, atol=1e-5)


def test_chunked_detects_insufficient_halo(cfg):
    """With the halo far below the structural radius the seams MUST differ —
    proving the parity above is a real check, not vacuous."""
    small, gen, params = _small_vocoder(cfg)
    t = 4 * 64
    mel = jnp.asarray(
        0.5 * np.random.default_rng(2).standard_normal((1, t, 100)), jnp.float32
    )
    apply_fn = lambda m: gen.apply({"params": params}, m)  # noqa: E731
    full = np.asarray(apply_fn(mel))
    broken = np.asarray(
        chunked_vocoder_apply(apply_fn, mel, n_chunks=4, halo=2, hop=256)
    )
    assert np.abs(broken - full).max() > 1e-4


def test_chunked_fallback_short_input(cfg):
    """Inputs too short to chunk exactly fall back to the plain call."""
    small, gen, params = _small_vocoder(cfg)
    mel = jnp.asarray(
        0.1 * np.random.default_rng(3).standard_normal((1, 48, 100)), jnp.float32
    )
    apply_fn = lambda m: gen.apply({"params": params}, m)  # noqa: E731
    out = np.asarray(
        chunked_vocoder_apply(apply_fn, mel, n_chunks=4, halo=69, hop=256)
    )
    np.testing.assert_array_equal(out, np.asarray(apply_fn(mel)))


def test_tp_pipeline_keeps_pallas_and_matches_single(cfg, test_wav):
    """End-to-end: convert() on a 2x4 mesh with use_pallas_vocoder=True —
    vocoder params stay replicated, the chunked path is active, and the
    waveform matches the single-device Pallas run."""
    from svc_inference_pipeline_tpu.pipeline.convert import SVCPipeline

    d = cfg.to_dict()
    d["mapper"]["noise_schedule_factors"] = [0.0001, 0.02, 10]
    d["mapper"]["residual_layer_num"] = 2
    d["mapper"]["sampler"] = "plms"
    d["vocoder"]["upsample_initial_channel"] = 256
    d["use_pallas_vocoder"] = True  # interpret mode on CPU
    d["compute_dtype"] = "float32"
    small = HParams(**d)

    ref_pipe = SVCPipeline.from_config(small, random_weights=True, whisper_size="tiny")
    assert ref_pipe._voc_chunks == 1
    ref = ref_pipe.convert(test_wav, "svcc_CDF1", key=jax.random.PRNGKey(0))

    mesh = make_mesh(data=2, model=4)
    tp_pipe = SVCPipeline(
        ref_pipe.cfg,
        ref_pipe.cond_params,
        ref_pipe.denoiser_params,
        ref_pipe.vocoder_params,
        ref_pipe.whisper,
        mesh=mesh,
    )
    assert tp_pipe.tp
    assert tp_pipe._voc_chunks == 4
    # vocoder params REPLICATED (not channel-sharded) on the Pallas TP path
    k = tp_pipe.vocoder_params["conv_pre"]["conv"]["kernel"]
    assert {s.data.shape for s in k.addressable_shards} == {k.shape}
    with mesh:
        out = tp_pipe.convert(test_wav, "svcc_CDF1", key=jax.random.PRNGKey(0))
    assert out.shape == ref.shape
    # TP changes f32 reduction order in the denoiser; the PLMS recursion
    # amplifies that on a handful of samples (same bound as the XLA TP test)
    err = np.abs(out - ref)
    assert np.quantile(err, 0.999) < 5e-4, np.quantile(err, 0.999)
    assert err.max() < 0.05, err.max()
