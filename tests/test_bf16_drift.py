"""bf16-vs-f32 END-TO-END drift gate (VERDICT r4 weak #6).

Converts the real reference clip twice — compute_dtype float32 vs
bfloat16 — with IDENTICAL (shared, cast) weights and the same sampler
key, and pins the downstream effect of bf16 compute (whisper residual
stream, denoiser scan, vocoder) on the final waveform. The whisper
feature drift alone measured rel 1.83e-2 (BENCH_NOTES); this asserts the
WAVEFORM stays within a stated tolerance so future bf16 regressions trip
a test instead of only moving a benchmark.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svc_inference_pipeline_tpu.config import HParams
from svc_inference_pipeline_tpu.pipeline.convert import SVCPipeline

pytestmark = pytest.mark.slow  # two full-chain conversions on CPU


def _match_dtypes(src, dst):
    """src's values in dst's per-leaf dtypes (shared weights, cast once)."""
    return jax.tree.map(lambda s, d: jnp.asarray(s, d.dtype), src, dst)


@pytest.fixture(scope="module")
def pipes(cfg):
    d = cfg.to_dict()
    d["mapper"]["residual_layer_num"] = 2
    d["mapper"]["noise_schedule_factors"] = [0.0001, 0.02, 10]
    d["mapper"]["sampler"] = "ddpm"
    d["mapper"]["input_content_dim"]["whisper"] = 384
    d["vocoder"]["upsample_initial_channel"] = 128

    d["compute_dtype"] = "float32"
    p32 = SVCPipeline.from_config(HParams(**d), random_weights=True, whisper_size="tiny")
    d["compute_dtype"] = "bfloat16"
    p16 = SVCPipeline.from_config(HParams(**d), random_weights=True, whisper_size="tiny")

    # identical weights on both sides (cast to each side's storage dtype)
    p16.cond_params = _match_dtypes(p32.cond_params, p16.cond_params)
    p16.denoiser_params = _match_dtypes(p32.denoiser_params, p16.denoiser_params)
    p16.vocoder_params = _match_dtypes(p32.vocoder_params, p16.vocoder_params)
    p16.whisper.params = _match_dtypes(p32.whisper.params, p16.whisper.params)
    return p32, p16


def test_bf16_waveform_drift_bounded(pipes, test_wav):
    p32, p16 = pipes
    key = jax.random.PRNGKey(0)
    w32 = np.asarray(p32.convert(test_wav, "svcc_CDF1", key=key), np.float64)
    w16 = np.asarray(p16.convert(test_wav, "svcc_CDF1", key=key), np.float64)
    assert w32.shape == w16.shape

    err = w16 - w32
    snr = 10.0 * np.log10(np.sum(w32**2) / max(np.sum(err**2), 1e-30))
    corr = float(np.corrcoef(w16, w32)[0, 1])
    peak32 = float(np.abs(w32).max())
    rel_max = float(np.abs(err).max() / max(peak32, 1e-30))
    print(f"bf16 vs f32 e2e: SNR {snr:.1f} dB  corr {corr:.6f}  "
          f"rel-max {rel_max:.4f}")

    # GATE (measured 2026-08: SNR 18.8 dB, corr 0.9934 — BENCH_NOTES.md):
    # bf16 compute must stay in the same waveform as f32 — correlated and
    # bounded, not just "passes structural tests". Thresholds hold margin
    # over the measured drift so they catch regressions, not noise.
    # (rel-max is reported but not gated: with random weights a handful of
    # samples near the fade dominate it, swinging run to run.)
    assert snr >= 12.0, f"bf16 e2e SNR collapsed: {snr:.1f} dB (measured 18.8)"
    assert corr >= 0.97, f"bf16 e2e correlation collapsed: {corr:.4f} (measured 0.9934)"
