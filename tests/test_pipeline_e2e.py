"""End-to-end pipeline tests (random weights — the reference ships no
checkpoints; structure, shapes, determinism, and golden-file DSP metrics)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svc_inference_pipeline_tpu.pipeline.convert import SVCPipeline, pad_to_bucket

# >2 min on the 1-CPU CI host (per-file durations audit, BENCH_NOTES.md)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def fast_cfg(cfg):
    """Small-footprint config for CPU e2e: PLMS with a 50-step schedule,
    4 residual layers, tiny vocoder channels."""
    c = cfg.replace()
    d = c.to_dict()
    d["mapper"]["noise_schedule_factors"] = [0.0001, 0.02, 50]
    d["mapper"]["residual_layer_num"] = 4
    d["mapper"]["sampler"] = "plms"
    d["mapper"]["plms_speedup"] = 10
    d["vocoder"]["upsample_initial_channel"] = 64
    from svc_inference_pipeline_tpu.config import HParams

    return HParams(**d)


@pytest.fixture(scope="module")
def pipe(fast_cfg):
    return SVCPipeline.from_config(fast_cfg, random_weights=True, whisper_size="tiny")


def test_pad_to_bucket():
    assert pad_to_bucket(1) == 64
    assert pad_to_bucket(64) == 64
    assert pad_to_bucket(65) == 128


def test_extract_features_contract(pipe, test_wav):
    batch, n_frames = pipe.extract_features(test_wav, "svcc_CDF1")
    padded = batch["melody"].shape[1]
    assert padded % 64 == 0 and padded >= n_frames
    # tiny whisper in smoke mode → 384-wide content features
    assert batch["content_whisper"].shape == (1, padded, pipe.whisper.dims.n_audio_state)
    assert batch["loudness"].shape == (1, padded)
    assert batch["singer"].shape == (1, 1) and batch["singer"][0, 0] == 1
    # pitch shift aligned the voiced median to the target singer's
    voiced = batch["melody"][0][batch["melody"][0] > 0]
    assert abs(np.median(voiced) - 223.2578) < 2.0


def test_convert_end_to_end(pipe, test_wav, tmp_path):
    out = str(tmp_path / "converted.wav")
    wave = pipe.convert(test_wav, "svcc_CDF1", key=jax.random.PRNGKey(0), output_path=out)
    assert wave.ndim == 1
    assert np.isfinite(wave).all()
    # output length = n_frames * hop
    _, n_frames = pipe.extract_features(test_wav, "svcc_CDF1")
    assert len(wave) == n_frames * 256
    # tail fade-out to zero
    assert abs(wave[-1]) < 1e-5
    assert os.path.exists(out)

    from svc_inference_pipeline_tpu.utils.audio_io import read_wav

    saved, sr = read_wav(out)
    assert sr == 24000
    # ±50 ms silence added by save_audio
    assert saved.shape[0] == len(wave) + 2 * (24000 // 20)


def test_pcm16_upload_matches_float(pipe, test_wav):
    """upload_pcm16 front-end ≈ float front-end: the ±2⁻¹⁶ waveform
    quantisation must stay below audible/feature-level tolerances.

    The pipe runs the production bf16 whisper stream: a ±2⁻¹⁶ input
    perturbation flips bf16 rounding through 4 encoder blocks, so the
    content features carry bf16-ULP-class deltas (~1e-2 rel) on top of
    the quantisation itself — the bf16 tolerance reflects that class,
    while the f32-computed features (mel/F0/loudness) stay tight."""
    a, na = pipe.extract_features(test_wav, "svcc_CDF1")
    b, nb = pipe.extract_features(test_wav, "svcc_CDF1", upload_pcm16=True)
    assert na == nb
    whisper_bf16 = pipe.whisper.encoder.compute_dtype == jnp.bfloat16
    for k in a:
        x, y = np.asarray(a[k], np.float32), np.asarray(b[k], np.float32)
        assert x.shape == y.shape, k
        scale = max(np.abs(x).max(), 1e-6)
        tol = 3e-2 if (whisper_bf16 and k == "content_whisper") else 2e-3
        assert np.abs(x - y).max() / scale < tol, (k, np.abs(x - y).max())


def test_convert_deterministic_with_key(pipe, test_wav):
    a = pipe.convert(test_wav, "svcc_CDF1", key=jax.random.PRNGKey(1))
    b = pipe.convert(test_wav, "svcc_CDF1", key=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(a, b)


def test_convert_batch_multi_singer(pipe, test_wav):
    waves = pipe.convert_batch(
        [test_wav, test_wav], ["svcc_CDF1", "svcc_IDM1"], key=jax.random.PRNGKey(0)
    )
    assert len(waves) == 2
    assert all(np.isfinite(w).all() for w in waves)
    # different singer conditioning must change the output
    assert np.abs(waves[0] - waves[1]).max() > 1e-6


def test_golden_wav_structure(golden_wav):
    """The committed reference output's documented invariants hold for our
    writer too: 24 kHz, 99,424 samples = 4.05 s source resampled + 2×50 ms
    silence (SURVEY §4)."""
    from svc_inference_pipeline_tpu.utils.audio_io import read_wav

    gen, sr = read_wav(golden_wav)
    assert sr == 24000
    n_core = gen.shape[0] - 2 * (24000 // 20)
    # frames*hop for the 4.05 s source: 379 frames × 256 = 97,024
    assert n_core == 379 * 256


def test_convert_multi_singer_shares_frontend(pipe, test_wav):
    waves = pipe.convert_multi_singer(test_wav, ["svcc_CDF1", "svcc_IDM1", "svcc_IDF1"])
    assert len(waves) == 3
    assert all(np.isfinite(w).all() for w in waves)
    assert len({len(w) for w in waves}) == 1
    # singer conditioning differentiates outputs
    assert np.abs(waves[0] - waves[1]).max() > 1e-6


def test_set_sampler_switches_paths(pipe, test_wav):
    import jax

    a = pipe.convert(test_wav, "svcc_CDF1", key=jax.random.PRNGKey(0))
    pipe.set_sampler("ddim", speedup=10)
    b = pipe.convert(test_wav, "svcc_CDF1", key=jax.random.PRNGKey(0))
    pipe.set_sampler("plms", speedup=10)
    c = pipe.convert(test_wav, "svcc_CDF1", key=jax.random.PRNGKey(0))
    pipe.set_sampler("dpmpp", speedup=10)
    d = pipe.convert(test_wav, "svcc_CDF1", key=jax.random.PRNGKey(0))
    assert len(a) == len(b) == len(c) == len(d)
    # different sampler trajectories → different waveforms
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6
    assert np.isfinite(b).all() and np.isfinite(c).all() and np.isfinite(d).all()
