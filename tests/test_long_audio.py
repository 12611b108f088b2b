"""Long-audio (>30 s) conversion: chunked Whisper encoding.

The reference silently loses content conditioning past 30 s (input hard
pad/trimmed, whisper_extractor/audio.py:52-73; features capped at 1500
frames, utils/whisper.py:52-56). Here the encoder runs batched 30 s
windows, so the full clip converts.
"""

import numpy as np
import pytest

from svc_inference_pipeline_tpu.ops.remap import remap_features

# >2 min on the 1-CPU CI host (per-file durations audit, BENCH_NOTES.md)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def pipe(cfg):
    from svc_inference_pipeline_tpu.config import HParams
    from svc_inference_pipeline_tpu.pipeline.convert import SVCPipeline

    d = cfg.to_dict()
    d["mapper"]["noise_schedule_factors"] = [0.0001, 0.02, 20]
    d["mapper"]["residual_layer_num"] = 2
    d["mapper"]["sampler"] = "plms"
    d["vocoder"]["upsample_initial_channel"] = 128  # 6 halvings → 2 ch min
    return SVCPipeline.from_config(HParams(**d), random_weights=True, whisper_size="tiny")


def test_long_clip_full_coverage(pipe):
    fs = 24000
    dur = 35  # > 30 s
    t = np.arange(dur * fs) / fs
    audio = (0.3 * np.sin(2 * np.pi * 220 * t) + 0.1 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)

    batch, n_frames = pipe.extract_features(audio, "svcc_CDF1")
    mel_len = pipe.mel_frame_count(len(audio))
    # no 2812-frame truncation: full clip is conditioned
    assert n_frames == mel_len > 2812

    wave = pipe.convert(audio, "svcc_CDF1")
    assert len(wave) == n_frames * 256
    assert np.isfinite(wave).all()


def test_remap_uncapped_for_chunked_sources():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((3000, 8)).astype(np.float32)  # 2 windows' worth
    out = remap_features(feats, 5000, max_source_len=feats.shape[0])
    assert out.shape == (5000, 8)


def test_short_clip_unchanged(pipe):
    """≤30 s must follow the exact single-window reference contract."""
    fs = 24000
    audio = np.sin(2 * np.pi * 220 * np.arange(4 * fs) / fs).astype(np.float32)
    batch, n_frames = pipe.extract_features(audio, "svcc_CDF1")
    assert n_frames == pipe.mel_frame_count(len(audio))
    feats = pipe.whisper.extract(audio, n_frames)
    assert feats.shape[0] == n_frames
