"""Batched front-end equivalence + serving request coalescing (VERDICT r1 #9)."""

import threading

import jax
import numpy as np
import pytest

from svc_inference_pipeline_tpu.config import HParams
from svc_inference_pipeline_tpu.pipeline.convert import SVCPipeline


@pytest.fixture(scope="module")
def pipe(cfg):
    d = cfg.to_dict()
    d["mapper"]["noise_schedule_factors"] = [0.0001, 0.02, 10]
    d["mapper"]["residual_layer_num"] = 2
    d["mapper"]["sampler"] = "plms"
    d["vocoder"]["upsample_initial_channel"] = 128
    d["compute_dtype"] = "float32"
    small = HParams(**d)
    return SVCPipeline.from_config(small, random_weights=True, whisper_size="tiny")


def _tone(f, dur, fs=24000):
    t = np.arange(int(dur * fs)) / fs
    return (0.4 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_batched_frontend_matches_per_clip(pipe):
    """One batched whisper-encode dispatch ≡ the per-clip front-end."""
    clips = [_tone(220.0, 1.0), _tone(330.0, 0.6)]  # heterogeneous lengths
    singers = ["svcc_CDF1", "svcc_CDM1"]

    merged, counts = pipe.extract_features_batch(clips, singers)
    b = len(clips)
    padded = merged["melody"].shape[1]
    assert merged["content_whisper"].shape[0] == b
    assert merged["singer"].shape == (b, 1)

    for i, (clip, singer) in enumerate(zip(clips, singers)):
        single, n = pipe.extract_features(clip, singer)
        assert counts[i] == n
        sp = single["melody"].shape[1]
        m = min(sp, padded)
        # melody (host F0) must be identical
        np.testing.assert_allclose(
            np.asarray(merged["melody"])[i, :m], np.asarray(single["melody"])[0, :m],
            atol=1e-6,
        )
        # loudness/content: identical away from the batch-padding tail
        # (the last ≤4 frames of shorter clips see the rectangular block's
        # zero padding instead of that clip's own reflect pad)
        interior = min(n - 4, m)
        np.testing.assert_allclose(
            np.asarray(merged["loudness"])[i, :interior],
            np.asarray(single["loudness"])[0, :interior],
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(merged["content_whisper"])[i, :interior],
            np.asarray(single["content_whisper"])[0, :interior],
            rtol=1e-3, atol=2e-3,
        )
        # masked to zero beyond the clip's true frames
        assert np.abs(np.asarray(merged["loudness"])[i, n:]).max() == 0.0


def test_convert_batch_end_to_end(pipe):
    clips = [_tone(220.0, 0.8), _tone(277.0, 0.5), _tone(330.0, 0.8)]
    singers = ["svcc_CDF1", "svcc_CDM1", "svcc_IDF1"]
    waves = pipe.convert_batch(clips, singers, key=jax.random.PRNGKey(0))
    assert len(waves) == 3
    for clip, w in zip(clips, waves):
        n = pipe.mel_frame_count(len(clip))
        assert len(w) == n * pipe.cfg.hop_length
        assert np.isfinite(w).all()
        assert abs(w[-1]) < 1e-5  # true-length fade hits zero


def test_serving_coalesces_concurrent_requests(pipe):
    """4 concurrent requests → ONE convert_batch call."""
    import io

    from svc_inference_pipeline_tpu.serving import SVCServer
    from svc_inference_pipeline_tpu.utils.audio_io import write_wav

    server = SVCServer(pipe, pipe.cfg, coalesce_ms=3000.0, max_batch=4)
    try:
        import tempfile, os

        payloads = []
        for f in (220.0, 262.0, 330.0, 392.0):
            with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as tf:
                write_wav(tf.name, _tone(f, 0.5), 24000)
                payloads.append(open(tf.name, "rb").read())
                os.unlink(tf.name)

        results = [None] * 4
        def work(i):
            results[i] = server.convert_bytes(payloads[i], "svcc_CDF1")

        threads = [threading.Thread(target=work, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert all(r is not None and r[:4] == b"RIFF" for r in results)
        assert server.conversions == 4
        assert server.batches == 1, "requests must coalesce into one batch"
    finally:
        server.close()
