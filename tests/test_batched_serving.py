"""Batched front-end equivalence + serving request coalescing (VERDICT r1 #9)."""

import threading

import jax
import numpy as np
import pytest

from svc_inference_pipeline_tpu.config import HParams
from svc_inference_pipeline_tpu.pipeline.convert import SVCPipeline

# >2 min on the 1-CPU CI host (per-file durations audit, BENCH_NOTES.md)
pytestmark = pytest.mark.slow


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


def _wav_bytes(tone):
    import os
    import tempfile

    from svc_inference_pipeline_tpu.utils.audio_io import write_wav

    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as tf:
        write_wav(tf.name, tone, 24000)
        data = open(tf.name, "rb").read()
        os.unlink(tf.name)
    return data


def test_poison_request_fails_alone(pipe, monkeypatch):
    """A batch failure is logged, counted, and retried per-request exactly
    once — the poison request fails alone, its batchmates still convert
    (VERDICT r2 weak #4)."""
    import logging

    from svc_inference_pipeline_tpu.serving import SVCServer
    from svc_inference_pipeline_tpu.utils.observability import get_logger

    real_convert = pipe.convert

    def bad_batch(wavs, singers, key=None, **kw):
        raise RuntimeError("simulated systemic batch failure")

    def picky_convert(wav, singer, **kw):
        # poison marker: leading sample near full scale
        if abs(np.asarray(wav)[0]) > 0.8:
            raise ValueError("poison clip")
        return real_convert(wav, singer, **kw)

    monkeypatch.setattr(pipe, "convert_batch", bad_batch)
    monkeypatch.setattr(pipe, "convert", picky_convert)

    poison = np.full(12000, 0.9, np.float32)
    good = _tone(220.0, 0.5)

    server = SVCServer(pipe, pipe.cfg, coalesce_ms=3000.0, max_batch=2)
    try:
        results, errors = [None, None], [None, None]

        def work(i, payload):
            try:
                results[i] = server.convert_bytes(payload, "svcc_CDF1")
            except Exception as e:  # noqa: BLE001
                errors[i] = e

        # the serving logger sets propagate=False, so caplog can't see it —
        # attach a capturing handler directly
        records = []

        class _Capture(logging.Handler):
            def emit(self, record):
                records.append(record)

        log = get_logger("svc_tpu.serving")
        capture = _Capture(level=logging.ERROR)
        log.addHandler(capture)
        try:
            threads = [
                threading.Thread(target=work, args=(0, _wav_bytes(poison))),
                threading.Thread(target=work, args=(1, _wav_bytes(good))),
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=600)
        finally:
            log.removeHandler(capture)

        assert isinstance(errors[0], ValueError)  # poison fails alone
        assert results[1] is not None and results[1][:4] == b"RIFF"
        assert server.batch_failures == 1
        assert any("convert_batch failed" in r.getMessage() for r in records), \
            "the batch root cause must be logged, not swallowed"
    finally:
        server.close()


def test_single_request_batch_failure_fails_fast(pipe, monkeypatch):
    """A failing batch of ONE is not retried — the error surfaces directly."""
    from svc_inference_pipeline_tpu.serving import SVCServer

    calls = {"convert": 0}

    def bad_batch(wavs, singers, key=None, **kw):
        raise RuntimeError("boom")

    def count_convert(wav, singer, **kw):
        calls["convert"] += 1
        raise AssertionError("must not retry a singleton batch")

    monkeypatch.setattr(pipe, "convert_batch", bad_batch)
    monkeypatch.setattr(pipe, "convert", count_convert)

    server = SVCServer(pipe, pipe.cfg, coalesce_ms=1.0, max_batch=2)
    try:
        with pytest.raises(RuntimeError, match="boom"):
            server.convert_bytes(_wav_bytes(_tone(220.0, 0.3)), "svcc_CDF1")
        assert calls["convert"] == 0
    finally:
        server.close()


def test_closed_server_rejects_and_drains(pipe):
    """After close(): new requests fail immediately; a queued request past
    the drain deadline fails fast — its waiter gets an error + event,
    never a hang."""
    from svc_inference_pipeline_tpu.serving import SVCServer, _Request

    server = SVCServer(pipe, pipe.cfg, coalesce_ms=1.0, max_batch=2)
    server.close(drain_s=0)  # deadline already past: fail-fast drain
    server.worker.join(timeout=30)
    assert not server.worker.is_alive()
    # new requests are rejected up front once closed
    with pytest.raises(RuntimeError, match="closed"):
        server.convert_bytes(_wav_bytes(_tone(220.0, 0.2)), "svcc_CDF1")
    # a request that slipped into the queue around shutdown
    stranded = _Request(np.zeros(4, np.float32), "svcc_CDF1")
    server.queue.put(stranded)
    server._drain()
    assert stranded.event.is_set()
    assert isinstance(stranded.error, RuntimeError)


def test_drain_deadline_still_converts(pipe):
    """A request already queued when close() lands still CONVERTS while
    the drain deadline holds (VERDICT r4 #4: drain-on-shutdown deadline)."""
    from svc_inference_pipeline_tpu.serving import SVCServer, _Request

    server = SVCServer(pipe, pipe.cfg, coalesce_ms=1.0, max_batch=2)
    server.close(drain_s=120.0)
    server.worker.join(timeout=30)
    audio = _tone(220.0, 0.3)
    late = _Request(audio, "svcc_CDF1",
                    frames=pipe.mel_frame_count(len(audio)))
    server.queue.put(late)
    server._drain()
    assert late.event.is_set()
    assert late.error is None
    assert late.result is not None and len(np.asarray(late.result)) > 0


def test_degenerate_clip_rejected_up_front(pipe):
    """A clip shorter than one mel hop is a 400-class client error at the
    door — not a zero-size-reduction crash deep inside F0 extraction."""
    from svc_inference_pipeline_tpu.serving import SVCServer

    server = SVCServer(pipe, pipe.cfg, coalesce_ms=1.0, max_batch=2)
    try:
        with pytest.raises(ValueError, match="too short"):
            server.convert_bytes(_wav_bytes(np.zeros(4, np.float32)), "svcc_CDF1")
    finally:
        server.close(drain_s=0)
        server.worker.join(timeout=30)


def test_length_class_bounds_padding_inflation():
    """Power-of-two classes: ≤2× padding inflation inside a group."""
    from svc_inference_pipeline_tpu.serving import MIN_LENGTH_CLASS, length_class

    assert length_class(0) == MIN_LENGTH_CLASS
    assert length_class(MIN_LENGTH_CLASS) == MIN_LENGTH_CLASS
    assert length_class(MIN_LENGTH_CLASS + 1) == 2 * MIN_LENGTH_CLASS
    assert length_class(2812) == 4096  # a 30 s clip
    assert length_class(282) == 512  # a 3 s clip — never batched with 30 s


def test_serving_groups_by_length_class(pipe, monkeypatch):
    """A long request coalesced with short ones converts in a SEPARATE
    convert_batch call — its padded bucket must not inflate the short
    requests' denoiser/vocoder work (VERDICT r3 weak #4)."""
    from svc_inference_pipeline_tpu.serving import SVCServer

    real_batch = pipe.convert_batch
    calls = []

    def spy_batch(wavs, singers, **kw):
        calls.append([len(w) for w in wavs])
        return real_batch(wavs, singers, **kw)

    monkeypatch.setattr(pipe, "convert_batch", spy_batch)

    short = [_tone(f, 0.5) for f in (220.0, 262.0, 330.0)]  # ~47 frames each
    long_clip = _tone(196.0, 4.0)  # ~376 frames → a different pow-2 class

    server = SVCServer(pipe, pipe.cfg, coalesce_ms=3000.0, max_batch=4)
    try:
        payloads = [_wav_bytes(c) for c in short] + [_wav_bytes(long_clip)]
        results = [None] * 4

        def work(i):
            results[i] = server.convert_bytes(payloads[i], "svcc_CDF1")

        threads = [threading.Thread(target=work, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)

        assert all(r is not None and r[:4] == b"RIFF" for r in results)
        assert len(calls) == 2, f"expected 2 length-class groups, got {calls}"
        sizes = sorted(len(c) for c in calls)
        assert sizes == [1, 3]  # the long clip converts alone
        # the short group's device batch never saw the long clip
        short_group = next(c for c in calls if len(c) == 3)
        assert max(short_group) < len(long_clip)
        assert server.batches == 2
    finally:
        server.close()


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
