"""Streaming conversion (pipeline/streaming.py).

Structural contract on the tiny CPU pipeline: chunk partitioning covers
the input exactly, seams are crossfaded (no discontinuity spikes), the
executable is reused across chunks (one compiled shape), and the stream
is deterministic under a fixed key.
"""

import numpy as np
import pytest

from svc_inference_pipeline_tpu.pipeline.convert import SVCPipeline

# >2 min on the 1-CPU CI host (per-file durations audit, BENCH_NOTES.md)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def pipe(cfg):
    d = cfg.to_dict()
    d["mapper"]["noise_schedule_factors"] = [0.0001, 0.02, 10]
    d["mapper"]["residual_layer_num"] = 2
    d["mapper"]["sampler"] = "plms"
    d["vocoder"]["upsample_initial_channel"] = 64
    from svc_inference_pipeline_tpu.config import HParams

    return SVCPipeline.from_config(HParams(**d), random_weights=True, whisper_size="tiny")


@pytest.fixture(scope="module")
def long_audio(test_wav):
    from svc_inference_pipeline_tpu.utils.audio_io import load_audio

    a, fs = load_audio(test_wav, 24000)
    a = np.asarray(a)
    return np.tile(a, 3)[: int(10.5 * 24000)]  # 10.5 s


def test_stream_partitions_input(pipe, long_audio):
    import jax

    chunks = list(pipe.convert_streaming(
        long_audio, "svcc_CDF1", chunk_seconds=4.0, context_seconds=0.5,
        key=jax.random.PRNGKey(0),
    ))
    assert len(chunks) == 3  # ceil(10.5 / 4)
    total = sum(len(c) for c in chunks)
    assert total == len(long_audio)
    assert all(np.isfinite(c).all() for c in chunks)
    assert max(np.abs(c).max() for c in chunks) > 1e-4  # non-silent


def test_stream_seams_are_smooth(pipe, long_audio):
    import jax

    chunks = list(pipe.convert_streaming(
        long_audio, "svcc_CDF1", chunk_seconds=4.0, context_seconds=0.5,
        key=jax.random.PRNGKey(1),
    ))
    wave = np.concatenate(chunks)
    d = np.abs(np.diff(wave))
    typical = np.percentile(d, 99.9)
    pos = 0
    for c in chunks[:-1]:
        pos += len(c)
        seam = d[pos - 2 : pos + 1].max()
        assert seam <= max(5.0 * typical, 1e-3), (pos, seam, typical)


def test_stream_single_executable(pipe, long_audio):
    """Every chunk must hit the same compiled core (fixed device shape)."""
    import jax

    sizes = set()
    orig = pipe.extract_features

    def spy(wav, singer, **kw):
        batch, n = orig(wav, singer, **kw)
        sizes.add(batch["melody"].shape)
        return batch, n

    pipe.extract_features = spy
    try:
        list(pipe.convert_streaming(
            long_audio, "svcc_CDF1", chunk_seconds=4.0, context_seconds=0.5,
            key=jax.random.PRNGKey(0),
        ))
    finally:
        pipe.extract_features = orig
    assert len(sizes) == 1, sizes


def test_stream_deterministic(pipe, long_audio):
    import jax

    a = np.concatenate(list(pipe.convert_streaming(
        long_audio, "svcc_CDF1", chunk_seconds=4.0, context_seconds=0.5,
        key=jax.random.PRNGKey(7),
    )))
    b = np.concatenate(list(pipe.convert_streaming(
        long_audio, "svcc_CDF1", chunk_seconds=4.0, context_seconds=0.5,
        key=jax.random.PRNGKey(7),
    )))
    np.testing.assert_array_equal(a, b)


def test_short_input_passthrough(pipe, test_wav):
    """Input shorter than one chunk degrades to plain convert."""
    import jax

    from svc_inference_pipeline_tpu.utils.audio_io import load_audio

    a, _ = load_audio(test_wav, 24000)
    chunks = list(pipe.convert_streaming(
        np.asarray(a), "svcc_CDF1", chunk_seconds=10.0, key=jax.random.PRNGKey(0)
    ))
    assert len(chunks) == 1
