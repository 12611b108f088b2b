"""Whisper decoding surface: tokenizer round-trip, greedy decode mechanics,
language detection and sliding-window transcription on a tiny random model."""

import numpy as np
import pytest

from svc_inference_pipeline_tpu.models.whisper import WhisperDims
from svc_inference_pipeline_tpu.models.whisper_decoding import (
    LANGUAGES,
    DecodingOptions,
    WhisperDecoder,
    get_tokenizer,
)


@pytest.fixture(scope="module")
def tokenizer():
    try:
        return get_tokenizer(multilingual=True)
    except FileNotFoundError:
        pytest.skip("vendored tokenizer assets unavailable")


@pytest.fixture(scope="module")
def tiny_decoder(tokenizer):
    import jax

    from svc_inference_pipeline_tpu.models.whisper import (
        WhisperAudioEncoder,
        WhisperTextDecoder,
    )
    from svc_inference_pipeline_tpu.utils.devices import fast_random_params

    dims = WhisperDims(80, 1500, 64, 4, 2, len(tokenizer.tokenizer) + 110, 448, 64, 4, 2)
    enc = WhisperAudioEncoder(dims)
    dec = WhisperTextDecoder(dims)
    import jax.numpy as jnp

    enc_params = fast_random_params(
        lambda: enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 3000)))
    )["params"]
    dec_params = fast_random_params(
        lambda: dec.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, 3), jnp.int32),
            jnp.zeros((1, dims.n_audio_ctx, dims.n_audio_state)),
        )
    )["params"]
    return WhisperDecoder(dims, enc_params, dec_params)


def test_tokenizer_roundtrip(tokenizer):
    text = "hello singing world"
    ids = tokenizer.encode(text)
    assert tokenizer.decode(ids) == text


def test_tokenizer_special_layout(tokenizer):
    assert tokenizer.eot == 50257
    assert tokenizer.sot == 50258
    assert len(tokenizer.language_tokens) == len(LANGUAGES) == 99
    seq = tokenizer.sot_sequence("en", "transcribe")
    assert seq[0] == tokenizer.sot
    assert seq[1] == tokenizer.language_tokens[0]  # en is first
    assert seq[2] == tokenizer.transcribe_token


def test_greedy_decode_runs(tiny_decoder, tokenizer):
    import jax.numpy as jnp

    feats = tiny_decoder.embed_audio(jnp.zeros((1, 80, 3000)))
    result = tiny_decoder.greedy_decode(
        feats, tokenizer,
        DecodingOptions(sample_len=8, language="en", without_timestamps=True),
    )
    assert isinstance(result.text, str)
    assert all(t < tokenizer.eot + 110 for t in result.tokens)
    assert np.isfinite(result.avg_logprob)
    assert 0.0 <= result.no_speech_prob <= 1.0


def test_incremental_matches_full_prefix(tiny_decoder, tokenizer):
    """O(1)-per-token decoding must equal the full-prefix recompute."""
    import jax.numpy as jnp

    feats = tiny_decoder.embed_audio(jnp.zeros((1, 80, 3000)))
    prefix = np.asarray(
        [tokenizer.sot_sequence("en") + [tokenizer.no_timestamps, 11, 42, 7]],
        np.int32,
    )

    # full-prefix: one decoder pass over all tokens
    full_logits, _ = tiny_decoder.decoder.apply(
        {"params": tiny_decoder.decoder_params}, jnp.asarray(prefix), feats
    )
    full_logits = np.asarray(full_logits)

    # incremental: prime on the first 4, then feed one token at a time
    inc = tiny_decoder.incremental
    logits0, cache, offset = inc.prime(prefix[:, :4], feats)
    np.testing.assert_allclose(logits0, full_logits[:, :4], rtol=2e-4, atol=2e-4)
    for i in range(4, prefix.shape[1]):
        step_logits, cache = inc.step(prefix[:, i : i + 1], feats, cache, offset)
        offset += 1
        np.testing.assert_allclose(
            step_logits, full_logits[:, i], rtol=2e-4, atol=2e-4
        )


def test_detect_language_distribution(tiny_decoder, tokenizer):
    import jax.numpy as jnp

    feats = tiny_decoder.embed_audio(jnp.zeros((1, 80, 3000)))
    lang, probs = tiny_decoder.detect_language(feats, tokenizer)
    assert lang in LANGUAGES
    assert abs(sum(probs.values()) - 1.0) < 1e-3


def test_transcribe_windows(tiny_decoder, tokenizer):
    audio = np.random.RandomState(0).randn(16000 * 35).astype(np.float32) * 0.1
    out = tiny_decoder.transcribe(
        audio, tokenizer,
        DecodingOptions(sample_len=4, language="en", without_timestamps=True),
        no_speech_threshold=None,
    )
    if out["segments"]:  # random weights may decode to empty text
        assert out["segments"][0]["start"] == 0.0
        assert all(s["end"] <= 35.0 + 1e-6 for s in out["segments"])


def test_transcribe_temperature_fallback(tiny_decoder, tokenizer):
    """Degenerate (repetitive) greedy output triggers temperature escalation
    without crashing; the ladder runs to the end."""
    audio = np.zeros(16000 * 2, dtype=np.float32)
    out = tiny_decoder.transcribe(
        audio, tokenizer,
        DecodingOptions(sample_len=6, language="en", without_timestamps=True),
        temperatures=(0.0, 0.5), logprob_threshold=1e9,  # force at least one fallback
        no_speech_threshold=None,
    )
    assert isinstance(out["text"], str)


def test_pack_data_api():
    from svc_inference_pipeline_tpu.utils.audio_io import pack_data

    out = pack_data({"melody": np.zeros(7, np.float32), "singer": np.array([1], np.int32)})
    assert out["melody"].shape == (1, 7)
    assert out["singer"].shape == (1, 1)


def test_transcribe_cli_parser():
    """CLI surface mirrors the reference's transcribe CLI flags
    (transcribe.py:254-330)."""
    from svc_inference_pipeline_tpu.transcribe import build_parser

    p = build_parser()
    a = p.parse_args(["x.wav", "--model", "tiny", "--beam_size", "3",
                      "--task", "translate", "--output_format", "srt"])
    assert a.audio == ["x.wav"] and a.beam_size == 3
    assert a.task == "translate" and a.output_format == "srt"
    assert a.suppress_tokens == "-1" and a.condition_on_previous_text is True
