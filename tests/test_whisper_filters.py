"""Logit-filter suite parity: suppress-list construction and special-token
layout against the reference's own tokenizer module, SuppressBlank /
SuppressTokens / ApplyTimestampRules behaviour against direct ports of the
reference filter logic (decoding.py:367-442), and timestamp segmentation
through a scripted decoder."""

import importlib.util
import os
import sys

import numpy as np
import pytest

from svc_inference_pipeline_tpu.models.whisper_decoding import (
    ApplyTimestampRules,
    DecodingOptions,
    SuppressBlank,
    SuppressTokens,
    build_suppress_tokens,
    format_timestamp,
    get_tokenizer,
)

REF_TOKENIZER = "/root/reference/utils/whisper_extractor/tokenizer.py"


@pytest.fixture(scope="module")
def tokenizer():
    try:
        return get_tokenizer(multilingual=True)
    except FileNotFoundError:
        pytest.skip("vendored tokenizer assets unavailable")


@pytest.fixture(scope="module")
def ref_tokenizer():
    if not os.path.exists(REF_TOKENIZER):
        pytest.skip("reference checkout unavailable")
    spec = importlib.util.spec_from_file_location("ref_tokenizer", REF_TOKENIZER)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_tokenizer"] = mod
    spec.loader.exec_module(mod)
    return mod.get_tokenizer(multilingual=True, task="transcribe", language="en")


def test_special_token_ids_match_reference(tokenizer, ref_tokenizer):
    assert tokenizer.eot == ref_tokenizer.eot
    assert tokenizer.sot == ref_tokenizer.sot
    assert tokenizer.sot_prev == ref_tokenizer.sot_prev
    assert tokenizer.sot_lm == ref_tokenizer.sot_lm
    assert tokenizer.no_speech == ref_tokenizer.no_speech
    assert tokenizer.no_timestamps == ref_tokenizer.no_timestamps
    assert tokenizer.timestamp_begin == ref_tokenizer.timestamp_begin
    assert tuple(tokenizer.sot_sequence("en", "transcribe")) == ref_tokenizer.sot_sequence


def test_non_speech_tokens_match_reference(tokenizer, ref_tokenizer):
    assert tokenizer.non_speech_tokens == tuple(ref_tokenizer.non_speech_tokens)


def test_suppress_list_matches_reference_semantics(tokenizer):
    ids = build_suppress_tokens(tokenizer, "-1")
    # always-on entries
    for t in (tokenizer.sot, tokenizer.sot_prev, tokenizer.sot_lm, tokenizer.no_speech):
        assert t in ids
    # non-speech set expanded
    for t in tokenizer.non_speech_tokens:
        assert t in ids
    assert ids == tuple(sorted(set(ids)))
    # explicit list short-circuits the -1 expansion
    explicit = build_suppress_tokens(tokenizer, [5, 7])
    assert 5 in explicit and 7 in explicit
    assert not set(tokenizer.non_speech_tokens) <= set(explicit)
    # comma-separated string form
    assert 13 in build_suppress_tokens(tokenizer, "13,17")


def test_decode_with_timestamps(tokenizer):
    t0 = tokenizer.timestamp_begin
    toks = [t0, *tokenizer.encode(" hello"), t0 + 54]
    assert tokenizer.decode_with_timestamps(toks) == "<|0.00|> hello<|1.08|>"


# ---------------------------------------------------------------------------
# Filter behaviour vs direct torch-ports of the reference logic
# ---------------------------------------------------------------------------


def _ref_timestamp_rules(logits, tokens, tok, sample_begin, max_initial):
    """Literal port of ApplyTimestampRules (decoding.py:401-442) for oracle use."""
    import torch
    import torch.nn.functional as F

    logits = torch.tensor(logits.copy())
    tokens = torch.tensor(tokens)
    if tok.no_timestamps is not None:
        logits[:, tok.no_timestamps] = -np.inf
    for k in range(tokens.shape[0]):
        seq = [t for t in tokens[k, sample_begin:].tolist()]
        last_was = len(seq) >= 1 and seq[-1] >= tok.timestamp_begin
        penultimate_was = len(seq) < 2 or seq[-2] >= tok.timestamp_begin
        if last_was:
            if penultimate_was:
                logits[k, tok.timestamp_begin:] = -np.inf
            else:
                logits[k, : tok.eot] = -np.inf
    if tokens.shape[1] == sample_begin:
        logits[:, : tok.timestamp_begin] = -np.inf
        if max_initial is not None:
            last_allowed = tok.timestamp_begin + max_initial
            logits[:, last_allowed + 1 :] = -np.inf
    logprobs = F.log_softmax(logits.float(), dim=-1)
    for k in range(tokens.shape[0]):
        ts = logprobs[k, tok.timestamp_begin:].logsumexp(dim=-1)
        mx = logprobs[k, : tok.timestamp_begin].max()
        if ts > mx:
            logits[k, : tok.timestamp_begin] = -np.inf
    return logits.numpy()


class _MiniTok:
    """Small-vocab stand-in with the real token layout relationships."""

    eot = 100
    no_timestamps = 107
    timestamp_begin = 108
    no_speech = 106

    def encode(self, s):
        assert s == " "
        return [31]


def test_timestamp_rules_match_torch_port():
    rng = np.random.RandomState(7)
    tok = _MiniTok()
    vocab = 140
    cases = [
        np.asarray([[1, 2, 3]]),  # at sample_begin → must start with timestamp
        np.asarray([[1, 2, 3, 110]]),  # open pair → next must close it (no text)
        np.asarray([[1, 2, 3, 110, 50, 112]]),  # closed pair after text → non-ts next
        np.asarray([[1, 2, 3, 110, 111]]),  # two consecutive ts → non-ts next
        np.asarray([[1, 2, 3, 50, 60], [1, 2, 3, 110, 55]]),  # batch of 2
    ]
    for tokens in cases:
        logits = rng.randn(tokens.shape[0], vocab).astype(np.float32) * 3
        want = _ref_timestamp_rules(logits, tokens, tok, sample_begin=3, max_initial=20)
        got = logits.copy()
        ApplyTimestampRules(tok, 3, 20).apply(got, tokens)
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_suppress_blank_and_tokens():
    tok = _MiniTok()
    logits = np.zeros((2, 140), np.float32)
    tokens = np.asarray([[1, 2, 3], [1, 2, 3]])
    SuppressBlank(tok, 3).apply(logits, tokens)
    assert np.isneginf(logits[:, 31]).all() and np.isneginf(logits[:, tok.eot]).all()
    # past sample_begin: no-op
    logits2 = np.zeros((1, 140), np.float32)
    SuppressBlank(tok, 3).apply(logits2, np.asarray([[1, 2, 3, 4]]))
    assert np.isfinite(logits2).all()
    logits3 = np.zeros((1, 140), np.float32)
    SuppressTokens([5, 9]).apply(logits3, np.asarray([[1]]))
    assert np.isneginf(logits3[0, [5, 9]]).all()
    assert np.isfinite(np.delete(logits3[0], [5, 9])).all()


# ---------------------------------------------------------------------------
# Timestamp segmentation through a scripted decoder
# ---------------------------------------------------------------------------


def test_transcribe_timestamp_segmentation(tokenizer, monkeypatch):
    """A scripted decode result with two complete <|t|>text<|t|> pairs must
    split into two segments and seek by the LAST timestamp pair
    (transcribe.py:203-227)."""
    from svc_inference_pipeline_tpu.models import whisper_decoding as wd

    t0 = tokenizer.timestamp_begin
    hello = tokenizer.encode(" hello")
    world = tokenizer.encode(" world")
    scripted = [t0 + 0, *hello, t0 + 100, t0 + 100, *world, t0 + 500, t0 + 500]

    class Scripted(wd.WhisperDecoder):
        def __init__(self):  # no models needed
            self.dims = type("D", (), {"n_audio_ctx": 1500, "n_text_ctx": 448})()
            self.calls = 0

        def embed_audio(self, mel):
            return np.zeros((1, 4, 4))

        def decode(self, feats, tok, options, key=None):
            self.calls += 1
            toks = scripted if self.calls == 1 else [t0 + 0, *hello, t0 + 750]
            return wd.DecodingResult(
                tokens=list(toks), text=tok.decode(toks), language="en",
                avg_logprob=-0.1, no_speech_prob=0.0, temperature=0.0,
                compression_ratio=1.0,
            )

    dec = Scripted()
    audio = np.zeros(16000 * 45, np.float32)  # 45 s
    out = dec.transcribe(audio, tokenizer, DecodingOptions(language="en"))

    segs = out["segments"]
    assert len(segs) >= 3
    # window 1: <|0.00|>hello<|2.00|> then <|2.00|>world<|10.00|>
    assert segs[0]["start"] == 0.0 and segs[0]["end"] == pytest.approx(2.0)
    assert segs[0]["text"].strip() == "hello"
    assert segs[1]["start"] == pytest.approx(2.0) and segs[1]["end"] == pytest.approx(10.0)
    assert segs[1]["text"].strip() == "world"
    # seek advanced to the last pair: 500 positions × 2 frames × 10 ms = 10 s
    assert segs[2]["start"] == pytest.approx(10.0)
    # lone trailing timestamp bounds the duration (t0+750 → 15 s after seek)
    assert segs[2]["end"] == pytest.approx(10.0 + 15.0)


def test_format_timestamp():
    assert format_timestamp(0.0) == "00:00.000"
    assert format_timestamp(61.5) == "01:01.500"
    assert format_timestamp(3661.007, always_include_hours=True, decimal_marker=",") == (
        "01:01:01,007"
    )


def test_subtitle_writers(tmp_path, tokenizer):
    from svc_inference_pipeline_tpu.models.whisper_decoding import (
        write_srt,
        write_txt,
        write_vtt,
    )

    segs = [
        dict(start=0.0, end=1.5, text=" hello"),
        dict(start=1.5, end=3.0, text="world --> again "),
    ]
    import io

    txt, vtt, srt = io.StringIO(), io.StringIO(), io.StringIO()
    write_txt(segs, txt)
    write_vtt(segs, vtt)
    write_srt(segs, srt)
    assert txt.getvalue() == "hello\nworld --> again\n"
    assert vtt.getvalue().startswith("WEBVTT\n")
    assert "00:00.000 --> 00:01.500" in vtt.getvalue()
    assert "world -> again" in vtt.getvalue()
    assert "1\n00:00:00,000 --> 00:00:01,500\nhello\n" in srt.getvalue()
