"""Whisper decoding surface: tokenizer, greedy decoding, language detection,
sliding-window transcription.

NONE of this is on the SVC live path — the reference vendors OpenAI
Whisper's full decode stack (~2,100 LoC: decoding.py, tokenizer.py,
transcribe.py, normalizers/) but only ever calls the audio encoder
(utils/whisper.py:13-28; SURVEY §2.5 marks the rest "no"). It is provided
for API-surface completeness at matching capability:

* :func:`get_tokenizer` — GPT-2 BPE via the transformers fast tokenizer,
  loading the same vendored vocab assets the reference ships
  (whisper_extractor/assets/{gpt2,multilingual}), with the published
  Whisper special-token layout,
* :func:`detect_language` — single decoder step over the language tokens
  (decoding.py:19-64 semantics),
* :func:`greedy_decode` — temperature-0 sampling with blank/special
  suppression and a functional KV cache (replaces the hook-based cache,
  model.py:234-264),
* :func:`transcribe` — 30 s sliding windows (transcribe.py:20-253, without
  the temperature-fallback ladder: greedy only).
"""

from __future__ import annotations

import dataclasses
import os
from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from svc_inference_pipeline_tpu.models.whisper import (
    WhisperAudioEncoder,
    WhisperDims,
    WhisperTextDecoder,
)

REFERENCE_ASSETS = "/root/reference/utils/whisper_extractor/assets"

# Whisper's 99 language codes in token order (public model card ordering).
LANGUAGES = (
    "en zh de es ru ko fr ja pt tr pl ca nl ar sv it id hi fi vi he uk el ms "
    "cs ro da hu ta no th ur hr bg lt la mi ml cy sk te fa lv bn sr az sl kn "
    "et mk br eu is hy ne mn bs kk sq sw gl mr pa si km sn yo so af oc ka be "
    "tg sd gu am yi lo uz fo ht ps tk nn mt sa lb my bo tl mg as tt haw ln "
    "ha ba jw su"
).split()


class WhisperTokenizer:
    """GPT-2 BPE + Whisper special tokens, asset-compatible with the
    reference's vendored files."""

    def __init__(self, hf_tokenizer, multilingual: bool):
        self.tokenizer = hf_tokenizer
        self.multilingual = multilingual
        base = len(hf_tokenizer)
        specials = ["<|endoftext|>"]
        if multilingual:
            specials += [f"<|{lang}|>" for lang in LANGUAGES]
        specials += [
            "<|translate|>", "<|transcribe|>", "<|startoflm|>", "<|startofprev|>",
            "<|nospeech|>", "<|notimestamps|>",
        ]
        # the vendored vocabs already contain <|endoftext|>; language/special
        # tokens follow it in id order
        self.eot = hf_tokenizer.convert_tokens_to_ids("<|endoftext|>")
        self.sot = self.eot + 1 if multilingual else self.eot + 1
        n_lang = len(LANGUAGES) if multilingual else 0
        self.language_tokens = tuple(self.sot + 1 + i for i in range(n_lang))
        self.translate = self.sot + 1 + n_lang
        self.transcribe_token = self.translate + 1
        self.no_speech = self.transcribe_token + 3
        self.no_timestamps = self.no_speech + 1
        self.timestamp_begin = self.no_timestamps + 1

    def encode(self, text: str) -> List[int]:
        return self.tokenizer.encode(text, add_special_tokens=False)

    def decode(self, tokens: Sequence[int]) -> str:
        keep = [t for t in tokens if t < self.eot]
        return self.tokenizer.decode(keep)

    def sot_sequence(self, language: str = "en", task: str = "transcribe") -> List[int]:
        if not self.multilingual:
            return [self.sot]
        lang_id = self.sot + 1 + LANGUAGES.index(language)
        task_id = self.transcribe_token if task == "transcribe" else self.translate
        return [self.sot, lang_id, task_id]


@lru_cache(maxsize=2)
def get_tokenizer(multilingual: bool = True, assets_dir: str = REFERENCE_ASSETS):
    """Build the tokenizer from the vendored vocab assets (data files).

    Raises FileNotFoundError when the assets are absent (zero-egress — no
    hub download is attempted).
    """
    from transformers import GPT2TokenizerFast

    sub = "multilingual" if multilingual else "gpt2"
    path = os.path.join(assets_dir, sub)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"tokenizer assets not found at {path}")
    hf = GPT2TokenizerFast(
        vocab_file=os.path.join(path, "vocab.json"),
        merges_file=os.path.join(path, "merges.txt"),
    )
    return WhisperTokenizer(hf, multilingual)


@dataclasses.dataclass
class DecodingOptions:
    """Reference DecodingOptions surface (decoding.py:67-127), greedy subset."""

    task: str = "transcribe"
    language: Optional[str] = None
    sample_len: Optional[int] = None
    suppress_blank: bool = True
    without_timestamps: bool = True


@dataclasses.dataclass
class DecodingResult:
    tokens: List[int]
    text: str
    language: str
    avg_logprob: float


class WhisperDecoder:
    """Functional greedy decoder over converted Whisper params."""

    def __init__(self, dims: WhisperDims, encoder_params, decoder_params):
        self.dims = dims
        self.encoder = WhisperAudioEncoder(dims)
        self.decoder = WhisperTextDecoder(dims)
        self.encoder_params = encoder_params
        self.decoder_params = decoder_params
        self._embed = jax.jit(lambda p, mel: self.encoder.apply({"params": p}, mel))

    def embed_audio(self, mel: jnp.ndarray) -> jnp.ndarray:
        return self._embed(self.encoder_params, mel)

    def _logits(self, tokens: np.ndarray, audio_features, cache=None, offset=0):
        return self.decoder.apply(
            {"params": self.decoder_params},
            jnp.asarray(tokens),
            audio_features,
            cache=cache,
            offset=offset,
        )

    def detect_language(self, audio_features, tokenizer: WhisperTokenizer) -> Tuple[str, dict]:
        """P(language | audio) from one decoder step at SOT (decoding.py:19-64)."""
        b = audio_features.shape[0]
        tokens = np.full((b, 1), tokenizer.sot, dtype=np.int32)
        logits, _ = self._logits(tokens, audio_features)
        logits = np.asarray(logits[:, -1])
        mask = np.full(logits.shape[-1], -np.inf)
        mask[list(tokenizer.language_tokens)] = 0.0
        probs = jax.nn.softmax(jnp.asarray(logits + mask), axis=-1)
        probs = np.asarray(probs)[0]
        lang_probs = {
            lang: float(probs[tok])
            for lang, tok in zip(LANGUAGES, tokenizer.language_tokens)
        }
        best = max(lang_probs, key=lang_probs.get)
        return best, lang_probs

    def greedy_decode(
        self,
        audio_features,
        tokenizer: WhisperTokenizer,
        options: DecodingOptions = DecodingOptions(),
    ) -> DecodingResult:
        language = options.language or "en"
        sot_seq = tokenizer.sot_sequence(language, options.task)
        if options.without_timestamps:
            sot_seq = sot_seq + [tokenizer.no_timestamps]
        max_len = options.sample_len or self.dims.n_text_ctx // 2

        tokens: List[int] = list(sot_seq)
        generated: List[int] = []
        logprobs: List[float] = []
        cross_cache = None

        for _ in range(max_len):
            # full-prefix recompute with the cross-attention K/V cached after
            # the first step (self-attention over the short text prefix is
            # cheap; this surface is dead code on the SVC path)
            logits, cache = self._logits(
                np.asarray([tokens], dtype=np.int32), audio_features, cache=cross_cache
            )
            if cross_cache is None:
                cross_cache = {k: v for k, v in cache.items() if k.startswith("cross_")}
            step_logits = np.asarray(logits[:, -1]).copy()
            if options.suppress_blank and not generated:
                step_logits[:, tokenizer.encode(" ")] = -np.inf
            # suppress specials except EOT
            step_logits[:, tokenizer.eot + 1 :] = -np.inf
            next_tok = int(step_logits[0].argmax())
            lp = jax.nn.log_softmax(jnp.asarray(step_logits[0]))[next_tok]
            logprobs.append(float(lp))
            if next_tok == tokenizer.eot:
                break
            generated.append(next_tok)
            tokens.append(next_tok)

        return DecodingResult(
            tokens=generated,
            text=tokenizer.decode(generated),
            language=language,
            avg_logprob=float(np.mean(logprobs)) if logprobs else 0.0,
        )

    def beam_decode(
        self,
        audio_features,
        tokenizer: WhisperTokenizer,
        options: DecodingOptions = DecodingOptions(),
        beam_size: int = 5,
        patience: float = 1.0,
    ) -> DecodingResult:
        """Beam search with patience (Kasai et al. 2022), matching the
        reference's BeamSearchDecoder semantics (decoding.py:283-365):
        keep expanding until ``beam_size × patience`` hypotheses finish,
        rank finished candidates by sum-logprob / length."""
        language = options.language or "en"
        sot_seq = tokenizer.sot_sequence(language, options.task)
        if options.without_timestamps:
            sot_seq = sot_seq + [tokenizer.no_timestamps]
        max_len = options.sample_len or self.dims.n_text_ctx // 2
        max_finished = round(beam_size * patience)

        beams = [(0.0, list(sot_seq))]  # (sum logprob, tokens)
        finished: List[tuple] = []
        cross_cache = None

        for _ in range(max_len):
            candidates = []
            for score, toks in beams:
                logits, cache = self._logits(
                    np.asarray([toks], dtype=np.int32), audio_features, cache=cross_cache
                )
                if cross_cache is None:
                    cross_cache = {k: v for k, v in cache.items() if k.startswith("cross_")}
                lp = np.array(
                    jax.nn.log_softmax(jnp.asarray(np.asarray(logits[0, -1])))
                )
                lp[tokenizer.eot + 1 :] = -np.inf
                if options.suppress_blank and len(toks) == len(sot_seq):
                    lp[tokenizer.encode(" ")] = -np.inf
                for tok in np.argsort(lp)[::-1][: beam_size + 1]:
                    candidates.append((score + float(lp[tok]), toks + [int(tok)]))

            candidates.sort(key=lambda c: c[0], reverse=True)
            beams = []
            for score, toks in candidates:
                if toks[-1] == tokenizer.eot:
                    finished.append((score, toks))
                    if len(finished) >= max_finished:
                        break
                else:
                    beams.append((score, toks))
                if len(beams) >= beam_size:
                    break
            if len(finished) >= max_finished or not beams:
                break

        if not finished:
            finished = [max(beams, key=lambda c: c[0])]
        # MaximumLikelihoodRanker: average logprob per token (decoding.py:169)
        score, toks = max(
            finished, key=lambda c: c[0] / max(len(c[1]) - len(sot_seq), 1)
        )
        generated = [t for t in toks[len(sot_seq) :] if t != tokenizer.eot]
        return DecodingResult(
            tokens=generated,
            text=tokenizer.decode(generated),
            language=language,
            avg_logprob=score / max(len(generated) + 1, 1),
        )

    def sample_decode(
        self,
        audio_features,
        tokenizer: WhisperTokenizer,
        options: DecodingOptions = DecodingOptions(),
        temperature: float = 0.0,
        key: Optional["jax.Array"] = None,
    ) -> DecodingResult:
        """Temperature sampling (temperature 0 ≡ greedy)."""
        if temperature <= 0:
            return self.greedy_decode(audio_features, tokenizer, options)
        key = key if key is not None else jax.random.PRNGKey(0)
        language = options.language or "en"
        sot_seq = tokenizer.sot_sequence(language, options.task)
        if options.without_timestamps:
            sot_seq = sot_seq + [tokenizer.no_timestamps]
        max_len = options.sample_len or self.dims.n_text_ctx // 2

        tokens = list(sot_seq)
        generated: List[int] = []
        logprobs: List[float] = []
        cross_cache = None
        for i in range(max_len):
            logits, cache = self._logits(
                np.asarray([tokens], dtype=np.int32), audio_features, cache=cross_cache
            )
            if cross_cache is None:
                cross_cache = {k: v for k, v in cache.items() if k.startswith("cross_")}
            step = np.array(np.asarray(logits[0, -1]), dtype=np.float64)
            step[tokenizer.eot + 1 :] = -np.inf
            if options.suppress_blank and not generated:
                step[tokenizer.encode(" ")] = -np.inf
            key, sub = jax.random.split(key)
            next_tok = int(
                jax.random.categorical(sub, jnp.asarray(step / temperature))
            )
            lp = float(jax.nn.log_softmax(jnp.asarray(step))[next_tok])
            logprobs.append(lp)
            if next_tok == tokenizer.eot:
                break
            generated.append(next_tok)
            tokens.append(next_tok)
        return DecodingResult(
            tokens=generated,
            text=tokenizer.decode(generated),
            language=language,
            avg_logprob=float(np.mean(logprobs)) if logprobs else 0.0,
        )

    @staticmethod
    def _compression_ratio(text: str) -> float:
        import zlib

        data = text.encode("utf-8")
        return len(data) / max(len(zlib.compress(data)), 1)

    def transcribe(
        self,
        audio_16k: np.ndarray,
        tokenizer: WhisperTokenizer,
        options: DecodingOptions = DecodingOptions(),
        temperatures: tuple = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
        compression_ratio_threshold: float = 2.4,
        logprob_threshold: float = -1.0,
    ) -> dict:
        """30 s sliding windows with the reference's temperature-fallback
        ladder (transcribe.py:103-120): escalate the temperature when the
        decode is degenerate (compression ratio too high — repetition — or
        average log-probability too low)."""
        from svc_inference_pipeline_tpu.ops.whisper_mel import (
            N_SAMPLES,
            log_mel_spectrogram,
            pad_or_trim,
        )

        segments = []
        pos = 0
        while pos < len(audio_16k):
            chunk = audio_16k[pos : pos + N_SAMPLES]
            mel = log_mel_spectrogram(pad_or_trim(jnp.asarray(chunk)))[None]
            feats = self.embed_audio(mel)

            result = None
            for temp in temperatures:
                result = self.sample_decode(feats, tokenizer, options, temperature=temp)
                degenerate = (
                    self._compression_ratio(result.text) > compression_ratio_threshold
                    or result.avg_logprob < logprob_threshold
                )
                if not degenerate:
                    break
            segments.append(
                dict(start=pos / 16000, end=min(pos + N_SAMPLES, len(audio_16k)) / 16000,
                     text=result.text, tokens=result.tokens)
            )
            pos += N_SAMPLES
        return {
            "text": "".join(s["text"] for s in segments),
            "segments": segments,
            "language": options.language or "en",
        }
