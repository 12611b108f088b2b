"""Whisper decoding surface: tokenizer, logit filters, incremental decoding,
language detection and sliding-window transcription.

NONE of this is on the SVC live path — the reference vendors OpenAI
Whisper's full decode stack (~2,100 LoC: decoding.py, tokenizer.py,
transcribe.py, normalizers/) but only ever calls the audio encoder
(utils/whisper.py:13-28; SURVEY §2.5 marks the rest "no"). It is provided
for API-surface completeness at matching capability:

* :func:`get_tokenizer` — GPT-2 BPE via the transformers fast tokenizer,
  loading vocab assets vendored INSIDE this package
  (svc_inference_pipeline_tpu/assets/{gpt2,multilingual} — data files,
  byte-identical to the reference's whisper_extractor/assets), with the
  published Whisper special-token layout and the non-speech suppress set
  (reference tokenizer.py:237-265 semantics),
* logit filters — :class:`SuppressBlank`, :class:`SuppressTokens`,
  :class:`ApplyTimestampRules` (reference decoding.py:367-442) applied
  host-side over [B, vocab] numpy logits,
* :class:`IncrementalDecoder` — O(1)-per-token decoding through the
  functional fixed-size self-KV cache (models/whisper.py); replaces the
  reference's forward-hook cache (model.py:234-264) with donated device
  buffers instead of growing tensors,
* greedy / beam (with patience) / temperature decoding loops on top of it
  (decoding.py:219-365 semantics),
* :meth:`WhisperDecoder.transcribe` — 30 s sliding windows with timestamp
  segmentation, seek-by-last-timestamp, previous-text conditioning and the
  temperature-fallback ladder (transcribe.py:103-253).
"""

from __future__ import annotations

import dataclasses
import os
from functools import lru_cache
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from svc_inference_pipeline_tpu.models.whisper import (
    WhisperAudioEncoder,
    WhisperDims,
    WhisperTextDecoder,
)

# tokenizer vocab/merges + spelling table are vendored package data — the
# framework must run without the reference checkout present
ASSETS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets"
)

CHUNK_LENGTH = 30  # seconds per window
TIME_PRECISION = 0.02  # seconds per timestamp token step (30 s / 1500 positions)

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
        # the vendored vocabs already contain <|endoftext|>; language/special
        # tokens follow it in id order:
        #   sot, <lang>×99, translate, transcribe, startoflm, startofprev,
        #   nospeech, notimestamps, <|0.00|>…
        self.eot = hf_tokenizer.convert_tokens_to_ids("<|endoftext|>")
        self.sot = self.eot + 1
        n_lang = len(LANGUAGES) if multilingual else 0
        self.language_tokens = tuple(self.sot + 1 + i for i in range(n_lang))
        self.translate = self.sot + 1 + n_lang
        self.transcribe_token = self.translate + 1
        self.sot_lm = self.transcribe_token + 1
        self.sot_prev = self.transcribe_token + 2
        self.no_speech = self.transcribe_token + 3
        self.no_timestamps = self.no_speech + 1
        self.timestamp_begin = self.no_timestamps + 1

    def encode(self, text: str) -> List[int]:
        return self.tokenizer.encode(text, add_special_tokens=False)

    def decode(self, tokens: Sequence[int]) -> str:
        keep = [t for t in tokens if t < self.eot]
        return self.tokenizer.decode(keep)

    def decode_with_timestamps(self, tokens: Sequence[int]) -> str:
        """Timestamp tokens rendered as ``<|1.08|>`` (tokenizer.py:143-155)."""
        parts: List[str] = []
        run: List[int] = []
        for t in tokens:
            if t >= self.timestamp_begin:
                if run:
                    parts.append(self.decode(run))
                    run = []
                parts.append(f"<|{(t - self.timestamp_begin) * TIME_PRECISION:.2f}|>")
            else:
                run.append(t)
        if run:
            parts.append(self.decode(run))
        return "".join(parts)

    def sot_sequence(self, language: str = "en", task: str = "transcribe") -> List[int]:
        if not self.multilingual:
            return [self.sot]
        lang_id = self.sot + 1 + LANGUAGES.index(language)
        task_id = self.transcribe_token if task == "transcribe" else self.translate
        return [self.sot, lang_id, task_id]

    @property
    def non_speech_tokens(self) -> Tuple[int, ...]:
        """Token ids suppressed to keep generations to actual speech — speaker
        tags, bracketed annotations, music symbols (tokenizer.py:237-265):
        every single-token encoding of the annotation symbols (bare and
        space-prefixed), the first token of the U+2640–U+267F music symbols,
        and word-initial ``-`` / ``'`` (allowed only between words)."""
        if getattr(self, "_non_speech", None) is not None:
            return self._non_speech
        symbols = list('"#()*+/:;<=>@[\\]^_`{|}~「」『』')
        symbols += "<< >> <<< >>> -- --- -( -[ (' (\" (( )) ((( ))) [[ ]] {{ }} ♪♪ ♪♪♪".split()
        music = set("♩♪♫♬♭♮♯")  # multi-byte; first BPE token shared, safe to cut

        ids = {self.encode(" -")[0], self.encode(" '")[0]}
        for sym in symbols + sorted(music):
            for toks in (self.encode(sym), self.encode(" " + sym)):
                if len(toks) == 1 or sym in music:
                    ids.add(toks[0])
        self._non_speech = tuple(sorted(ids))
        return self._non_speech


@lru_cache(maxsize=2)
def get_tokenizer(multilingual: bool = True, assets_dir: str = ASSETS_DIR):
    """Build the tokenizer from the vendored vocab assets (data files)."""
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


# ---------------------------------------------------------------------------
# Options / results
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class DecodingOptions:
    """Reference DecodingOptions surface (decoding.py:67-127)."""

    task: str = "transcribe"
    language: Optional[str] = None
    temperature: float = 0.0
    sample_len: Optional[int] = None
    best_of: Optional[int] = None
    beam_size: Optional[int] = None
    patience: Optional[float] = None
    length_penalty: Optional[float] = None
    prompt: Optional[Union[str, List[int]]] = None
    prefix: Optional[Union[str, List[int]]] = None
    suppress_tokens: Optional[Union[str, Sequence[int]]] = "-1"
    suppress_blank: bool = True
    without_timestamps: bool = False
    max_initial_timestamp: Optional[float] = 1.0


@dataclasses.dataclass
class DecodingResult:
    tokens: List[int]
    text: str
    language: str
    avg_logprob: float
    no_speech_prob: float = 0.0
    temperature: float = 0.0
    compression_ratio: float = 0.0


# ---------------------------------------------------------------------------
# Logit filters (host-side, in-place on numpy [B, vocab] logits)
# ---------------------------------------------------------------------------


class LogitFilter:
    def apply(self, logits: np.ndarray, tokens: np.ndarray) -> None:
        raise NotImplementedError


def _log_softmax_np(x: np.ndarray) -> np.ndarray:
    """Row-wise stable log-softmax on host float32 numpy.

    The decode loop filters and ranks host-side logits every step; routing
    this through jax would cost a device dispatch per token (and on this
    machine a ~31 ms tunnel round trip), serialising the whole loop on the
    host↔device link."""
    x = x.astype(np.float32, copy=False)
    m = x.max(axis=-1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        z = np.log(np.sum(np.exp(x - m), axis=-1, keepdims=True))
    return x - m - z


class SuppressBlank(LogitFilter):
    """Never start the sample with a blank or EOT (decoding.py:383-390)."""

    def __init__(self, tokenizer: WhisperTokenizer, sample_begin: int):
        self.ids = tokenizer.encode(" ") + [tokenizer.eot]
        self.sample_begin = sample_begin

    def apply(self, logits: np.ndarray, tokens: np.ndarray) -> None:
        if tokens.shape[1] == self.sample_begin:
            logits[:, self.ids] = -np.inf


class SuppressTokens(LogitFilter):
    def __init__(self, suppress: Sequence[int]):
        self.ids = list(suppress)

    def apply(self, logits: np.ndarray, tokens: np.ndarray) -> None:
        logits[:, self.ids] = -np.inf


class ApplyTimestampRules(LogitFilter):
    """Timestamp grammar (decoding.py:401-442): timestamps appear in pairs
    (except right before EOT), the sample must open with a timestamp (bounded
    by ``max_initial_timestamp``), and when the total timestamp probability
    beats every text token the sample is forced to a timestamp."""

    def __init__(
        self,
        tokenizer: WhisperTokenizer,
        sample_begin: int,
        max_initial_timestamp_index: Optional[int],
    ):
        self.tokenizer = tokenizer
        self.sample_begin = sample_begin
        self.max_initial_timestamp_index = max_initial_timestamp_index

    def apply(self, logits: np.ndarray, tokens: np.ndarray) -> None:
        tok = self.tokenizer
        logits[:, tok.no_timestamps] = -np.inf  # handled by without_timestamps

        for k in range(tokens.shape[0]):
            seq = tokens[k, self.sample_begin :]
            last_ts = seq.size >= 1 and seq[-1] >= tok.timestamp_begin
            penult_ts = seq.size < 2 or seq[-2] >= tok.timestamp_begin
            if last_ts:
                if penult_ts:  # pair complete — next must be non-timestamp
                    logits[k, tok.timestamp_begin :] = -np.inf
                else:  # close the pair — no text allowed
                    logits[k, : tok.eot] = -np.inf

        if tokens.shape[1] == self.sample_begin:
            logits[:, : tok.timestamp_begin] = -np.inf
            if self.max_initial_timestamp_index is not None:
                last_allowed = tok.timestamp_begin + self.max_initial_timestamp_index
                logits[:, last_allowed + 1 :] = -np.inf

        # if the timestamp mass beats every single text token, force a timestamp
        lp = _log_softmax_np(logits)
        ts = lp[:, tok.timestamp_begin :]
        m = ts.max(axis=-1)
        with np.errstate(divide="ignore", invalid="ignore"):
            ts_mass = np.where(
                np.isfinite(m),
                np.log(np.exp(ts - m[:, None]).sum(axis=-1)) + m,
                -np.inf,
            )
        max_text = lp[:, : tok.timestamp_begin].max(axis=-1)
        logits[ts_mass > max_text, : tok.timestamp_begin] = -np.inf


def build_suppress_tokens(
    tokenizer: WhisperTokenizer,
    suppress_tokens: Optional[Union[str, Sequence[int]]] = "-1",
) -> Tuple[int, ...]:
    """The reference's suppress-list construction (decoding.py:524-549):
    ``"-1"`` expands to the non-speech set; SOT/SOT_PREV/SOT_LM and
    ``<|nospeech|>`` are always suppressed."""
    if isinstance(suppress_tokens, str):
        suppress = [int(t) for t in suppress_tokens.split(",") if t]
    else:
        suppress = list(suppress_tokens or [])

    if -1 in suppress:
        suppress = [t for t in suppress if t >= 0]
        suppress.extend(tokenizer.non_speech_tokens)

    suppress.extend([tokenizer.sot, tokenizer.sot_prev, tokenizer.sot_lm])
    suppress.append(tokenizer.no_speech)  # collected separately as a prob
    return tuple(sorted(set(suppress)))


# ---------------------------------------------------------------------------
# Incremental device decoding
# ---------------------------------------------------------------------------


class IncrementalDecoder:
    """O(1)-per-token decoding over fixed-size self-KV buffers.

    The reference caches K/V through forward hooks on growing tensors
    (model.py:234-264) — a dynamic-shape pattern XLA can't compile. Here the
    cache is a preallocated [B, n_text_ctx, d] buffer per layer; each step
    writes one row at ``offset`` (a traced scalar — one executable serves
    every position) and attends under an iota mask, so the jit compiles
    exactly twice: once for the prime, once for the single-token step.
    """

    PRIME_BUCKET = 16  # prefix padded up to a multiple (bounds recompiles)

    def __init__(self, dims: WhisperDims, decoder: WhisperTextDecoder, params):
        self.dims = dims
        self.decoder = decoder
        self.params = params
        self._apply = jax.jit(
            lambda p, t, xa, cache, off: decoder.apply(
                {"params": p}, t, xa, cache=cache, offset=off
            )
        )
        self._gather = jax.jit(lambda cache, idx: jax.tree_util.tree_map(lambda a: a[idx], cache))

    def _empty_cache(self, b: int) -> Dict[str, tuple]:
        d = self.dims
        z = lambda: jnp.zeros((b, d.n_text_ctx, d.n_text_state), jnp.float32)
        return {f"self_{i}": (z(), z()) for i in range(d.n_text_layer)}

    def prime(self, tokens: np.ndarray, audio_features) -> Tuple[np.ndarray, dict, int]:
        """Run the prefix once. Returns (logits [B, T0, V], cache, offset).

        The prefix is padded to PRIME_BUCKET; padded rows land in the buffer
        past ``offset`` where the step mask never looks, and are overwritten
        in order as real tokens arrive."""
        b, t0 = tokens.shape
        pad = -t0 % self.PRIME_BUCKET
        padded = np.pad(tokens, [(0, 0), (0, pad)])
        logits, cache = self._apply(
            self.params, jnp.asarray(padded), audio_features,
            self._empty_cache(b), jnp.int32(0),
        )
        return np.asarray(logits[:, :t0]), cache, t0

    def step(self, token: np.ndarray, audio_features, cache: dict, offset: int):
        """One token for every batch row. Returns (logits [B, V], cache)."""
        logits, cache = self._apply(
            self.params, jnp.asarray(token), audio_features, cache, jnp.int32(offset)
        )
        return np.asarray(logits[:, -1]), cache

    def reorder(self, cache: dict, source_indices: Sequence[int]) -> dict:
        """Gather the cache along batch (beam-search parent selection)."""
        return self._gather(cache, jnp.asarray(np.asarray(source_indices, np.int32)))


# ---------------------------------------------------------------------------
# Decoder facade
# ---------------------------------------------------------------------------


def _compression_ratio(text: str) -> float:
    import zlib

    data = text.encode("utf-8")
    return len(data) / max(len(zlib.compress(data)), 1)


class WhisperDecoder:
    """Functional decoding over converted Whisper params."""

    def __init__(self, dims: WhisperDims, encoder_params, decoder_params):
        self.dims = dims
        self.encoder = WhisperAudioEncoder(dims)
        self.decoder = WhisperTextDecoder(dims)
        self.encoder_params = encoder_params
        self.decoder_params = decoder_params
        self._embed = jax.jit(lambda p, mel: self.encoder.apply({"params": p}, mel))
        self.incremental = IncrementalDecoder(dims, self.decoder, decoder_params)

    def embed_audio(self, mel: jnp.ndarray) -> jnp.ndarray:
        return self._embed(self.encoder_params, mel)

    # -- language id ---------------------------------------------------

    def detect_language(self, audio_features, tokenizer: WhisperTokenizer) -> Tuple[str, dict]:
        """P(language | audio) from one decoder step at SOT (decoding.py:19-64)."""
        b = audio_features.shape[0]
        tokens = np.full((b, 1), tokenizer.sot, dtype=np.int32)
        logits, _, _ = self.incremental.prime(tokens, audio_features)
        logits = logits[:, -1]
        mask = np.full(logits.shape[-1], -np.inf)
        mask[list(tokenizer.language_tokens)] = 0.0
        probs = np.asarray(jax.nn.softmax(jnp.asarray(logits + mask), axis=-1))[0]
        lang_probs = {
            lang: float(probs[tok])
            for lang, tok in zip(LANGUAGES, tokenizer.language_tokens)
        }
        best = max(lang_probs, key=lang_probs.get)
        return best, lang_probs

    # -- shared decode machinery ----------------------------------------

    def _initial_tokens(
        self, tokenizer: WhisperTokenizer, options: DecodingOptions, sample_len: int
    ) -> List[int]:
        """SOT sequence with prefix/prompt handling (decoding.py:593-620)."""
        language = options.language or "en"
        tokens = tokenizer.sot_sequence(language, options.task)
        if options.without_timestamps:
            tokens = tokens + [tokenizer.no_timestamps]

        if options.prefix is not None:
            prefix = (
                tokenizer.encode(" " + options.prefix.strip())
                if isinstance(options.prefix, str)
                else list(options.prefix)
            )
            max_prefix = self.dims.n_text_ctx // 2 - sample_len
            tokens = tokens + prefix[-max_prefix:] if max_prefix > 0 else tokens
        if options.prompt is not None and len(options.prompt) > 0:
            prompt = (
                tokenizer.encode(" " + options.prompt.strip())
                if isinstance(options.prompt, str)
                else list(options.prompt)
            )
            tokens = (
                [tokenizer.sot_prev]
                + prompt[-(self.dims.n_text_ctx // 2 - 1) :]
                + tokens
            )
        return tokens

    def _build_filters(
        self, tokenizer: WhisperTokenizer, options: DecodingOptions, sample_begin: int
    ) -> List[LogitFilter]:
        filters: List[LogitFilter] = []
        if options.suppress_blank:
            filters.append(SuppressBlank(tokenizer, sample_begin))
        if options.suppress_tokens:
            filters.append(
                SuppressTokens(build_suppress_tokens(tokenizer, options.suppress_tokens))
            )
        if not options.without_timestamps:
            max_initial_index = None
            if options.max_initial_timestamp is not None:
                max_initial_index = round(options.max_initial_timestamp / TIME_PRECISION)
            filters.append(ApplyTimestampRules(tokenizer, sample_begin, max_initial_index))
        return filters

    def decode(
        self,
        audio_features,
        tokenizer: WhisperTokenizer,
        options: DecodingOptions = DecodingOptions(),
        key: Optional[jax.Array] = None,
    ) -> DecodingResult:
        """The reference DecodingTask.run equivalent: greedy when
        temperature 0, categorical sampling otherwise, beam search when
        ``beam_size`` is set."""
        if options.beam_size is not None:
            return self._beam_loop(audio_features, tokenizer, options)
        return self._sample_loop(audio_features, tokenizer, options, key=key)

    def _sample_loop(
        self,
        audio_features,
        tokenizer: WhisperTokenizer,
        options: DecodingOptions,
        key: Optional[jax.Array] = None,
    ) -> DecodingResult:
        temperature = options.temperature
        language = options.language or "en"
        sample_len = options.sample_len or self.dims.n_text_ctx // 2
        initial = self._initial_tokens(tokenizer, options, sample_len)
        sample_begin = len(initial)
        sot_index = initial.index(tokenizer.sot)
        filters = self._build_filters(tokenizer, options, sample_begin)
        if temperature > 0 and key is None:
            key = jax.random.PRNGKey(0)

        b = audio_features.shape[0]
        tokens = np.tile(np.asarray(initial, np.int32)[None], (b, 1))
        prime_logits, cache, offset = self.incremental.prime(tokens, audio_features)

        # no-speech probability read at the SOT position (transcribe.py:88-96)
        sot_probs = np.asarray(
            jax.nn.softmax(jnp.asarray(prime_logits[:, sot_index], jnp.float32), axis=-1)
        )
        no_speech_prob = float(sot_probs[0, tokenizer.no_speech])

        step_logits = prime_logits[:, -1].copy()
        sum_logprobs = np.zeros(b)
        finished = np.zeros(b, dtype=bool)

        for _ in range(sample_len):
            for f in filters:
                f.apply(step_logits, tokens)
            logprobs = _log_softmax_np(step_logits)
            if temperature <= 0:
                next_tok = step_logits.argmax(axis=-1).astype(np.int32)
            else:
                key, sub = jax.random.split(key)
                next_tok = np.asarray(
                    jax.random.categorical(sub, jnp.asarray(step_logits / temperature)),
                    np.int32,
                )
            next_tok = np.where(finished, tokenizer.eot, next_tok)
            sum_logprobs += np.where(
                finished, 0.0, logprobs[np.arange(b), next_tok]
            )
            finished |= next_tok == tokenizer.eot
            tokens = np.concatenate([tokens, next_tok[:, None]], axis=1)
            if finished.all() or tokens.shape[1] > self.dims.n_text_ctx - 1:
                break
            step_logits, cache = self.incremental.step(
                next_tok[:, None], audio_features, cache, offset
            )
            step_logits = step_logits.copy()
            offset += 1

        seq = tokens[0, sample_begin:].tolist()
        if tokenizer.eot in seq:
            seq = seq[: seq.index(tokenizer.eot)]
        text = tokenizer.decode(seq).strip()
        return DecodingResult(
            tokens=seq,
            text=text,
            language=language,
            avg_logprob=float(sum_logprobs[0]) / (len(seq) + 1),
            no_speech_prob=no_speech_prob,
            temperature=temperature,
            compression_ratio=_compression_ratio(text),
        )

    def _beam_loop(
        self,
        audio_features,
        tokenizer: WhisperTokenizer,
        options: DecodingOptions,
    ) -> DecodingResult:
        """Beam search with patience (Kasai et al. 2022; decoding.py:283-365):
        expand until ``beam_size × patience`` hypotheses finish; rank by
        length-normalised sum-logprob. The KV cache rides along as a device
        batch of beam_size rows, reordered by parent gather each step."""
        beam_size = options.beam_size or 5
        patience = options.patience or 1.0
        max_finished = round(beam_size * patience)
        language = options.language or "en"
        sample_len = options.sample_len or self.dims.n_text_ctx // 2
        initial = self._initial_tokens(tokenizer, options, sample_len)
        sample_begin = len(initial)
        sot_index = initial.index(tokenizer.sot)
        filters = self._build_filters(tokenizer, options, sample_begin)

        feats = jnp.repeat(jnp.asarray(audio_features[:1]), beam_size, axis=0)
        tokens = np.tile(np.asarray(initial, np.int32)[None], (beam_size, 1))
        prime_logits, cache, offset = self.incremental.prime(tokens, feats)
        sot_probs = np.asarray(
            jax.nn.softmax(jnp.asarray(prime_logits[:, sot_index], jnp.float32), axis=-1)
        )
        no_speech_prob = float(sot_probs[0, tokenizer.no_speech])

        step_logits = prime_logits[:, -1].copy()
        sum_logprobs = np.zeros(beam_size)
        sum_logprobs[1:] = -np.inf  # identical initial beams — keep only one
        finished: List[Tuple[float, List[int]]] = []

        for _ in range(sample_len):
            for f in filters:
                f.apply(step_logits, tokens)
            logprobs = _log_softmax_np(step_logits)
            # candidate pool: top (beam_size+1) continuations per live beam
            candidates = []  # (score, parent, token)
            for i in range(beam_size):
                if not np.isfinite(sum_logprobs[i]):
                    continue
                top = np.argsort(logprobs[i])[::-1][: beam_size + 1]
                for t in top:
                    candidates.append((sum_logprobs[i] + float(logprobs[i, t]), i, int(t)))
            candidates.sort(key=lambda c: c[0], reverse=True)

            next_rows: List[Tuple[float, int, int]] = []
            for score, parent, t in candidates:
                if t == tokenizer.eot:
                    finished.append((score, tokens[parent, sample_begin:].tolist()))
                    if len(finished) >= max_finished:
                        break
                else:
                    next_rows.append((score, parent, t))
                if len(next_rows) >= beam_size:
                    break
            if len(finished) >= max_finished or not next_rows:
                break

            # pad dead rows by repeating row 0 with -inf score
            while len(next_rows) < beam_size:
                next_rows.append((-np.inf, next_rows[0][1], next_rows[0][2]))

            parents = [r[1] for r in next_rows]
            new_toks = np.asarray([r[2] for r in next_rows], np.int32)
            sum_logprobs = np.asarray([r[0] for r in next_rows])
            tokens = np.concatenate([tokens[parents], new_toks[:, None]], axis=1)
            if tokens.shape[1] > self.dims.n_text_ctx - 1:
                break
            cache = self.incremental.reorder(cache, parents)
            step_logits, cache = self.incremental.step(
                new_toks[:, None], feats, cache, offset
            )
            step_logits = step_logits.copy()
            offset += 1

        if not finished:
            best_i = int(np.argmax(sum_logprobs))
            finished = [(float(sum_logprobs[best_i]), tokens[best_i, sample_begin:].tolist())]

        # MaximumLikelihoodRanker (decoding.py:155-181): score / length penalty
        def rank(item):
            score, toks = item
            n = len(toks) + 1
            if options.length_penalty is None:
                return score / n
            return score / (((5 + n) / 6) ** options.length_penalty)

        score, seq = max(finished, key=rank)
        if tokenizer.eot in seq:
            seq = seq[: seq.index(tokenizer.eot)]
        text = tokenizer.decode(seq).strip()
        return DecodingResult(
            tokens=seq,
            text=text,
            language=language,
            avg_logprob=score / (len(seq) + 1),
            no_speech_prob=no_speech_prob,
            temperature=0.0,
            compression_ratio=_compression_ratio(text),
        )

    # -- back-compat wrappers -------------------------------------------

    def greedy_decode(
        self, audio_features, tokenizer, options: DecodingOptions = DecodingOptions()
    ) -> DecodingResult:
        return self._sample_loop(
            audio_features, tokenizer, dataclasses.replace(options, temperature=0.0)
        )

    def beam_decode(
        self,
        audio_features,
        tokenizer,
        options: DecodingOptions = DecodingOptions(),
        beam_size: int = 5,
        patience: float = 1.0,
    ) -> DecodingResult:
        return self._beam_loop(
            audio_features,
            tokenizer,
            dataclasses.replace(options, beam_size=beam_size, patience=patience),
        )

    def sample_decode(
        self,
        audio_features,
        tokenizer,
        options: DecodingOptions = DecodingOptions(),
        temperature: float = 0.0,
        key: Optional[jax.Array] = None,
    ) -> DecodingResult:
        return self._sample_loop(
            audio_features,
            tokenizer,
            dataclasses.replace(options, temperature=temperature),
            key=key,
        )

    # -- transcription ----------------------------------------------------

    def transcribe(
        self,
        audio_16k: np.ndarray,
        tokenizer: WhisperTokenizer,
        options: DecodingOptions = DecodingOptions(),
        temperatures: tuple = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
        compression_ratio_threshold: Optional[float] = 2.4,
        logprob_threshold: Optional[float] = -1.0,
        no_speech_threshold: Optional[float] = 0.6,
        condition_on_previous_text: bool = True,
        initial_prompt: Optional[str] = None,
        verbose: Optional[bool] = None,
    ) -> dict:
        """Sliding-window transcription (transcribe.py:20-253): temperature
        fallback on degenerate decodes, no-speech skipping, timestamp
        segmentation with seek-by-last-timestamp, and previous-text prompt
        conditioning."""
        from svc_inference_pipeline_tpu.ops.whisper_mel import (
            HOP_LENGTH,
            N_FRAMES,
            log_mel_spectrogram_frames,
        )

        mel = log_mel_spectrogram_frames(np.asarray(audio_16k, np.float32))  # [80, T]
        num_frames = mel.shape[-1]
        input_stride = N_FRAMES // self.dims.n_audio_ctx  # 2 frames per position
        frame_time = HOP_LENGTH / 16000.0

        all_tokens: List[int] = []
        all_segments: List[dict] = []
        prompt_reset_since = 0
        if initial_prompt is not None:
            all_tokens.extend(tokenizer.encode(" " + initial_prompt.strip()))

        def decode_with_fallback(feats) -> DecodingResult:
            result = None
            for t in temperatures:
                opts = dataclasses.replace(options, temperature=t)
                if t > 0:  # best_of applies to sampling, beams to greedy
                    opts = dataclasses.replace(opts, beam_size=None, patience=None)
                result = self.decode(feats, tokenizer, opts)
                needs_fallback = False
                if (
                    compression_ratio_threshold is not None
                    and result.compression_ratio > compression_ratio_threshold
                ):
                    needs_fallback = True
                if (
                    logprob_threshold is not None
                    and result.avg_logprob < logprob_threshold
                ):
                    needs_fallback = True
                if not needs_fallback:
                    break
            return result

        def add_segment(start, end, text_tokens, result):
            text = tokenizer.decode([t for t in text_tokens if t < tokenizer.eot])
            if not text.strip():
                return
            all_segments.append(
                dict(
                    id=len(all_segments),
                    seek=seek,
                    start=start,
                    end=end,
                    text=text,
                    tokens=list(text_tokens),
                    temperature=result.temperature,
                    avg_logprob=result.avg_logprob,
                    compression_ratio=result.compression_ratio,
                    no_speech_prob=result.no_speech_prob,
                )
            )
            if verbose:
                print(f"[{format_timestamp(start)} --> {format_timestamp(end)}] {text}")

        seek = 0
        while seek < num_frames:
            timestamp_offset = seek * frame_time
            chunk = mel[:, seek : seek + N_FRAMES]
            segment_frames = min(N_FRAMES, num_frames - seek)
            if chunk.shape[-1] < N_FRAMES:
                chunk = np.pad(chunk, [(0, 0), (0, N_FRAMES - chunk.shape[-1])])
            feats = self.embed_audio(jnp.asarray(chunk)[None])

            if condition_on_previous_text:
                options = dataclasses.replace(
                    options, prompt=all_tokens[prompt_reset_since:]
                )
            result = decode_with_fallback(feats)
            tokens = np.asarray(result.tokens)

            if no_speech_threshold is not None:
                should_skip = result.no_speech_prob > no_speech_threshold
                if (
                    logprob_threshold is not None
                    and result.avg_logprob > logprob_threshold
                ):
                    should_skip = False  # confident text overrides no-speech
                if should_skip:
                    seek += segment_frames
                    continue

            ts_mask = tokens >= tokenizer.timestamp_begin
            consecutive = np.where(ts_mask[:-1] & ts_mask[1:])[0] + 1
            if len(consecutive) > 0:
                # complete <|t0|> text <|t1|> segments; seek to the last pair
                last_slice = 0
                for current_slice in consecutive:
                    sliced = tokens[last_slice:current_slice]
                    start_pos = int(sliced[0]) - tokenizer.timestamp_begin
                    end_pos = int(sliced[-1]) - tokenizer.timestamp_begin
                    add_segment(
                        start=timestamp_offset + start_pos * TIME_PRECISION,
                        end=timestamp_offset + end_pos * TIME_PRECISION,
                        text_tokens=sliced[1:-1].tolist(),
                        result=result,
                    )
                    last_slice = int(current_slice)
                last_pos = int(tokens[last_slice - 1]) - tokenizer.timestamp_begin
                seek += last_pos * input_stride
                all_tokens.extend(tokens[: last_slice + 1].tolist())
            else:
                duration = segment_frames * frame_time
                ts = tokens[ts_mask]
                if len(ts) > 0 and int(ts[-1]) != tokenizer.timestamp_begin:
                    # lone trailing timestamp: no speech after it
                    duration = (int(ts[-1]) - tokenizer.timestamp_begin) * TIME_PRECISION
                add_segment(
                    start=timestamp_offset,
                    end=timestamp_offset + duration,
                    text_tokens=tokens.tolist(),
                    result=result,
                )
                seek += segment_frames
                all_tokens.extend(tokens.tolist())

            if not condition_on_previous_text or result.temperature > 0.5:
                prompt_reset_since = len(all_tokens)

        n_prompt = len(tokenizer.encode(" " + initial_prompt.strip())) if initial_prompt else 0
        return dict(
            text=tokenizer.decode(all_tokens[n_prompt:]),
            segments=all_segments,
            language=options.language or "en",
        )


# ---------------------------------------------------------------------------
# Transcript writers (reference utils.py:29-88)
# ---------------------------------------------------------------------------


def format_timestamp(
    seconds: float, always_include_hours: bool = False, decimal_marker: str = "."
) -> str:
    assert seconds >= 0
    ms = round(seconds * 1000.0)
    hours, ms = divmod(ms, 3_600_000)
    minutes, ms = divmod(ms, 60_000)
    secs, ms = divmod(ms, 1_000)
    hh = f"{hours:02d}:" if always_include_hours or hours > 0 else ""
    return f"{hh}{minutes:02d}:{secs:02d}{decimal_marker}{ms:03d}"


def write_txt(transcript, file) -> None:
    for segment in transcript:
        print(segment["text"].strip(), file=file, flush=True)


def write_vtt(transcript, file) -> None:
    print("WEBVTT\n", file=file)
    for segment in transcript:
        print(
            f"{format_timestamp(segment['start'])} --> {format_timestamp(segment['end'])}\n"
            f"{segment['text'].strip().replace('-->', '->')}\n",
            file=file,
            flush=True,
        )


def write_srt(transcript, file) -> None:
    for i, segment in enumerate(transcript, start=1):
        start = format_timestamp(segment["start"], True, ",")
        end = format_timestamp(segment["end"], True, ",")
        print(
            f"{i}\n{start} --> {end}\n{segment['text'].strip().replace('-->', '->')}\n",
            file=file,
            flush=True,
        )
