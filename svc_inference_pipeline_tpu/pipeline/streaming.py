"""Streaming conversion: bounded-latency chunked long-form SVC.

The reference processes whole utterances only (and silently truncates
content conditioning at 30 s, utils/whisper.py:52-56). This module adds a
TPU-friendly streaming mode with no reference counterpart:

* the input is cut into fixed-length chunks (one compiled executable —
  every chunk pads to the same frame bucket, so XLA compiles once and the
  first chunk's latency bounds every chunk's latency),
* each chunk carries ``context`` seconds of audio on both sides so the
  convolutional stacks (mel reflect-pad, denoiser receptive field ±75
  frames, BigVGAN) see true signal instead of an edge,
* adjacent outputs are joined by an equal-power crossfade over the
  overlap — the DDPM noise realisations differ per chunk, and the
  crossfade bounds the seam energy,
* the pitch-shift factor is computed ONCE from the first chunk's voiced
  median and pinned (the reference derives it per utterance; a per-chunk
  median would wobble the target pitch across a long stream).

Chunks are yielded as soon as they are converted: peak memory and
time-to-first-audio are O(chunk), independent of stream length.
"""

from __future__ import annotations

from typing import Iterator, Optional, Union

import numpy as np


def stream_convert(
    pipe,
    wav: Union[str, np.ndarray],
    singer_name: str,
    chunk_seconds: float = 10.0,
    context_seconds: float = 1.0,
    key=None,
    upload_pcm16: bool = False,
    sampler=None,
    speedup=None,
) -> Iterator[np.ndarray]:
    """Yield converted waveform chunks for ``wav`` (path or array @ cfg.fs).

    Concatenating the yielded chunks reproduces the full conversion with
    equal-power crossfades at the ``context``-second seams.
    """
    import jax

    from svc_inference_pipeline_tpu.utils.artifacts import get_target_f0_median
    from svc_inference_pipeline_tpu.utils.audio_io import load_audio

    cfg = pipe.cfg
    fs = cfg.fs
    if isinstance(wav, str):
        audio, _ = load_audio(wav, fs)
    else:
        audio = np.asarray(wav, dtype=np.float32)

    key = key if key is not None else jax.random.PRNGKey(0)
    chunk = int(round(chunk_seconds * fs))
    # context clamps to a quarter chunk so tiny chunk sizes stay valid
    ctx = max(1, min(int(round(context_seconds * fs)), chunk // 4))

    if len(audio) <= chunk + ctx:
        yield pipe.convert(audio, singer_name, key=key, upload_pcm16=upload_pcm16,
                           sampler=sampler, speedup=speedup)
        return

    # pin the pitch-shift factor from the first chunk's voiced median
    from svc_inference_pipeline_tpu.ops.f0 import get_f0_features

    first = audio[: chunk + ctx]
    n0 = pipe.mel_frame_count(len(first))
    f0_first, _ = get_f0_features(first, n0, cfg)
    voiced = f0_first[f0_first > 0]
    factor = None
    if len(voiced):
        target = get_target_f0_median(cfg.target_f0_file)
        factor = target / float(np.median(voiced))

    starts = list(range(0, len(audio), chunk))
    tail_prev: Optional[np.ndarray] = None  # converted right-context of prev
    fade = None
    seg_len = chunk + 2 * ctx  # FIXED device shape → one compiled executable
    for idx, s in enumerate(starts):
        lo = max(0, s - ctx)
        hi = min(len(audio), s + chunk + ctx)
        seg = np.zeros(seg_len, np.float32)
        off = ctx - (s - lo)  # zero left-pad at the stream head
        seg[off : off + (hi - lo)] = audio[lo:hi]
        k = jax.random.fold_in(key, idx)
        out = pipe.convert(seg, singer_name, key=k, upload_pcm16=upload_pcm16,
                           pitch_factor=factor, sampler=sampler, speedup=speedup)
        out = np.asarray(out, dtype=np.float32)

        core_len = min(chunk, len(audio) - s)
        body = out[ctx : ctx + core_len]
        rctx = out[ctx + core_len : ctx + core_len + ctx]

        if tail_prev is not None:
            n = min(len(tail_prev), min(ctx, len(body)))
            if fade is None or len(fade) != n:
                t = np.linspace(0.0, np.pi / 2.0, n, dtype=np.float32)
                fade = np.sin(t) ** 2  # equal-power complement pair
            head = body[:n] * fade + tail_prev[:n] * (1.0 - fade)
            body = np.concatenate([head, body[n:]])
        tail_prev = rctx
        yield body


def convert_streaming(pipe, wav, singer_name, **kw) -> np.ndarray:
    """Convenience: run the stream to completion and concatenate."""
    return np.concatenate(list(stream_convert(pipe, wav, singer_name, **kw)))
