"""Whisper's audio front-end convention (16 kHz / n_fft 400 / hop 160 / 80 mels).

Contract from the vendored extractor (/root/reference/utils/whisper_extractor/
audio.py:13-124) — note it differs from the main front-end in every way:

* ``center=True`` STFT (reflect padding n_fft//2 both sides, torch default),
* power spectrum (|.|^2), final frame dropped,
* log10 with 1e-10 floor,
* dynamic floor at (max - 8 dB), then ``(x + 4) / 4`` scaling,
* pad-or-trim input to exactly 30 s (480 000 samples) → [80, 3000].

The filterbank is identical to librosa.filters.mel(16000, 400, 80) — the
reference ships it as a frozen asset (assets/mel_filters.npz); we re-derive
it from the Slaney formula in :func:`ops.mel.mel_filterbank` (a unit test
checks bit-level agreement with the asset).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from svc_inference_pipeline_tpu.ops.mel import frame_signal, mel_filterbank, _hann

SAMPLE_RATE = 16000
N_FFT = 400
N_MELS = 80
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480000
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000


def pad_or_trim(array: jnp.ndarray, length: int = N_SAMPLES, axis: int = -1) -> jnp.ndarray:
    """Pad with zeros or trim to ``length`` along ``axis`` (audio.py:52-73)."""
    n = array.shape[axis]
    if n > length:
        sl = [slice(None)] * array.ndim
        sl[axis] = slice(0, length)
        return array[tuple(sl)]
    if n < length:
        pads = [(0, 0)] * array.ndim
        pads[axis] = (0, length - n)
        return jnp.pad(array, pads)
    return array


@partial(jax.jit, static_argnames=("n_mels",))
def log_mel_spectrogram(audio: jnp.ndarray, n_mels: int = N_MELS) -> jnp.ndarray:
    """Whisper log-mel of 16 kHz mono audio ``[..., L]`` → ``[..., 80, T]``.

    Matches whisper_extractor/audio.py:92-124 exactly (center=True STFT,
    power spectrum, drop final frame, log10 → max-8 floor → (x+4)/4).
    """
    pad = N_FFT // 2
    cfgs = [(0, 0)] * (audio.ndim - 1) + [(pad, pad)]
    y = jnp.pad(audio, cfgs, mode="reflect")
    frames = frame_signal(y, N_FFT, HOP_LENGTH)
    window = jnp.asarray(_hann(N_FFT))
    spec = jnp.fft.rfft(frames * window, n=N_FFT, axis=-1)
    magnitudes = (jnp.real(spec) ** 2 + jnp.imag(spec) ** 2)[..., :-1, :]  # drop last frame
    magnitudes = jnp.swapaxes(magnitudes, -1, -2)  # [..., F, T]

    filters = jnp.asarray(mel_filterbank(SAMPLE_RATE, N_FFT, n_mels))
    mel_spec = jnp.einsum(
        "mf,...ft->...mt", filters, magnitudes, precision=jax.lax.Precision.HIGHEST
    )

    log_spec = jnp.log10(jnp.clip(mel_spec, min=1e-10))
    log_spec = jnp.maximum(
        log_spec, jnp.max(log_spec, axis=(-2, -1), keepdims=True) - 8.0
    )
    return (log_spec + 4.0) / 4.0


def log_mel_spectrogram_frames(audio_16k: np.ndarray) -> np.ndarray:
    """Full-clip log-mel [80, T] for sliding-window transcription.

    The reference normalises (max − 8 dB) over the WHOLE clip before any
    window slicing (transcribe.py:84-86 + audio.py:92-124); windows are then
    cut in mel-frame space and zero-padded — this host wrapper preserves
    that order."""
    mel = log_mel_spectrogram(jnp.asarray(np.asarray(audio_16k, np.float32)))
    return np.asarray(mel)


def load_and_preprocess(audio_24k: np.ndarray, fs: int) -> jnp.ndarray:
    """Resample to 16 kHz and pad/trim to one 30 s chunk.

    Replaces the reference's ffmpeg subprocess decode
    (whisper_extractor/audio.py:22-49) with the on-device resampler — no
    process boundary in the pipeline.
    """
    from svc_inference_pipeline_tpu.ops.resample import resample

    audio16 = resample(jnp.asarray(audio_24k), fs, SAMPLE_RATE)
    return pad_or_trim(audio16)
