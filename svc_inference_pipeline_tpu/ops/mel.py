"""Main-path mel front-end (24 kHz / n_fft 1024 / hop 256 / 100 slaney mels).

Numerical contract copied from the reference chain
(/root/reference/utils/mel.py:130-201):

* reflect-pad ``(n_fft - hop) // 2`` on both sides,
* Hann-windowed STFT, ``center=False``, one-sided,
* magnitude ``sqrt(re^2 + im^2 + 1e-9)``,
* slaney-scale, slaney-normalised mel filterbank (librosa.filters.mel
  defaults — re-derived here from Slaney's Auditory Toolbox formula, no
  librosa dependency),
* natural-log compression clamped at 1e-5,
* per-frame energy ``sqrt(sum(exp(logmel)^2))`` (utils/mel.py:199).

TPU design notes: the whole front-end is one jit region — framing is a
static-shape gather, the DFT runs as ``jnp.fft.rfft`` (XLA TPU FFT), and the
filterbank projection is a single [F, n_mels] matmul on the MXU fused with
the log compression. Everything is a pure function of (waveform, params); the
reference's module-global filterbank caches (utils/mel.py:125-126) are
replaced by ``functools.lru_cache`` over hashable params on the host side.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "hz_to_mel",
    "mel_to_hz",
    "mel_filterbank",
    "frame_signal",
    "stft_magnitude",
    "mel_spectrogram",
    "extract_mel_features",
]


# ---------------------------------------------------------------------------
# Slaney mel filterbank (librosa.filters.mel equivalent, numpy/f64)
# ---------------------------------------------------------------------------


def hz_to_mel(freq, htk: bool = False):
    """Hz → mel. Slaney scale by default (linear < 1 kHz, log above)."""
    freq = np.asanyarray(freq, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    f_sp = 200.0 / 3
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = freq >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def mel_to_hz(mels, htk: bool = False):
    """Mel → Hz (inverse of :func:`hz_to_mel`)."""
    mels = np.asanyarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    freqs = mels * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(
        log_region,
        min_log_hz * np.exp(logstep * (mels - min_log_mel)),
        freqs,
    )
    return freqs


@lru_cache(maxsize=None)
def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
) -> np.ndarray:
    """Triangular mel filterbank ``[n_mels, 1 + n_fft // 2]`` (float32).

    Matches ``librosa.filters.mel`` with default arguments (slaney scale +
    slaney area normalisation), which is what both the main front-end
    (utils/mel.py:139-146) and the vendored Whisper asset
    (whisper_extractor/audio.py:76-89) were generated with.
    """
    if fmax is None:
        fmax = sr / 2.0

    n_freqs = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sr / 2.0, n_freqs, dtype=np.float64)

    mel_min = hz_to_mel(fmin, htk=htk)
    mel_max = hz_to_mel(fmax, htk=htk)
    mel_f = mel_to_hz(np.linspace(mel_min, mel_max, n_mels + 2), htk=htk)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
        weights *= enorm[:, None]

    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# STFT / log-mel (JAX)
# ---------------------------------------------------------------------------


def frame_signal(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Slice ``y [..., L]`` into frames ``[..., n_frames, n_fft]`` (center=False).

    Implemented as ``r = ceil(n_fft/hop)`` interleaved strided reshapes
    instead of an advanced-index gather: frame i starts at i·hop, so frames
    with i ≡ p (mod r) sit r·hop ≥ n_fft apart and slice out of one
    contiguous reshape — gathers of [frames, n_fft] index sets are
    pathologically slow on TPU, reshapes are free.
    """
    length = y.shape[-1]
    n_frames = 1 + (length - n_fft) // hop
    r = -(-n_fft // hop)  # interleave factor: frames per contiguous group
    group = r * hop
    n_max = -(-n_frames // r)

    # one zero-pad so every phase's last group is fully addressable
    need = (r - 1) * hop + n_max * group
    yp = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, max(0, need - length))])

    phases = []
    for p in range(r):
        seg = jax.lax.slice_in_dim(yp, p * hop, p * hop + n_max * group, axis=-1)
        phases.append(seg.reshape((*y.shape[:-1], n_max, group))[..., :n_fft])

    stacked = jnp.stack(phases, axis=-2)  # [..., n_max, r, n_fft]
    return stacked.reshape((*y.shape[:-1], n_max * r, n_fft))[..., :n_frames, :]


def _hann(win_length: int) -> np.ndarray:
    # torch.hann_window(periodic=True): 0.5 - 0.5 cos(2 pi n / N)
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


@partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "pad", "pad_mode", "magnitude_floor"))
def stft_magnitude(
    y: jnp.ndarray,
    n_fft: int,
    hop: int,
    win_length: int,
    pad: Tuple[int, int] = (0, 0),
    pad_mode: str = "reflect",
    magnitude_floor: float = 1e-9,
) -> jnp.ndarray:
    """|STFT| of ``y [..., L]`` → ``[..., F, T]`` with torch.stft conventions.

    Computes ``sqrt(re^2 + im^2 + magnitude_floor)`` like the reference
    (utils/mel.py:169). ``pad`` is applied with ``pad_mode`` before framing.
    """
    if pad != (0, 0):
        cfg = [(0, 0)] * (y.ndim - 1) + [pad]
        y = jnp.pad(y, cfg, mode=pad_mode)
    frames = frame_signal(y, n_fft, hop)
    window = jnp.asarray(_hann(win_length))
    if win_length < n_fft:  # torch centers the window inside n_fft
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + magnitude_floor)
    return jnp.swapaxes(mag, -1, -2)  # [..., F, T]


@partial(
    jax.jit,
    static_argnames=("n_fft", "num_mels", "sampling_rate", "hop_size", "win_size", "fmin", "fmax"),
)
def mel_spectrogram(
    y: jnp.ndarray,
    n_fft: int,
    num_mels: int,
    sampling_rate: int,
    hop_size: int,
    win_size: int,
    fmin: float,
    fmax: float,
) -> jnp.ndarray:
    """Log-mel ``[..., n_mels, T]`` of waveform ``y [..., L]``.

    Reference chain: utils/mel.py:130-174 (reflect pad → stft(center=False)
    → magnitude → mel matmul → ln(clamp(x, 1e-5))).
    """
    pad = int((n_fft - hop_size) / 2)
    mag = stft_magnitude(
        y, n_fft=n_fft, hop=hop_size, win_length=win_size, pad=(pad, pad), pad_mode="reflect"
    )
    basis = jnp.asarray(mel_filterbank(sampling_rate, n_fft, num_mels, float(fmin), float(fmax)))
    mel = jnp.einsum(
        "mf,...ft->...mt", basis, mag, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.log(jnp.clip(mel, min=1e-5))


class STFT:
    """Keyshift/speed-aware mel extractor (reference utils/mel.py:43-122).

    Unused by the live inference path (SURVEY §2.3) but part of the API
    surface: ``keyshift`` scales n_fft/win/hop by 2^(keyshift/12) and
    rescales the spectrum back onto the nominal frequency grid; ``speed``
    scales the hop. The reference version has a latent bug (bare ``F.pad``
    without an import, utils/mel.py:110) — fixed here.
    """

    def __init__(self, fs, n_mels, n_fft, win_length, hop_length, fmin, fmax, clip_val=1e-5):
        self.fs, self.n_mels, self.n_fft = fs, n_mels, n_fft
        self.win_length, self.hop_length = win_length, hop_length
        self.fmin, self.fmax, self.clip_val = fmin, fmax, clip_val

    def get_mel(self, y: jnp.ndarray, keyshift: float = 0, speed: float = 1) -> jnp.ndarray:
        factor = 2 ** (keyshift / 12)
        n_fft_new = int(np.round(self.n_fft * factor))
        win_new = int(np.round(self.win_length * factor))
        hop_new = int(np.round(self.hop_length * speed))

        pad = ((win_new - hop_new) // 2, (win_new - hop_new + 1) // 2)
        mag = stft_magnitude(
            y, n_fft=n_fft_new, hop=hop_new, win_length=win_new,
            pad=pad, pad_mode="reflect",
        )  # [..., F', T]
        if keyshift != 0:
            size = self.n_fft // 2 + 1
            cur = mag.shape[-2]
            if cur < size:
                mag = jnp.pad(mag, [(0, 0)] * (mag.ndim - 2) + [(0, size - cur), (0, 0)])
            mag = mag[..., :size, :] * (self.win_length / win_new)

        basis = jnp.asarray(
            mel_filterbank(self.fs, self.n_fft, self.n_mels, float(self.fmin), float(self.fmax))
        )
        mel = jnp.einsum("mf,...ft->...mt", basis, mag, precision=jax.lax.Precision.HIGHEST)
        return jnp.log(jnp.clip(mel, min=self.clip_val))

    def __call__(self, wave_file: str) -> jnp.ndarray:
        from svc_inference_pipeline_tpu.utils.audio_io import load_audio

        audio, _ = load_audio(wave_file, self.fs)
        return self.get_mel(jnp.asarray(audio)[None])[0]


def extract_mel_features(audio: jnp.ndarray, cfg) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(log-mel [n_mels, T], energy [T]) of a mono waveform at cfg.fs.

    Energy per utils/mel.py:199: ``sqrt(sum_mel exp(logmel)^2)``.
    """
    mel = mel_spectrogram(
        audio,
        n_fft=cfg.n_fft,
        num_mels=cfg.n_mels,
        sampling_rate=cfg.fs,
        hop_size=cfg.hop_length,
        win_size=cfg.win_length,
        fmin=cfg.fmin,
        fmax=cfg.fmax,
    )
    energy = jnp.sqrt(jnp.sum(jnp.exp(mel) ** 2, axis=-2))
    return mel, energy


def acoustic_feature_extractor(wav_file: str, cfg):
    """(mel [T, n_mels], f0 [T], energy [T]) from a wav path.

    The reference facade (utils/acoustic_feature_extraction.py:57-63,
    spelled "acoutic_feature_extractor" there) — it also computes a
    normalised mel and discards it; here only the used outputs exist.
    """
    from svc_inference_pipeline_tpu.ops.f0 import get_f0_features
    from svc_inference_pipeline_tpu.utils.audio_io import load_audio

    audio, _ = load_audio(wav_file, cfg.fs)
    mel, energy = extract_mel_features(jnp.asarray(audio), cfg)
    mel = np.asarray(mel)
    f0, _ = get_f0_features(np.asarray(audio), mel.shape[-1], cfg)
    return mel.T, f0, np.asarray(energy)
