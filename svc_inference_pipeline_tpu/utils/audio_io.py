"""Audio file I/O.

Replaces the reference's soundfile/librosa/torchaudio stack
(/root/reference/utils/audio.py:10-55, utils/util.py:20-37) with a
self-contained RIFF/WAVE codec. A native C++ backend
(:mod:`svc_inference_pipeline_tpu.native`) is used when built — it decodes,
down-mixes, and normalises in one pass off the Python heap; this numpy path
is the always-available fallback with identical semantics.

Behavioural contract preserved from the reference loader:

* stereo → channel 0 (not a down-mix; utils/audio.py:27-29),
* integer PCM normalised by ``-iinfo.min`` (utils/audio.py:32-33),
* float data with magnitude > 1.01 treated as 16/32-bit-scaled
  (utils/audio.py:34-40),
* NaN/Inf input returns an empty array (utils/audio.py:45-46),
* resampled to the target rate (here: windowed-sinc polyphase on device,
  :mod:`ops.resample`, instead of librosa's CPU resampler).

And from the reference writer (utils/util.py:20-37):

* peak-normalise to 0.9,
* prepend/append ``fs // 20`` samples (50 ms) of silence,
* 16-bit PCM output.
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

import numpy as np

def pack_data(data: dict, device=None) -> dict:
    """Dict of numpy arrays → dict of leading-batch-dim device arrays.

    Reference API (utils/util.py:40-46): its ``pad_sequence([x])`` on a
    single element just adds the batch dim. Prefer
    ``SVCPipeline.extract_features`` for real use — this exists for drop-in
    compatibility.
    """
    import jax
    import jax.numpy as jnp

    out = {}
    for key, value in data.items():
        arr = jnp.asarray(np.asarray(value))[None]
        out[key] = jax.device_put(arr, device) if device is not None else arr
    return out


# ---------------------------------------------------------------------------
# RIFF/WAVE codec
# ---------------------------------------------------------------------------

_WAVE_FORMAT_PCM = 0x0001
_WAVE_FORMAT_IEEE_FLOAT = 0x0003
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a RIFF/WAVE file → (samples ``[n, channels]`` raw dtype, rate).

    Supports PCM 8/16/24/32-bit and IEEE float 32/64-bit, plus
    WAVE_FORMAT_EXTENSIBLE wrappers of either.
    """
    with open(path, "rb") as f:
        data = f.read()

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")

    fmt = None
    raw = None
    pos = 12
    while pos + 8 <= len(data):
        chunk_id = data[pos : pos + 4]
        (chunk_size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + chunk_size]
        if chunk_id == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            if fmt[0] == _WAVE_FORMAT_EXTENSIBLE and chunk_size >= 40:
                (sub_format,) = struct.unpack_from("<H", body, 24)
                fmt = (sub_format,) + fmt[1:]
        elif chunk_id == b"data":
            raw = body
        pos += 8 + chunk_size + (chunk_size & 1)  # chunks are word-aligned

    if fmt is None or raw is None:
        raise ValueError(f"{path}: missing fmt/data chunk")

    audio_format, n_channels, sample_rate, _, block_align, bits = fmt

    if audio_format == _WAVE_FORMAT_PCM:
        if bits == 8:
            samples = data_u8 = np.frombuffer(raw, dtype=np.uint8)
            samples = (data_u8.astype(np.int16) - 128).astype(np.int8)
        elif bits == 16:
            samples = np.frombuffer(raw, dtype="<i2")
        elif bits == 24:
            b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            samples = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            samples = (samples << 8) >> 8  # sign-extend
        elif bits == 32:
            samples = np.frombuffer(raw, dtype="<i4")
        else:
            raise ValueError(f"{path}: unsupported PCM bit depth {bits}")
    elif audio_format == _WAVE_FORMAT_IEEE_FLOAT:
        samples = np.frombuffer(raw, dtype="<f4" if bits == 32 else "<f8")
    else:
        raise ValueError(f"{path}: unsupported WAVE format 0x{audio_format:04x}")

    n_frames = len(samples) // n_channels
    samples = samples[: n_frames * n_channels].reshape(n_frames, n_channels)
    return samples, sample_rate


def write_wav(path: str, waveform: np.ndarray, fs: int) -> None:
    """Write mono/stereo float waveform as 16-bit PCM WAV."""
    wav = np.asarray(waveform)
    if wav.ndim == 1:
        wav = wav[:, None]
    pcm = np.clip(np.round(wav * 32767.0), -32768, 32767).astype("<i2")
    n_channels = pcm.shape[1]
    byte_rate = fs * n_channels * 2
    block_align = n_channels * 2
    body = pcm.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(body)))
        f.write(b"WAVE")
        f.write(b"fmt ")
        f.write(struct.pack("<IHHIIHH", 16, _WAVE_FORMAT_PCM, n_channels, fs, byte_rate, block_align, 16))
        f.write(b"data")
        f.write(struct.pack("<I", len(body)))
        f.write(body)


# ---------------------------------------------------------------------------
# Optional-dependency decode (mp3 / ogg / anything outside WAV+FLAC)
# ---------------------------------------------------------------------------


class UnsupportedAudioFormatError(RuntimeError):
    """No available decoder for this audio format.

    WAV and FLAC decode natively with zero dependencies; other formats
    (mp3, ogg, …) need an OPTIONAL external decoder — the ``soundfile``
    package or an ``ffmpeg`` binary — mirroring the reference's
    librosa/audioread route (/root/reference/utils/audio.py:21-24)."""


def _decode_external(path: str) -> Tuple[np.ndarray, int]:
    """Decode via soundfile or ffmpeg, whichever is available.

    Returns raw ``(samples [n, ch] float32, rate)`` — the caller applies
    the reference magnitude/normalisation rules, identically to the
    native-decoded paths. Raises :class:`UnsupportedAudioFormatError`
    with every attempted decoder's failure when none works."""
    errors = []
    try:
        import soundfile as sf  # optional dep — not in the base image
    except Exception as e:  # noqa: BLE001 — any import failure disables it
        sf = None
        errors.append(f"soundfile unavailable ({type(e).__name__}: {e})")
    if sf is not None:
        try:
            data, rate = sf.read(path, always_2d=True, dtype="float32")
            return np.asarray(data, dtype=np.float32), int(rate)
        except Exception as e:  # noqa: BLE001 — fall through to ffmpeg
            errors.append(f"soundfile failed ({type(e).__name__}: {e})")

    import shutil

    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        errors.append("ffmpeg not on PATH")
    else:
        import os
        import subprocess
        import tempfile

        fd, tmp = tempfile.mkstemp(suffix=".wav")
        os.close(fd)
        try:
            # to a temp WAV (not stdout: a piped RIFF header carries no
            # sizes) at f32 so no quantisation is added; channel layout is
            # preserved — load_audio keeps channel 0, like the reference
            proc = subprocess.run(
                [ffmpeg, "-nostdin", "-v", "error", "-y", "-i", path,
                 "-c:a", "pcm_f32le", tmp],
                capture_output=True,
                timeout=600,
            )
            if proc.returncode == 0:
                return read_wav(tmp)
            errors.append(
                "ffmpeg failed ("
                + proc.stderr.decode(errors="replace").strip() + ")"
            )
        finally:
            os.unlink(tmp)
    raise UnsupportedAudioFormatError(
        f"{path}: not WAV/FLAC and no external decoder succeeded — "
        + "; ".join(errors)
        + ". Install the 'soundfile' package or put an ffmpeg binary on PATH."
    )


# ---------------------------------------------------------------------------
# Reference-semantics loader / saver
# ---------------------------------------------------------------------------


def load_audio(
    path: str,
    fs: Optional[int] = None,
    resampler: str = "kaiser_best",
) -> Tuple[np.ndarray, int]:
    """Load audio with the reference's normalisation contract, resampled to ``fs``.

    Returns (mono float32 waveform, sample rate). Mirrors
    ``load_audio_torch`` (/root/reference/utils/audio.py:10-55) including its
    magnitude-inference quirks; resampling is done by our windowed-sinc
    polyphase resampler (JAX, on device) rather than librosa.
    """
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic == b"fLaC":
        # non-WAV route the reference serves via librosa/ffmpeg
        # (utils/audio.py:21-24): native FLAC decoder, float output
        # normalised by 2^(bits-1) — no Python fallback (the decoder is
        # C++-only; environments without a toolchain get a clear error)
        from svc_inference_pipeline_tpu.native import wav_codec as _native

        samples, sample_rate = _native.read_flac(path)
    elif magic == b"RIFF":
        try:
            from svc_inference_pipeline_tpu.native import wav_codec as _native
            samples, sample_rate = _native.read_wav(path)
        except Exception:
            samples, sample_rate = read_wav(path)
    else:
        # mp3/ogg/… — optional soundfile/ffmpeg decode; the magnitude
        # rules below apply to its output exactly as to the native paths
        samples, sample_rate = _decode_external(path)

    audio = samples[:, 0] if samples.ndim > 1 else samples  # channel 0 only
    if audio.ndim > 0 and samples.ndim > 1 and samples.shape[1] > 1:
        assert len(audio) > 2

    if np.issubdtype(audio.dtype, np.integer):
        max_mag = -float(np.iinfo(audio.dtype).min)
    else:
        max_mag = float(max(np.amax(audio), -np.amin(audio), 0.0))
        max_mag = (
            (2**31) + 1
            if max_mag > (2**15)
            else ((2**15) + 1 if max_mag > 1.01 else 1.0)
        )

    audio = audio.astype(np.float32) / max_mag

    if np.isnan(audio).any() or np.isinf(audio).any():
        return np.zeros((0,), dtype=np.float32), sample_rate or fs or 48000

    if fs is not None and fs != sample_rate:
        from svc_inference_pipeline_tpu.ops.resample import resample_host

        audio = resample_host(audio, sample_rate, fs, quality=resampler)
        sample_rate = fs

    return audio, sample_rate


def save_audio(
    path: str,
    waveform: np.ndarray,
    fs: int,
    add_silence: bool = True,
    turn_up: bool = True,
    volume_peak: float = 0.9,
) -> None:
    """Save waveform with the reference's post-processing (utils/util.py:20-37).

    int16 input is taken as already-finalised PCM (device-side peak-norm +
    quantisation) and written bit-exactly."""
    if np.asarray(waveform).dtype == np.int16:
        wav = np.asarray(waveform, dtype=np.float32) / 32767.0
        turn_up = False
    else:
        wav = np.asarray(waveform, dtype=np.float32)
    if turn_up:
        peak = max(float(wav.max()), abs(float(wav.min())))
        if peak > 0:
            wav = wav * (volume_peak / peak)
    if add_silence:
        silence = np.zeros((fs // 20,), dtype=wav.dtype)
        wav = np.concatenate([silence, wav, silence])
    write_wav(path, wav, fs)
