"""ctypes bindings for the native audio runtime (native/wav_codec.cc).

The shared library is compiled on first use into ``native/`` next to the
source. Import fails cleanly (ImportError/OSError) when no toolchain is
available — callers fall back to the numpy codec.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "wav_codec.cc")
_SRC_FLAC = os.path.join(_REPO_ROOT, "native", "flac_codec.cc")
_LIB = os.path.join(_REPO_ROOT, "native", "libsvc_native.so")

_lock = threading.Lock()
_lib = None


class _WavInfo(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_int32),
        ("n_frames", ctypes.c_int32),
        ("n_channels", ctypes.c_int32),
        ("error", ctypes.c_int32),
    ]


def _build() -> None:
    cc = os.environ.get("CXX", "g++")
    cmd = [cc, "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC, _SRC_FLAC, "-lm"]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        stale = not os.path.exists(_LIB) or any(
            os.path.getmtime(_LIB) < os.path.getmtime(src) for src in (_SRC, _SRC_FLAC)
        )
        if stale:
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.wav_probe.argtypes = [ctypes.c_char_p, ctypes.POINTER(_WavInfo)]
        lib.wav_decode_ch0.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.wav_encode_pcm16.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.flac_probe.argtypes = [ctypes.c_char_p, ctypes.POINTER(_WavInfo)]
        lib.flac_decode_ch0.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.resample_out_len.argtypes = [ctypes.c_int32] * 3
        lib.resample_out_len.restype = ctypes.c_int32
        lib.resample_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
        ]
        _lib = lib
        return lib


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Channel-0 decode → (float32 normalised samples [n, 1], rate).

    Returns float32 directly (already normalised by the native code per the
    reference's integer-PCM rule), shaped [n, 1] for interface parity with
    the numpy codec.
    """
    lib = _load()
    info = _WavInfo()
    lib.wav_probe(path.encode(), ctypes.byref(info))
    if info.error:
        raise OSError(f"{path}: wav probe failed (code {info.error})")
    out = np.empty(info.n_frames, dtype=np.float32)
    err = ctypes.c_int32()
    lib.wav_decode_ch0(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        info.n_frames,
        ctypes.byref(err),
    )
    if err.value:
        raise OSError(f"{path}: wav decode failed (code {err.value})")
    return out[:, None], int(info.sample_rate)


def read_flac(path: str) -> Tuple[np.ndarray, int]:
    """Channel-0 FLAC decode → (float32 samples [n, 1] normalised by
    2^(bits-1), rate). Native decoder: native/flac_codec.cc."""
    lib = _load()
    info = _WavInfo()
    lib.flac_probe(path.encode(), ctypes.byref(info))
    if info.error:
        raise OSError(f"{path}: flac probe failed (code {info.error})")
    if info.n_frames <= 0:
        # STREAMINFO total_samples=0 is legal ('unknown length', typical of
        # streaming encoders) but this decoder sizes its output from it
        raise OSError(f"{path}: FLAC with unknown total_samples is unsupported")
    out = np.empty(info.n_frames, dtype=np.float32)
    err = ctypes.c_int32()
    lib.flac_decode_ch0(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        info.n_frames,
        ctypes.byref(err),
    )
    if err.value:
        raise OSError(f"{path}: flac decode failed (code {err.value})")
    return out[:, None], int(info.sample_rate)


def write_wav(path: str, samples: np.ndarray, rate: int) -> None:
    lib = _load()
    flat = np.ascontiguousarray(np.asarray(samples, dtype=np.float32).reshape(-1))
    err = ctypes.c_int32()
    lib.wav_encode_pcm16(
        path.encode(),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(flat),
        rate,
        ctypes.byref(err),
    )
    if err.value:
        raise OSError(f"{path}: wav encode failed (code {err.value})")


def resample(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Host-side polyphase resample (kaiser_best), matching ops/resample.py."""
    if sr_in == sr_out:
        return np.asarray(x, dtype=np.float32)
    lib = _load()
    xf = np.ascontiguousarray(np.asarray(x, dtype=np.float32).reshape(-1))
    n_out = lib.resample_out_len(len(xf), sr_in, sr_out)
    out = np.empty(n_out, dtype=np.float32)
    lib.resample_f32(
        xf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(xf),
        sr_in,
        sr_out,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_out,
    )
    return out
