"""Quality metrics: mel MAE, F0 RMSE, waveform SNR.

The validation contract from BASELINE.md: compare converted audio against
the reference pipeline's committed output (gen/1100000814_svcc_CDF1.wav) on
spectral, pitch, and waveform axes.

    python -m svc_inference_pipeline_tpu.eval ref.wav test.wav
"""

from __future__ import annotations

import json
import sys
from typing import Dict

import numpy as np


def _align(a: np.ndarray, b: np.ndarray):
    n = min(len(a), len(b))
    return a[:n], b[:n]


def mel_mae(wav_a: np.ndarray, wav_b: np.ndarray, cfg) -> float:
    """Mean absolute log-mel difference (the BASELINE '<1e-3' axis when the
    inputs are the same pipeline's tensors; for audio comparisons expect
    magnitudes in the 0.1-1 range)."""
    import jax.numpy as jnp

    from svc_inference_pipeline_tpu.ops.mel import extract_mel_features

    a, b = _align(np.asarray(wav_a), np.asarray(wav_b))
    ma, _ = extract_mel_features(jnp.asarray(a), cfg)
    mb, _ = extract_mel_features(jnp.asarray(b), cfg)
    return float(np.abs(np.asarray(ma) - np.asarray(mb)).mean())


def f0_rmse_cents(wav_a: np.ndarray, wav_b: np.ndarray, cfg) -> Dict[str, float]:
    """F0 RMSE in cents over frames voiced in both, plus voicing agreement."""
    from svc_inference_pipeline_tpu.ops.f0 import get_f0_features

    a, b = _align(np.asarray(wav_a), np.asarray(wav_b))
    n_frames = len(a) // cfg.hop_length
    fa, _ = get_f0_features(a, n_frames, cfg)
    fb, _ = get_f0_features(b, n_frames, cfg)
    both = (fa > 0) & (fb > 0)
    if both.sum() == 0:
        return {"f0_rmse_cents": float("nan"), "voicing_agreement": 0.0}
    cents = 1200.0 * np.log2(fa[both] / fb[both])
    return {
        "f0_rmse_cents": float(np.sqrt(np.mean(cents**2))),
        "voicing_agreement": float(((fa > 0) == (fb > 0)).mean()),
    }


def mcd_from_mels(ma: np.ndarray, mb: np.ndarray, n_coeffs: int = 13) -> float:
    """MCD (dB) from two ln-mel spectrograms shaped [n_mels, T]."""
    from scipy.fftpack import dct

    # per-FRAME DCT-II over the MEL axis → cepstra; c₀ (frame energy)
    # excluded. Features are [n_mels, T] (time last) — transpose first.
    ca = dct(np.asarray(ma).T, type=2, axis=-1, norm="ortho")[:, 1 : n_coeffs + 1]
    cb = dct(np.asarray(mb).T, type=2, axis=-1, norm="ortho")[:, 1 : n_coeffs + 1]
    n = min(len(ca), len(cb))  # frame alignment
    dist = np.sqrt(np.sum((ca[:n] - cb[:n]) ** 2, axis=-1))
    return float((10.0 / np.log(10.0)) * np.sqrt(2.0) * dist.mean())


def mcd_db(wav_a: np.ndarray, wav_b: np.ndarray, cfg, n_coeffs: int = 13) -> float:
    """Mel-cepstral distortion (dB) — the standard SVC-challenge spectral
    metric: per-frame DCT-II of the log-mel → cepstra c₁..c_K,
        MCD = (10/ln10)·√2 · mean‖c_a − c_b‖₂.
    """
    import jax.numpy as jnp

    from svc_inference_pipeline_tpu.ops.mel import extract_mel_features

    a, b = _align(np.asarray(wav_a), np.asarray(wav_b))
    ma, _ = extract_mel_features(jnp.asarray(a), cfg)
    mb, _ = extract_mel_features(jnp.asarray(b), cfg)
    return mcd_from_mels(np.asarray(ma), np.asarray(mb), n_coeffs)


def waveform_snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """SNR of ``test`` against ``ref`` (dB), sample-aligned."""
    a, b = _align(np.asarray(ref, np.float64), np.asarray(test, np.float64))
    noise = a - b
    denom = float(np.mean(noise**2))
    if denom == 0:
        return float("inf")
    return float(10.0 * np.log10(np.mean(a**2) / denom))


def evaluate_pair(ref_path: str, test_path: str, cfg=None) -> Dict[str, float]:
    from svc_inference_pipeline_tpu.config import DEFAULT_CONFIG, load_config
    from svc_inference_pipeline_tpu.utils.audio_io import load_audio

    import jax.numpy as jnp

    from svc_inference_pipeline_tpu.ops.mel import extract_mel_features

    cfg = cfg or load_config(DEFAULT_CONFIG)
    ref, _ = load_audio(ref_path, cfg.fs)
    test, _ = load_audio(test_path, cfg.fs)
    # one mel front-end pass per waveform, shared by both spectral metrics
    a, b = _align(np.asarray(ref), np.asarray(test))
    ma = np.asarray(extract_mel_features(jnp.asarray(a), cfg)[0])
    mb = np.asarray(extract_mel_features(jnp.asarray(b), cfg)[0])
    out: Dict[str, float] = {
        "mel_mae": float(np.abs(ma - mb).mean()),
        "mcd_db": mcd_from_mels(ma, mb),
        "snr_db": waveform_snr_db(ref, test),
    }
    out.update(f0_rmse_cents(ref, test, cfg))
    return out


def main(argv=None) -> int:
    args = argv if argv is not None else sys.argv[1:]
    if len(args) != 2:
        print("usage: python -m svc_inference_pipeline_tpu.eval REF.wav TEST.wav", file=sys.stderr)
        return 2
    print(json.dumps(evaluate_pair(args[0], args[1]), indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
