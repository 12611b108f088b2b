"""Dataset statistics artifacts: per-channel mel min/max and target-singer F0.

The reference stores these as pickles (config/mel_min.pkl, mel_max.pkl,
f0.pkl — see utils/acoustic_feature_extraction.py:21-30,66-72). We prefer
npz (no arbitrary code execution on load) but accept the reference's pickles
for drop-in compatibility.
"""

from __future__ import annotations

import pickle
from functools import lru_cache
from typing import Tuple

import numpy as np


def _load_array(path: str, npz_key: str) -> np.ndarray:
    if path.endswith(".npz"):
        with np.load(path) as f:
            return np.asarray(f[npz_key])
    with open(path, "rb") as f:
        return np.asarray(pickle.load(f))


@lru_cache(maxsize=None)
def load_mel_min_max(min_mel_file: str, max_mel_file: str) -> Tuple[np.ndarray, np.ndarray]:
    """Per-channel mel min/max, each float32 of shape (n_mels,)."""
    mel_min = _load_array(min_mel_file, "mel_min").astype(np.float32)
    mel_max = _load_array(max_mel_file, "mel_max").astype(np.float32)
    return mel_min, mel_max


@lru_cache(maxsize=None)
def get_target_f0_median(target_f0_file: str) -> float:
    """Median F0 over the target singer's voiced frames.

    Reference semantics (utils/acoustic_feature_extraction.py:21-30): gather
    every frame of every utterance, keep nonzero (voiced) frames, median.
    """
    if target_f0_file.endswith(".npz"):
        with np.load(target_f0_file) as f:
            if "voiced_median" in f:
                return float(f["voiced_median"])
            total = np.asarray(f["voiced_f0"])
    else:
        with open(target_f0_file, "rb") as f:
            f0s = pickle.load(f)
        total = np.concatenate([np.asarray(x).ravel() for x in f0s])
    voiced = total[total != 0]
    return float(np.median(voiced))


def pitch_shift(raw_f0: np.ndarray, cfg) -> np.ndarray:
    """Median-align source F0 to the target singer's F0 distribution.

    Reference: utils/acoustic_feature_extraction.py:33-52 — multiplicative
    factor target_median / source_voiced_median.
    """
    target_median = get_target_f0_median(cfg.target_f0_file)
    voiced = raw_f0[raw_f0 != 0]
    if voiced.size == 0:
        return raw_f0
    factor = target_median / float(np.median(voiced))
    return raw_f0 * factor


def normalize_mel_channel(mel: np.ndarray, mel_min: np.ndarray, mel_max: np.ndarray) -> np.ndarray:
    """Affine per-channel normalisation to [-1, 1] (reference :75-80).

    ``mel`` is [n_mels, T]; min/max are (n_mels,).
    """
    zero = 1e-12
    lo = mel_min[:, None]
    hi = mel_max[:, None]
    return (mel - lo) / (hi - lo + zero) * 2.0 - 1.0


def denormalize_mel_channel(mel: np.ndarray, mel_min: np.ndarray, mel_max: np.ndarray) -> np.ndarray:
    """Inverse of :func:`normalize_mel_channel` (reference :83-97)."""
    zero = 1e-12
    lo = mel_min[:, None]
    hi = mel_max[:, None]
    return (mel + 1.0) / 2.0 * (hi - lo + zero) + lo
