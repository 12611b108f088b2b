"""Native pYIN backend (ops/f0_pyin.py).

Replaces the reference's librosa.pyin call (/root/reference/utils/f0.py:
95-117, dead on the live path). librosa is absent from the environment, so
the contract is pinned the same way as the DIO backend: synthetic oracles
with cent bounds (constant pitch, vibrato, silence, voicing boundaries)
plus cross-agreement with the live Praat-AC tracker on the real clip.
"""

import numpy as np
import pytest

from svc_inference_pipeline_tpu.ops.f0 import (
    get_f0_features,
    get_f0_features_using_pyin,
)
from svc_inference_pipeline_tpu.ops.f0_pyin import pyin

FS, HOP, WIN = 24000, 256, 1024


def _harmonic(f0_hz, dur=1.0, n_harm=6, fs=FS):
    t = np.arange(int(dur * fs)) / fs
    x = sum((0.6 / k) * np.sin(2 * np.pi * k * f0_hz * t) for k in range(1, n_harm + 1))
    return x.astype(np.float32)


def _cents(a, b):
    return 1200 * np.abs(np.log2(a / b))


@pytest.mark.parametrize("f0_true", [110.0, 220.0, 440.0, 660.0])
def test_pyin_constant_pitch(f0_true):
    f0 = get_f0_features_using_pyin(_harmonic(f0_true), FS, WIN, HOP, 65.0, 800.0)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.85 * len(f0)
    err = _cents(voiced, f0_true)
    assert np.median(err) < 5, f"median {np.median(err):.2f} cents at {f0_true} Hz"
    assert np.percentile(err, 95) < 20


def test_pyin_vibrato():
    dur = 1.5
    t = np.arange(int(dur * FS)) / FS
    f_inst = 220.0 * (1 + 0.03 * np.sin(2 * np.pi * 5 * t))
    x = np.sin(2 * np.pi * np.cumsum(f_inst) / FS).astype(np.float32)
    f0 = get_f0_features_using_pyin(x, FS, WIN, HOP, 65.0, 800.0)
    v = f0 > 0
    assert v.mean() > 0.9
    # the YIN correlation window is left-anchored (librosa-faithful) →
    # ~2-frame group delay; score the best alignment within 0..3 frames
    best = np.inf
    for lag in range(4):
        fr = f_inst[np.minimum((np.arange(len(f0)) - lag) * HOP, len(t) - 1)]
        m = v & (np.arange(len(f0)) >= lag)
        best = min(best, np.median(_cents(f0[m], fr[m])))
    assert best < 10, best


def test_pyin_silence_stays_unvoiced():
    x = np.zeros(FS, np.float32)
    f0 = get_f0_features_using_pyin(x, FS, WIN, HOP, 65.0, 800.0)
    assert (f0 == 0).all()


def test_pyin_tone_in_silence_boundaries():
    sil = np.zeros(int(0.3 * FS), np.float32)
    x = np.concatenate([sil, _harmonic(220.0, dur=0.5), sil])
    f0, voiced, vp = pyin(x, FS, fmin=65.0, fmax=800.0, win_length=WIN, hop_length=HOP)
    frames_03 = int(0.3 * FS / HOP)
    # head/tail silence stays unvoiced (± a few boundary frames)
    assert (~voiced[: frames_03 - 6]).all()
    assert (~voiced[-(frames_03 - 6):]).all()
    mid = slice(frames_03 + 6, -(frames_03 + 6))
    assert voiced[mid].mean() > 0.8
    v = f0[mid][voiced[mid]]
    assert np.median(_cents(v, 220.0)) < 10
    # voicing probabilities behave: higher in the tone than in the silence
    assert vp[mid].mean() > vp[: frames_03 - 6].mean() + 0.3


def test_pyin_octave_jump():
    a = _harmonic(165.0, dur=0.6)
    b = _harmonic(330.0, dur=0.6)
    f0 = get_f0_features_using_pyin(np.concatenate([a, b]), FS, WIN, HOP, 65.0, 800.0)
    n = len(f0)
    first, second = f0[: int(n * 0.4)], f0[int(n * 0.6):]
    v1, v2 = first[first > 0], second[second > 0]
    assert np.median(_cents(v1, 165.0)) < 15
    assert np.median(_cents(v2, 330.0)) < 15


def test_pyin_agrees_with_ac_on_real_clip(cfg, test_wav):
    from svc_inference_pipeline_tpu.utils.audio_io import load_audio

    audio, _ = load_audio(test_wav, cfg.fs)
    audio = np.asarray(audio)
    mel_len = 1 + (len(audio) + 2 * ((cfg.n_fft - cfg.hop_length) // 2) - cfg.n_fft) // cfg.hop_length
    f0_ac, _ = get_f0_features(audio, mel_len, cfg)
    f0_py, coarse = get_f0_features(audio, mel_len, cfg, method="pyin")
    assert len(f0_py) == mel_len == len(coarse)
    both = (f0_ac > 0) & (f0_py > 0)
    assert both.mean() > 0.6  # voicing decisions broadly agree
    d = _cents(f0_py[both], f0_ac[both])
    assert np.median(d) < 15, f"median disagreement {np.median(d):.1f} cents"
