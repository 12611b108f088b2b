"""Native Harvest backend (ops/f0_harvest.py).

Replaces the reference's pyworld.harvest call (/root/reference/utils/f0.py:
191-211, dead on the live path). Same oracle strategy as the DIO/pyin
suites, plus a noise-robustness case (Harvest's design goal)."""

import numpy as np
import pytest

from svc_inference_pipeline_tpu.ops.f0 import (
    get_f0_features,
    get_f0_features_using_harvest,
)

FS, HOP = 24000, 256


def _harmonic(f0_hz, dur=1.0, n_harm=6, fs=FS):
    t = np.arange(int(dur * fs)) / fs
    x = sum((0.6 / k) * np.sin(2 * np.pi * k * f0_hz * t) for k in range(1, n_harm + 1))
    return x.astype(np.float32)


def _cents(a, b):
    return 1200 * np.abs(np.log2(a / b))


@pytest.mark.parametrize("f0_true", [110.0, 220.0, 440.0])
def test_harvest_constant_pitch(f0_true):
    f0 = get_f0_features_using_harvest(_harmonic(f0_true), 10**9, FS, HOP, 65.0, 800.0)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.85 * len(f0)
    err = _cents(voiced, f0_true)
    assert np.median(err) < 3, f"median {np.median(err):.2f} cents at {f0_true} Hz"
    assert np.percentile(err, 95) < 15


def test_harvest_vibrato():
    dur = 1.5
    t = np.arange(int(dur * FS)) / FS
    f_inst = 220.0 * (1 + 0.03 * np.sin(2 * np.pi * 5 * t))
    x = np.sin(2 * np.pi * np.cumsum(f_inst) / FS).astype(np.float32)
    f0 = get_f0_features_using_harvest(x, 10**9, FS, HOP, 65.0, 800.0)
    fr = f_inst[np.minimum(np.arange(len(f0)) * HOP, len(t) - 1)]
    v = f0 > 0
    assert v.mean() > 0.9
    assert np.median(_cents(f0[v], fr[v])) < 8


def test_harvest_silence_stays_unvoiced():
    f0 = get_f0_features_using_harvest(np.zeros(FS, np.float32), 10**9, FS, HOP, 65.0, 800.0)
    assert (f0 == 0).all()


def test_harvest_noise_robustness():
    """Tone at 0 dB SNR: the contour machinery must still find the pitch
    (multi-candidate voting is Harvest's design goal)."""
    rng = np.random.default_rng(0)
    tone = _harmonic(220.0, dur=1.0)
    noise = rng.standard_normal(len(tone)).astype(np.float32)
    x = tone + noise * (np.std(tone) / np.std(noise))
    f0 = get_f0_features_using_harvest(x, 10**9, FS, HOP, 65.0, 800.0)
    v = f0 > 0
    assert v.mean() > 0.6
    assert np.median(_cents(f0[v], 220.0)) < 15


def test_harvest_agrees_with_ac_on_real_clip(cfg, test_wav):
    from svc_inference_pipeline_tpu.utils.audio_io import load_audio

    audio, _ = load_audio(test_wav, cfg.fs)
    audio = np.asarray(audio)
    mel_len = 1 + (len(audio) + 2 * ((cfg.n_fft - cfg.hop_length) // 2) - cfg.n_fft) // cfg.hop_length
    f0_ac, _ = get_f0_features(audio, mel_len, cfg)
    f0_h, coarse = get_f0_features(audio, mel_len, cfg, method="harvest")
    assert len(f0_h) == mel_len == len(coarse)
    both = (f0_ac > 0) & (f0_h > 0)
    assert both.mean() > 0.6
    d = _cents(f0_h[both], f0_ac[both])
    assert np.median(d) < 12, f"median disagreement {np.median(d):.1f} cents"
