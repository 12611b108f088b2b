"""F0 tracker tests against synthetic ground truth.

parselmouth is not installed, so the oracle is constructed signals with
known F0 (harmonic complexes, vibrato, silence) rather than Praat output;
accuracy bounds are in cents.
"""

import numpy as np
import pytest

from svc_inference_pipeline_tpu.ops.f0 import (
    f0_to_coarse,
    get_f0_features,
    interpolate_unvoiced,
    praat_pitch_ac,
)

FS = 24000
HOP = 256


class _Cfg:
    fs, hop_length, f0_min, f0_max = FS, HOP, 65, 800
    pitch_bin, pitch_min, pitch_max = 256, 50.0, 1100.0


def _harmonic(f0_hz, dur=1.0, n_harm=6, fs=FS):
    t = np.arange(int(dur * fs)) / fs
    x = sum((0.6 / k) * np.sin(2 * np.pi * k * f0_hz * t) for k in range(1, n_harm + 1))
    return x.astype(np.float32)


def _cents(a, b):
    return 1200 * np.abs(np.log2(a / b))


@pytest.mark.parametrize("f0_true", [110.0, 220.0, 440.0, 660.0])
def test_constant_pitch(f0_true):
    x = _harmonic(f0_true)
    f0 = np.asarray(praat_pitch_ac(x, FS, HOP, 65.0, 800.0, voicing_threshold=0.6))
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.9 * len(f0), "should be voiced nearly everywhere"
    err = _cents(voiced, f0_true)
    assert np.median(err) < 10, f"median error {np.median(err):.1f} cents at {f0_true} Hz"
    assert np.percentile(err, 95) < 25


def test_vibrato_tracking():
    fs, dur = FS, 1.5
    t = np.arange(int(dur * fs)) / fs
    inst = 220.0 * 2 ** (0.5 * np.sin(2 * np.pi * 5.0 * t) / 12)  # ±50 cents @5 Hz
    phase = 2 * np.pi * np.cumsum(inst) / fs
    x = (np.sin(phase) + 0.4 * np.sin(2 * phase) + 0.25 * np.sin(3 * phase)).astype(np.float32)
    f0 = np.asarray(praat_pitch_ac(x, FS, HOP, 65.0, 800.0, voicing_threshold=0.6))
    # compare against instantaneous f0 at frame centers
    n_frames = len(f0)
    window_dur = 3.0 / 65.0
    t1 = 0.5 * dur - 0.5 * (n_frames - 1) * (HOP / fs)
    centers = (t1 + np.arange(n_frames) * (HOP / fs)) * fs
    truth = inst[np.clip(centers.astype(int), 0, len(inst) - 1)]
    voiced = f0 > 0
    assert voiced.mean() > 0.9
    err = _cents(f0[voiced], truth[voiced])
    assert np.median(err) < 15, f"vibrato median error {np.median(err):.1f} cents"


def test_silence_is_unvoiced():
    x = np.zeros(FS, dtype=np.float32)
    x += 1e-6 * np.random.default_rng(0).standard_normal(FS).astype(np.float32)
    f0 = np.asarray(praat_pitch_ac(x, FS, HOP, 65.0, 800.0, voicing_threshold=0.6))
    assert (f0 == 0).all()


def test_voiced_unvoiced_segmentation():
    tone = _harmonic(220.0, dur=0.5)
    gap = np.zeros(FS // 2, dtype=np.float32)
    x = np.concatenate([tone, gap, tone])
    f0 = np.asarray(praat_pitch_ac(x, FS, HOP, 65.0, 800.0, voicing_threshold=0.6))
    n = len(f0)
    first, mid, last = f0[: n // 4], f0[int(n * 0.45) : int(n * 0.55)], f0[-n // 4 :]
    assert (first > 0).mean() > 0.8
    assert (mid == 0).mean() > 0.8, "silent gap should be unvoiced"
    assert (last > 0).mean() > 0.8


def test_no_octave_errors_on_missing_fundamental():
    """Harmonics 2..6 only — the tracker should still report the fundamental."""
    f0_true = 200.0
    t = np.arange(FS) / FS
    x = sum((0.5 / k) * np.sin(2 * np.pi * k * f0_true * t) for k in range(2, 7))
    f0 = np.asarray(praat_pitch_ac(x.astype(np.float32), FS, HOP, 65.0, 800.0, voicing_threshold=0.6))
    voiced = f0[f0 > 0]
    err = _cents(voiced, f0_true)
    assert np.median(err) < 20, f"median {np.median(err):.1f} cents (octave error?)"


def test_get_f0_features_rejects_degenerate_clip():
    """A clip shorter than one hop fails with a clear message, not a
    zero-size reduction inside f0_to_coarse."""
    import pytest

    with pytest.raises(ValueError, match="too short"):
        get_f0_features(np.zeros(4, np.float32), 0, _Cfg)


def test_get_f0_features_pads_to_mel_len():
    x = _harmonic(220.0, dur=1.0)
    mel_len = len(x) // HOP + 1
    f0, coarse = get_f0_features(x, mel_len, _Cfg)
    assert f0.shape == (mel_len,)
    assert coarse.shape == (mel_len,)
    assert coarse.dtype == np.int64
    assert coarse.min() >= 1 and coarse.max() <= 255


def test_f0_to_coarse_contract():
    f0 = np.array([0.0, 50.0, 220.0, 1100.0, 2000.0])
    c = f0_to_coarse(f0, 256, 50.0, 1100.0)
    assert c[0] == 1  # unvoiced → bin 1 (reference clamps ≤1 to 1)
    assert c[1] == 1  # pitch_min → bin 1
    assert c[3] == 255  # pitch_max → top bin
    assert c[4] == 255  # above max clamps
    assert np.all(np.diff(c) >= 0)


def test_interpolate_unvoiced():
    f0 = np.array([0.0, 100.0, 0.0, 0.0, 200.0, 0.0])
    interp, uv = interpolate_unvoiced(f0.copy())
    assert interp[0] == 100.0  # left extension
    assert 100 < interp[2] < 200 and 100 < interp[3] < 200
    assert interp[5] == 200.0
    assert uv.shape == f0.shape


def test_real_clip_f0_plausible(test_wav, cfg):
    from svc_inference_pipeline_tpu.utils.audio_io import load_audio

    audio, _ = load_audio(test_wav, cfg.fs)
    mel_len = (len(audio) - cfg.n_fft) // cfg.hop_length + 1 + (cfg.n_fft - cfg.hop_length) // cfg.hop_length
    f0, coarse = get_f0_features(np.asarray(audio), mel_len, cfg)
    voiced = f0[f0 > 0]
    # sung female vocals: plausible range and voicing fraction
    assert 0.3 < (f0 > 0).mean() < 0.99
    assert 100 < np.median(voiced) < 500, f"median f0 {np.median(voiced):.0f} Hz"
