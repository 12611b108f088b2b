"""Native DIO+StoneMask backend + committed F0 goldens (VERDICT r1 #8, #10).

The DIO backend (ops/f0_dio.py) replaces the reference's pyworld call
(/root/reference/utils/f0.py:164-188). The goldens pin the live AC
tracker's behaviour on the real clip so Viterbi-cost changes are visible;
adversarial synthetic cases (octave jump, silence boundaries, noisy onset)
exercise the voicing decisions.
"""

import numpy as np
import pytest

from svc_inference_pipeline_tpu.ops.f0 import (
    get_f0_features,
    get_f0_features_using_dio,
    praat_pitch_ac,
)

FS, HOP = 24000, 256
GOLDEN = "tests/goldens/f0_golden.npz"


class _Cfg:
    fs, hop_length, f0_min, f0_max = FS, HOP, 65, 800
    pitch_bin, pitch_min, pitch_max = 256, 50.0, 1100.0
    n_fft = 1024


def _harmonic(f0_hz, dur=1.0, n_harm=6, fs=FS):
    t = np.arange(int(dur * fs)) / fs
    x = sum((0.6 / k) * np.sin(2 * np.pi * k * f0_hz * t) for k in range(1, n_harm + 1))
    return x.astype(np.float32)


def _cents(a, b):
    return 1200 * np.abs(np.log2(a / b))


# ---------------------------------------------------------------------------
# DIO synthetic suite
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("f0_true", [110.0, 220.0, 440.0, 660.0])
def test_dio_constant_pitch(f0_true):
    f0 = get_f0_features_using_dio(_harmonic(f0_true), 10**9, FS, HOP, 65.0, 800.0)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.9 * len(f0)
    err = _cents(voiced, f0_true)
    assert np.median(err) < 2, f"median {np.median(err):.2f} cents at {f0_true} Hz"
    assert np.percentile(err, 95) < 10


def test_dio_vibrato():
    dur = 1.5
    t = np.arange(int(dur * FS)) / FS
    f_inst = 220.0 * (1 + 0.03 * np.sin(2 * np.pi * 5 * t))
    x = np.sin(2 * np.pi * np.cumsum(f_inst) / FS).astype(np.float32)
    f0 = get_f0_features_using_dio(x, 10**9, FS, HOP, 65.0, 800.0)
    fr = f_inst[np.minimum(np.arange(len(f0)) * HOP, len(t) - 1)]
    v = f0 > 0
    assert v.mean() > 0.95
    assert np.median(_cents(f0[v], fr[v])) < 5


def test_dio_silence_stays_unvoiced():
    x = np.zeros(FS, np.float32)
    f0 = get_f0_features_using_dio(x, 10**9, FS, HOP, 65.0, 800.0)
    assert (f0 == 0).all()


def test_dio_agrees_with_ac_on_real_clip(cfg, test_wav):
    from svc_inference_pipeline_tpu.utils.audio_io import load_audio

    audio, _ = load_audio(test_wav, cfg.fs)
    audio = np.asarray(audio)
    mel_len = 1 + (len(audio) + 2 * ((cfg.n_fft - cfg.hop_length) // 2) - cfg.n_fft) // cfg.hop_length
    f0_ac, _ = get_f0_features(audio, mel_len, cfg)
    f0_dio, _ = get_f0_features(audio, mel_len, cfg, method="dio")
    both = (f0_ac > 0) & (f0_dio > 0)
    assert both.mean() > 0.7  # voicing decisions broadly agree
    d = _cents(f0_dio[both], f0_ac[both])
    assert np.median(d) < 10, f"median disagreement {np.median(d):.1f} cents"


# ---------------------------------------------------------------------------
# committed goldens: the live AC tracker pinned on the real clip
# ---------------------------------------------------------------------------


def test_f0_golden_regression(cfg, test_wav):
    from svc_inference_pipeline_tpu.utils.audio_io import load_audio

    g = np.load(GOLDEN)
    audio, _ = load_audio(test_wav, cfg.fs)
    audio = np.asarray(audio)
    mel_len = len(g["f0_ac"])
    f0, coarse = get_f0_features(audio, mel_len, cfg)
    # voicing decisions must be bit-stable; voiced values to float tolerance
    np.testing.assert_array_equal(f0 > 0, g["f0_ac"] > 0)
    v = f0 > 0
    assert np.abs(f0[v] - g["f0_ac"][v]).max() < 1e-3
    np.testing.assert_array_equal(coarse, g["coarse"])


# ---------------------------------------------------------------------------
# adversarial voicing cases for the AC tracker
# ---------------------------------------------------------------------------


def test_ac_octave_jump():
    """A hard octave step must not smear: both plateaus tracked at pitch."""
    a = _harmonic(165.0, dur=0.6)
    b = _harmonic(330.0, dur=0.6)
    x = np.concatenate([a, b])
    f0 = np.asarray(praat_pitch_ac(x, FS, HOP, 65.0, 800.0, voicing_threshold=0.6))
    n = len(f0)
    first, second = f0[: int(n * 0.4)], f0[int(n * 0.6) :]
    v1, v2 = first[first > 0], second[second > 0]
    assert np.median(_cents(v1, 165.0)) < 15
    assert np.median(_cents(v2, 330.0)) < 15


def test_ac_silence_boundaries():
    """Tone surrounded by silence: unvoiced margins, no leakage > 3 frames."""
    sil = np.zeros(int(0.3 * FS), np.float32)
    x = np.concatenate([sil, _harmonic(220.0, dur=0.5), sil])
    f0 = np.asarray(praat_pitch_ac(x, FS, HOP, 65.0, 800.0, voicing_threshold=0.6))
    frames_03 = int(0.3 * FS / HOP)
    assert (f0[: frames_03 - 3] == 0).all()
    assert (f0[-(frames_03 - 3) :] == 0).all()
    mid = f0[frames_03 + 3 : -(frames_03 + 3)]
    v = mid[mid > 0]
    assert len(v) > 0.8 * len(mid)
    assert np.median(_cents(v, 220.0)) < 10


def test_ac_breathy_onset():
    """Noise-dominated onset ramping into a clean tone: the voiced region
    must be found and the noise head must not produce spurious pitch."""
    rng = np.random.default_rng(0)
    noise = (0.3 * rng.standard_normal(int(0.3 * FS))).astype(np.float32)
    tone = _harmonic(220.0, dur=0.7)
    ramp = np.linspace(0, 1, int(0.1 * FS), dtype=np.float32)
    tone[: len(ramp)] *= ramp
    x = np.concatenate([noise, tone])
    f0 = np.asarray(praat_pitch_ac(x, FS, HOP, 65.0, 800.0, voicing_threshold=0.6))
    head = f0[: int(0.25 * FS / HOP)]
    tail = f0[int(0.45 * FS / HOP) :]
    assert (head > 0).mean() < 0.3, "noise head mostly unvoiced"
    v = tail[tail > 0]
    assert len(v) > 0.85 * len(tail)
    assert np.median(_cents(v, 220.0)) < 10
