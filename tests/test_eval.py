import numpy as np

from svc_inference_pipeline_tpu.eval import evaluate_pair, f0_rmse_cents, mel_mae, waveform_snr_db


def test_identical_signals_are_perfect(cfg):
    rng = np.random.default_rng(0)
    wav = (0.4 * rng.standard_normal(24000)).astype(np.float32)
    assert mel_mae(wav, wav, cfg) == 0.0
    assert waveform_snr_db(wav, wav) == float("inf")


def test_snr_scales_with_noise():
    rng = np.random.default_rng(1)
    a = (0.5 * rng.standard_normal(24000)).astype(np.float32)
    snr_small = waveform_snr_db(a, a + 1e-4 * rng.standard_normal(24000).astype(np.float32))
    snr_big = waveform_snr_db(a, a + 1e-2 * rng.standard_normal(24000).astype(np.float32))
    assert snr_small > snr_big > 0


def test_f0_rmse_detects_detune(cfg):
    fs = 24000
    t = np.arange(fs) / fs

    def harmonic(f0):
        return sum((0.5 / k) * np.sin(2 * np.pi * k * f0 * t) for k in range(1, 5)).astype(np.float32)

    same = f0_rmse_cents(harmonic(220.0), harmonic(220.0), cfg)
    detuned = f0_rmse_cents(harmonic(220.0), harmonic(233.08), cfg)  # +100 cents
    assert same["f0_rmse_cents"] < 10
    assert 80 < detuned["f0_rmse_cents"] < 120


def test_evaluate_pair_on_reference_files(test_wav, golden_wav):
    out = evaluate_pair(test_wav, golden_wav)
    # source vs converted: different singers — metrics exist and are finite
    assert np.isfinite(out["mel_mae"]) and out["mel_mae"] > 0
    assert np.isfinite(out["snr_db"])
    assert 0 <= out["voicing_agreement"] <= 1


def test_mcd_db_properties(cfg):
    """MCD is 0 for identical audio, positive otherwise, and monotone in
    the size of a fixed perturbation."""
    from svc_inference_pipeline_tpu.eval import mcd_db

    rng = np.random.default_rng(3)
    t = np.arange(24000) / 24000.0
    a = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    assert mcd_db(a, a, cfg) == 0.0
    # distinct pitches are grossly distorted — per-frame cepstral distance
    # on sharp harmonic spectra lands in the tens of dB (a wrong-axis DCT
    # yields ~6 dB here; guard the axis)
    assert mcd_db(a, (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32), cfg) > 20.0
    noise = rng.standard_normal(len(a)).astype(np.float32)
    d_small = mcd_db(a, a + 0.001 * noise, cfg)
    d_big = mcd_db(a, a + 0.05 * noise, cfg)
    assert 0 < d_small < d_big
