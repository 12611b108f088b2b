"""DSP front-end parity tests.

Oracles:
* torch.stft — the reference computes everything through torch ops; we
  rebuild the same op chain in torch inside the test and require our JAX
  implementation to match to float32 tolerance.
* the vendored Whisper mel filterbank asset (assets/mel_filters.npz) — a
  frozen librosa.filters.mel(16000, 400, 80) output; our independently
  derived Slaney filterbank must agree to float32 round-off.
* the reference's utils/mel.py itself (run with our filterbank injected as
  the librosa stub) on the real test clip.
"""

import numpy as np
import pytest
import torch

from svc_inference_pipeline_tpu.ops.mel import (
    extract_mel_features,
    mel_filterbank,
    mel_spectrogram,
    stft_magnitude,
)
from svc_inference_pipeline_tpu.ops.whisper_mel import (
    N_SAMPLES,
    log_mel_spectrogram,
    pad_or_trim,
)
from svc_inference_pipeline_tpu.utils.audio_io import load_audio


def _torch_mel_oracle(y, n_fft, num_mels, sr, hop, win, fmin, fmax):
    """The reference mel op chain (utils/mel.py:130-174) rebuilt in torch."""
    basis = torch.from_numpy(mel_filterbank(sr, n_fft, num_mels, fmin, fmax).astype(np.float64)).float()
    window = torch.hann_window(win)
    y = torch.nn.functional.pad(
        y.unsqueeze(1), (int((n_fft - hop) / 2), int((n_fft - hop) / 2)), mode="reflect"
    ).squeeze(1)
    spec = torch.stft(
        y, n_fft, hop_length=hop, win_length=win, window=window,
        center=False, pad_mode="reflect", normalized=False, onesided=True,
        return_complex=True,
    )
    spec = torch.view_as_real(spec)
    spec = torch.sqrt(spec.pow(2).sum(-1) + 1e-9)
    mel = torch.matmul(basis, spec)
    return torch.log(torch.clamp(mel, min=1e-5))


def test_whisper_filterbank_matches_frozen_asset():
    path = "/root/reference/utils/whisper_extractor/assets/mel_filters.npz"
    with np.load(path) as f:
        frozen = f["mel_80"]
    ours = mel_filterbank(16000, 400, 80)
    np.testing.assert_allclose(ours, frozen, atol=2e-7)


def test_main_filterbank_shape_and_partition():
    fb = mel_filterbank(24000, 1024, 100, 0.0, 12000.0)
    assert fb.shape == (100, 513)
    assert (fb >= 0).all()
    # every mel band has support
    assert (fb.sum(axis=1) > 0).all()


def test_stft_magnitude_matches_torch():
    rng = np.random.default_rng(0)
    y = rng.standard_normal(24000).astype(np.float32)
    ours = np.asarray(stft_magnitude(y[None], n_fft=1024, hop=256, win_length=1024))
    spec = torch.stft(
        torch.from_numpy(y)[None], 1024, hop_length=256, win_length=1024,
        window=torch.hann_window(1024), center=False, onesided=True, return_complex=True,
    )
    theirs = torch.sqrt(torch.view_as_real(spec).pow(2).sum(-1) + 1e-9).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=2e-4)


def test_mel_spectrogram_matches_torch_oracle():
    rng = np.random.default_rng(1)
    y = (0.5 * rng.standard_normal(48000)).astype(np.float32)
    ours = np.asarray(mel_spectrogram(y[None], 1024, 100, 24000, 256, 1024, 0.0, 12000.0))
    theirs = _torch_mel_oracle(torch.from_numpy(y)[None], 1024, 100, 24000, 256, 1024, 0.0, 12000.0).numpy()
    assert ours.shape == theirs.shape
    mae = np.abs(ours - theirs).mean()
    assert mae < 1e-3, f"mel MAE vs torch oracle too high: {mae}"


def test_mel_on_real_clip_vs_reference_module(test_wav, cfg, reference_modules):
    """Run the reference's own utils/mel.py (torch) against our JAX mel."""
    audio, fs = load_audio(test_wav, cfg.fs)
    assert fs == 24000

    ref_mel = reference_modules.mel.mel_spectrogram(
        torch.from_numpy(np.asarray(audio))[None],
        n_fft=cfg.n_fft, num_mels=cfg.n_mels, sampling_rate=cfg.fs,
        hop_size=cfg.hop_length, win_size=cfg.win_length,
        fmin=cfg.fmin, fmax=cfg.fmax, center=False,
    ).squeeze(0).numpy()

    mel, energy = extract_mel_features(np.asarray(audio), cfg)
    mel = np.asarray(mel)
    assert mel.shape == ref_mel.shape
    mae = np.abs(mel - ref_mel).mean()
    assert mae < 1e-3, f"mel MAE vs reference: {mae}"

    ref_energy = np.sqrt((np.exp(ref_mel) ** 2).sum(0))
    np.testing.assert_allclose(np.asarray(energy), ref_energy, rtol=1e-3, atol=1e-3)


def test_whisper_logmel_matches_torch_oracle():
    rng = np.random.default_rng(2)
    y = (0.1 * rng.standard_normal(N_SAMPLES)).astype(np.float32)

    ours = np.asarray(log_mel_spectrogram(y))
    assert ours.shape == (80, 3000)

    audio = torch.from_numpy(y)
    window = torch.hann_window(400)
    stft = torch.stft(audio, 400, 160, window=window, return_complex=True)
    magnitudes = stft[..., :-1].abs() ** 2
    filters = torch.from_numpy(mel_filterbank(16000, 400, 80))
    mel_spec = filters @ magnitudes
    log_spec = torch.clamp(mel_spec, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    theirs = ((log_spec + 4.0) / 4.0).numpy()

    mae = np.abs(ours - theirs).mean()
    assert mae < 1e-4, f"whisper logmel MAE: {mae}"


def test_pad_or_trim():
    import jax.numpy as jnp

    short = jnp.ones((100,))
    assert pad_or_trim(short).shape == (N_SAMPLES,)
    long = jnp.ones((N_SAMPLES + 5,))
    assert pad_or_trim(long).shape == (N_SAMPLES,)
    assert float(pad_or_trim(short)[100:].sum()) == 0.0


def test_energy_definition():
    rng = np.random.default_rng(3)
    y = (0.3 * rng.standard_normal(24000)).astype(np.float32)

    class _C:
        n_fft, n_mels, fs, hop_length, win_length, fmin, fmax = 1024, 100, 24000, 256, 1024, 0, 12000

    mel, energy = extract_mel_features(y, _C)
    expect = np.sqrt((np.exp(np.asarray(mel)) ** 2).sum(0))
    np.testing.assert_allclose(np.asarray(energy), expect, rtol=1e-5, atol=1e-6)


def test_stft_class_keyshift_zero_matches_reference(reference_modules):
    """Our STFT class vs the reference's (keyshift=0 — its nonzero-keyshift
    path has the latent F.pad bug, utils/mel.py:110)."""
    import jax.numpy as jnp

    from svc_inference_pipeline_tpu.ops.mel import STFT

    rng = np.random.default_rng(5)
    y = (0.4 * rng.standard_normal(24000)).astype(np.float32)

    ref_stft = reference_modules.mel.STFT(24000, 100, 1024, 1024, 256, 0, 12000)
    ref = ref_stft.get_mel(torch.from_numpy(y)[None]).numpy()

    ours = np.asarray(STFT(24000, 100, 1024, 1024, 256, 0, 12000).get_mel(jnp.asarray(y)[None]))
    assert ours.shape == ref.shape
    assert np.abs(ours - ref).mean() < 1e-3


def test_stft_class_keyshift_shifts_pitch():
    """keyshift=+12 analyses with a 2× window whose bins are re-interpreted
    on the nominal grid — a pure tone should appear one octave HIGHER on the
    mel axis than at keyshift=0 (that is the pitch-shift mechanism)."""
    import jax.numpy as jnp

    from svc_inference_pipeline_tpu.ops.mel import STFT

    fs = 24000
    t = np.arange(fs) / fs
    y = np.sin(2 * np.pi * 880.0 * t).astype(np.float32)
    stft = STFT(fs, 100, 1024, 1024, 256, 0, 12000)
    m0 = np.asarray(stft.get_mel(jnp.asarray(y)[None]))[0]
    m12 = np.asarray(stft.get_mel(jnp.asarray(y)[None], keyshift=12))[0]
    peak0 = m0.mean(axis=1).argmax()
    peak12 = m12[:, : m0.shape[1]].mean(axis=1).argmax()
    assert peak12 > peak0


def test_acoustic_feature_extractor_facade(test_wav, cfg):
    from svc_inference_pipeline_tpu.ops.mel import acoustic_feature_extractor

    mel, f0, energy = acoustic_feature_extractor(test_wav, cfg)
    assert mel.shape[1] == 100  # [T, n_mels]
    assert f0.shape == (mel.shape[0],)
    assert energy.shape == (mel.shape[0],)
