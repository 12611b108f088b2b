import numpy as np

from svc_inference_pipeline_tpu.ops.resample import resample
from svc_inference_pipeline_tpu.utils.audio_io import load_audio, read_wav, save_audio, write_wav


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    wav = rng.uniform(-0.99, 0.99, 4321).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_wav(path, wav, 24000)
    back, sr = read_wav(path)
    assert sr == 24000
    assert back.shape == (4321, 1)
    np.testing.assert_allclose(back[:, 0] / 32767.0, wav, atol=1.0 / 32767)


def test_read_reference_wavs(test_wav, golden_wav):
    src, sr_src = read_wav(test_wav)
    assert sr_src == 44100
    gen, sr_gen = read_wav(golden_wav)
    assert sr_gen == 24000
    assert gen.shape[0] == 99424  # documented golden length


def test_load_audio_reference_semantics(test_wav):
    audio, fs = load_audio(test_wav, 24000)
    assert fs == 24000
    assert audio.dtype == np.float32
    # int16 → normalised by 32768; bounded by 1
    assert np.abs(audio).max() <= 1.0
    # length follows ceil(L * new / orig)
    raw, _ = read_wav(test_wav)
    assert len(audio) == int(np.ceil(raw.shape[0] * 24000 / 44100))


def test_save_audio_reference_semantics(tmp_path):
    wav = np.sin(np.linspace(0, 100, 24000)).astype(np.float32) * 0.25
    path = str(tmp_path / "out.wav")
    save_audio(path, wav, 24000)
    back, sr = read_wav(path)
    out = back[:, 0] / 32767.0
    # 50 ms silence either side
    assert len(out) == 24000 + 2 * (24000 // 20)
    assert np.abs(out[: 24000 // 20]).max() == 0.0
    # peak-normalised to ~0.9
    assert abs(np.abs(out).max() - 0.9) < 2e-3


def test_resample_preserves_tone_frequency():
    sr_in, sr_out, f = 44100, 24000, 440.0
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * f * t).astype(np.float32)
    y = np.asarray(resample(x, sr_in, sr_out))
    assert len(y) == int(np.ceil(len(x) * sr_out / sr_in))
    # measure frequency by FFT peak on the interior (avoid edge effects)
    seg = y[sr_out // 4 : sr_out // 4 + 8192] * np.hanning(8192)
    spec = np.abs(np.fft.rfft(seg))
    peak_hz = np.argmax(spec) * sr_out / 8192
    assert abs(peak_hz - f) < 3.0


def test_resample_snr():
    """Mid-band sine should survive 44.1k→24k→44.1k with high SNR."""
    sr = 44100
    t = np.arange(2 * sr) / sr
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = np.asarray(resample(resample(x, sr, 24000), 24000, sr))
    n = min(len(x), len(y))
    a, b = x[4000 : n - 4000], y[4000 : n - 4000]
    snr = 10 * np.log10(np.mean(a**2) / np.mean((a - b) ** 2))
    assert snr > 55.0, f"resample round-trip SNR too low: {snr:.1f} dB"


def test_resample_identity():
    x = np.ones(100, dtype=np.float32)
    y = resample(x, 24000, 24000)
    np.testing.assert_array_equal(np.asarray(y), x)


def test_unknown_format_raises_typed_error(tmp_path, monkeypatch):
    """No soundfile, no ffmpeg → UnsupportedAudioFormatError with remedies
    (the reference decodes mp3/ogg via librosa/audioread,
    /root/reference/utils/audio.py:21-24 — here those are optional)."""
    import shutil
    import sys

    import pytest

    from svc_inference_pipeline_tpu.utils.audio_io import UnsupportedAudioFormatError

    p = tmp_path / "clip.mp3"
    p.write_bytes(b"\xff\xfb\x90\x00" + b"\x00" * 64)  # mp3-ish garbage
    monkeypatch.setitem(sys.modules, "soundfile", None)  # import → ImportError
    monkeypatch.setattr(shutil, "which", lambda name: None)
    with pytest.raises(UnsupportedAudioFormatError, match="soundfile|ffmpeg"):
        load_audio(str(p), 24000)


def test_external_decoder_reference_magnitude_rules(tmp_path, monkeypatch):
    """A pluggable decoder's output goes through the SAME magnitude rules
    as the native paths: float data with |x| > 2^15 is treated as
    32-bit-scaled (utils/audio.py:34-40), stereo keeps channel 0."""
    import sys
    import types

    p = tmp_path / "clip.ogg"
    p.write_bytes(b"OggS" + b"\x00" * 64)

    rate = 24000
    n = rate // 2
    t = np.arange(n) / rate
    ch0 = (0.25 * np.sin(2 * np.pi * 220 * t)).astype(np.float32) * 2**18
    ch1 = np.zeros(n, np.float32)

    fake = types.ModuleType("soundfile")

    def fake_read(path, always_2d=True, dtype="float32"):
        assert path == str(p)
        return np.stack([ch0, ch1], axis=1), rate

    fake.read = fake_read
    monkeypatch.setitem(sys.modules, "soundfile", fake)

    audio, fs = load_audio(str(p), rate)
    assert fs == rate and audio.dtype == np.float32
    # magnitude 2^16 (0.25·2^18) > 2^15 → normalised by 2^31 + 1
    np.testing.assert_allclose(audio, ch0 / (2**31 + 1), rtol=1e-6)


def test_external_decoder_ffmpeg_fallback(tmp_path, monkeypatch):
    """soundfile absent → the ffmpeg subprocess route decodes (stubbed
    ffmpeg binary: copies a pre-made WAV to the requested output)."""
    import os
    import shutil
    import stat
    import sys

    src = tmp_path / "clip.mp3"
    src.write_bytes(b"\xff\xfb\x90\x00" + b"\x00" * 64)

    rate = 24000
    tone = (0.5 * np.sin(2 * np.pi * 330 * np.arange(rate // 4) / rate)).astype(np.float32)
    wav_path = tmp_path / "decoded.wav"
    write_wav(str(wav_path), tone, rate)

    fake_ffmpeg = tmp_path / "ffmpeg"
    fake_ffmpeg.write_text(
        "#!/bin/sh\n"
        # last argument is the output path
        'for out do :; done\n'
        f'cp "{wav_path}" "$out"\n'
    )
    fake_ffmpeg.chmod(fake_ffmpeg.stat().st_mode | stat.S_IEXEC)

    monkeypatch.setitem(sys.modules, "soundfile", None)
    monkeypatch.setattr(shutil, "which",
                        lambda name: str(fake_ffmpeg) if name == "ffmpeg" else None)

    audio, fs = load_audio(str(src), rate)
    assert fs == rate
    # 16-bit WAV round trip of the tone
    np.testing.assert_allclose(audio, np.round(tone * 32767) / 32768, atol=2e-4)
