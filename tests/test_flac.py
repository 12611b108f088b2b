"""Native FLAC decoder (native/flac_codec.cc) — round-trip validation.

The reference decodes non-WAV audio via librosa/ffmpeg
(/root/reference/utils/audio.py:21-24); here a native C++ FLAC decoder
serves that route. No FLAC tooling exists in this environment, so streams
are produced by the spec-correct fixture encoder (tests/flac_fixture.py)
and the decode must reproduce the original PCM exactly across every
subframe type and channel-decorrelation mode.
"""

import numpy as np
import pytest

from svc_inference_pipeline_tpu.utils.audio_io import load_audio

from flac_fixture import write_flac


def _tone_pcm(n, ch, bits, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 24000.0
    amp = 2 ** (bits - 2)
    base = amp * np.sin(2 * np.pi * 220.0 * t) + 0.02 * amp * rng.standard_normal(n)
    out = np.stack(
        [np.round(base * (1.0 - 0.25 * c)).astype(np.int64) for c in range(ch)], axis=1
    )
    return np.clip(out, -(2 ** (bits - 1)), 2 ** (bits - 1) - 1)


def _decode_ch0(path):
    from svc_inference_pipeline_tpu.native.wav_codec import read_flac

    samples, rate = read_flac(path)
    return samples[:, 0], rate


@pytest.mark.parametrize("subframe", ["verbatim", "fixed1", "fixed2", "fixed3", "fixed4", "lpc"])
def test_mono_subframe_types_exact(tmp_path, subframe):
    pcm = _tone_pcm(4000, 1, 16, seed=1)
    path = str(tmp_path / f"{subframe}.flac")
    write_flac(path, pcm, 24000, bits=16, blocksize=1024, subframe=subframe)
    dec, rate = _decode_ch0(path)
    assert rate == 24000
    assert len(dec) == 4000
    np.testing.assert_array_equal(
        np.round(dec * 32768.0).astype(np.int64), pcm[:, 0]
    )


def test_constant_subframe(tmp_path):
    pcm = np.full((2048, 1), -1234, np.int64)
    path = str(tmp_path / "const.flac")
    write_flac(path, pcm, 24000, subframe="constant")
    dec, _ = _decode_ch0(path)
    np.testing.assert_array_equal(np.round(dec * 32768.0).astype(np.int64), pcm[:, 0])


@pytest.mark.parametrize("mode", ["independent", "left-side", "right-side", "mid-side"])
def test_stereo_decorrelation_channel0_exact(tmp_path, mode):
    """Channel 0 (left) must be reconstructed exactly through every
    decorrelation mode — matching the loader's channel-0 contract."""
    pcm = _tone_pcm(3000, 2, 16, seed=2)
    path = str(tmp_path / f"{mode}.flac")
    write_flac(path, pcm, 24000, blocksize=512, mode=mode, subframe="fixed2")
    dec, _ = _decode_ch0(path)
    np.testing.assert_array_equal(np.round(dec * 32768.0).astype(np.int64), pcm[:, 0])


def test_24bit_decode(tmp_path):
    pcm = _tone_pcm(2048, 1, 24, seed=3)
    path = str(tmp_path / "b24.flac")
    write_flac(path, pcm, 48000, bits=24, subframe="fixed2")
    dec, rate = _decode_ch0(path)
    assert rate == 48000
    np.testing.assert_array_equal(
        np.round(dec * 8388608.0).astype(np.int64), pcm[:, 0]
    )


def test_load_audio_flac_reference_semantics(tmp_path):
    """load_audio on a .flac: float output in [-1, 1] (already normalised →
    magnitude rule divides by 1.0), channel 0, resampled to the target
    rate — same contract as the WAV route."""
    pcm = _tone_pcm(48000, 2, 16, seed=4)
    path = str(tmp_path / "clip.flac")
    write_flac(path, pcm, 48000, blocksize=4096, mode="mid-side")
    audio, fs = load_audio(path, 24000)
    assert fs == 24000
    assert audio.dtype == np.float32
    assert 23900 <= len(audio) <= 24100
    assert np.abs(audio).max() <= 1.01
    # same clip through the WAV route must agree after the shared resampler
    from svc_inference_pipeline_tpu.utils.audio_io import write_wav

    wpath = str(tmp_path / "clip.wav")
    write_wav(wpath, pcm[:, 0].astype(np.float32) / 32767.0, 48000)
    ref, _ = load_audio(wpath, 24000)
    n = min(len(ref), len(audio))
    np.testing.assert_allclose(audio[:n], ref[:n], atol=2e-4)


def test_truncated_stream_fails_loudly(tmp_path):
    pcm = _tone_pcm(4000, 1, 16, seed=5)
    path = str(tmp_path / "trunc.flac")
    write_flac(path, pcm, 24000)
    data = open(path, "rb").read()
    bad = str(tmp_path / "bad.flac")
    with open(bad, "wb") as f:
        f.write(data[: len(data) // 2])
    from svc_inference_pipeline_tpu.native.wav_codec import read_flac

    with pytest.raises(OSError):
        read_flac(bad)


def _patch_total_samples(data: bytes, total: int) -> bytes:
    """Rewrite STREAMINFO's 36-bit total_samples field (payload bytes
    13..17 after the 8-byte fLaC+block header)."""
    b = bytearray(data)
    off = 8
    b[off + 13] = (b[off + 13] & 0xF0) | ((total >> 32) & 0x0F)
    b[off + 14] = (total >> 24) & 0xFF
    b[off + 15] = (total >> 16) & 0xFF
    b[off + 16] = (total >> 8) & 0xFF
    b[off + 17] = total & 0xFF
    return bytes(b)


def test_stream_shorter_than_streaminfo_fails(tmp_path):
    """A stream ending at a frame boundary short of STREAMINFO's promise
    must error (previously zero-filled silently)."""
    pcm = _tone_pcm(4000, 1, 16, seed=6)
    path = str(tmp_path / "short.flac")
    write_flac(path, pcm, 24000)
    data = _patch_total_samples(open(path, "rb").read(), 4000 * 2)
    bad = str(tmp_path / "overclaim.flac")
    open(bad, "wb").write(data)
    from svc_inference_pipeline_tpu.native.wav_codec import read_flac

    with pytest.raises(OSError, match="code 3"):
        read_flac(bad)


def test_unknown_total_samples_rejected(tmp_path):
    """STREAMINFO total_samples=0 ('unknown', streaming encoders) is
    rejected loudly rather than decoding to an empty array."""
    pcm = _tone_pcm(4000, 1, 16, seed=7)
    path = str(tmp_path / "unk.flac")
    write_flac(path, pcm, 24000)
    data = _patch_total_samples(open(path, "rb").read(), 0)
    bad = str(tmp_path / "unknown_len.flac")
    open(bad, "wb").write(data)
    from svc_inference_pipeline_tpu.native.wav_codec import read_flac

    with pytest.raises(OSError, match="unknown total_samples"):
        read_flac(bad)


@pytest.mark.parametrize("seed", range(6))
def test_randomized_roundtrip_fuzz(tmp_path, seed):
    """Seeded fuzz over the encoder's parameter space: random signal,
    bits/blocksize/stereo-mode/subframe combinations — channel-0 must
    round-trip exactly."""
    rng = np.random.default_rng(100 + seed)
    bits = int(rng.choice([16, 24]))
    blocksize = int(rng.choice([192, 576, 1024, 4096]))
    mode = str(rng.choice(["independent", "left-side", "right-side", "mid-side"]))
    subframe = str(rng.choice(["constant", "verbatim", "fixed1", "fixed2", "fixed3", "fixed4", "lpc"]))
    n = int(rng.integers(300, 9000))
    ch = 2 if mode != "independent" else int(rng.choice([1, 2]))

    amp = (1 << (bits - 2)) - 1
    if subframe == "constant":
        pcm = np.full((n, ch), int(rng.integers(-amp, amp)), np.int64)
    else:
        t = np.arange(n)[:, None]
        f = rng.uniform(30, 4000, ch)[None, :]
        pcm = (amp * 0.5 * np.sin(2 * np.pi * f * t / 24000)
               + rng.integers(-64, 64, (n, ch))).astype(np.int64)
        pcm = np.clip(pcm, -amp, amp)

    path = str(tmp_path / f"fuzz{seed}.flac")
    write_flac(path, pcm, 24000, bits=bits, blocksize=blocksize,
               mode=mode, subframe=subframe)
    from svc_inference_pipeline_tpu.native.wav_codec import read_flac

    out, rate = read_flac(path)
    assert rate == 24000
    expect = pcm[:, 0].astype(np.float64) / (1 << (bits - 1))
    np.testing.assert_allclose(out[:, 0].astype(np.float64), expect, atol=2 ** -(bits - 1) / 2)
