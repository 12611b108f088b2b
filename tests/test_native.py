"""Native C++ audio runtime vs the numpy reference implementations."""

import numpy as np
import pytest

from svc_inference_pipeline_tpu.utils import audio_io

native = pytest.importorskip("svc_inference_pipeline_tpu.native.wav_codec")


@pytest.fixture(scope="module", autouse=True)
def _built():
    try:
        native._load()
    except Exception as e:  # no compiler in env
        pytest.skip(f"native build unavailable: {e}")


def test_native_decode_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    wav = rng.uniform(-0.99, 0.99, 5000).astype(np.float32)
    path = str(tmp_path / "a.wav")
    audio_io.write_wav(path, wav, 24000)

    np_samples, np_sr = audio_io.read_wav(path)
    nat_samples, nat_sr = native.read_wav(path)
    assert nat_sr == np_sr == 24000
    # numpy path returns raw int16; native returns normalised float
    np.testing.assert_allclose(
        nat_samples[:, 0], np_samples[:, 0].astype(np.float32) / 32768.0, atol=1e-7
    )


def test_native_decode_reference_clip(test_wav):
    nat, sr = native.read_wav(test_wav)
    ref, sr2 = audio_io.read_wav(test_wav)
    assert sr == sr2 == 44100
    np.testing.assert_allclose(nat[:, 0], ref[:, 0].astype(np.float32) / 32768.0, atol=1e-7)


def test_native_encode_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    wav = rng.uniform(-0.9, 0.9, 3000).astype(np.float32)
    path = str(tmp_path / "b.wav")
    native.write_wav(path, wav, 16000)
    back, sr = audio_io.read_wav(path)
    assert sr == 16000
    np.testing.assert_allclose(back[:, 0] / 32767.0, wav, atol=1.1 / 32767)


def test_native_resample_matches_jax():
    from svc_inference_pipeline_tpu.ops.resample import resample as jresample

    rng = np.random.default_rng(2)
    x = rng.standard_normal(44100).astype(np.float32) * 0.5
    a = native.resample(x, 44100, 24000)
    b = np.asarray(jresample(x, 44100, 24000))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
