"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding paths are validated on an emulated host mesh
(``--xla_force_host_platform_device_count=8``) — the standard JAX trick for
testing pjit/shard_map without TPU hardware. Must run before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon boot hook (sitecustomize) force-sets jax_platforms="axon,cpu" at
# interpreter startup, which silently routes every test computation to the
# remote TPU with ~20s remote compiles. Re-override to genuine local CPU.
jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def repo_root():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def cfg(repo_root):
    from svc_inference_pipeline_tpu.config import load_config

    c = load_config(os.path.join(repo_root, "config", "config.json"))
    # Point file artifacts at absolute paths so tests are cwd-independent.
    for key in ("singer_file", "min_mel_file", "max_mel_file", "target_f0_file"):
        c[key] = os.path.join(repo_root, c[key].lstrip("./"))
    return c


@pytest.fixture(scope="session")
def test_wav():
    path = os.path.join(REFERENCE, "test_set", "1100000814.wav")
    if not os.path.exists(path):
        pytest.skip("reference test wav not available")
    return path


@pytest.fixture(scope="session")
def golden_wav():
    path = os.path.join(REFERENCE, "gen", "1100000814_svcc_CDF1.wav")
    if not os.path.exists(path):
        pytest.skip("reference golden wav not available")
    return path


def _install_reference_stubs():
    """Make the reference's torch modules importable as test oracles.

    The reference imports librosa/parselmouth/etc. which are not installed;
    for the modules we use as oracles (mel, encoder) only two librosa
    functions are actually called. We register a minimal stub implementing
    those from our own (independently derived) DSP code, so the reference
    code itself runs unmodified as the source of truth.
    """
    import importlib.machinery
    import types

    import svc_inference_pipeline_tpu.ops.mel as our_mel

    def _stub_module(name):
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return mod

    librosa = _stub_module("librosa")
    librosa.filters = _stub_module("librosa.filters")

    def _mel(*, sr, n_fft, n_mels, fmin=0.0, fmax=None, **kw):
        return our_mel.mel_filterbank(sr, n_fft, n_mels, fmin, fmax).astype(np.float64)

    def _note_to_hz(note):
        names = {"C": 0, "D": 2, "E": 4, "F": 5, "G": 7, "A": 9, "B": 11}
        semitone = names[note[0]] + (12 * (int(note[-1]) + 1))
        return 440.0 * 2.0 ** ((semitone - 69) / 12.0)

    librosa.filters.mel = _mel
    librosa.note_to_hz = _note_to_hz
    librosa.core = _stub_module("librosa.core")
    sys.modules.setdefault("librosa", librosa)
    sys.modules.setdefault("librosa.filters", librosa.filters)
    sys.modules.setdefault("librosa.core", librosa.core)

    for name in ("parselmouth", "torchcrepe", "pyworld", "soundfile", "ffmpeg", "torchaudio"):
        sys.modules.setdefault(name, _stub_module(name))

    fairseq = _stub_module("fairseq")
    fairseq.checkpoint_utils = _stub_module("fairseq.checkpoint_utils")
    sys.modules.setdefault("fairseq", fairseq)
    sys.modules.setdefault("fairseq.checkpoint_utils", fairseq.checkpoint_utils)


@pytest.fixture(scope="session")
def reference_modules():
    """Import the reference repo's torch modules (oracle for parity tests)."""
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo not available")
    _install_reference_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import modules.bigvgan as ref_bigvgan  # noqa: F401
    import modules.diffsvc as ref_diffsvc  # noqa: F401
    import modules.encoder as ref_encoder  # noqa: F401
    import utils.mel as ref_mel  # noqa: F401

    return types_namespace(
        diffsvc=ref_diffsvc, encoder=ref_encoder, mel=ref_mel, bigvgan=ref_bigvgan
    )


def types_namespace(**kw):
    import types

    ns = types.SimpleNamespace(**kw)
    return ns
