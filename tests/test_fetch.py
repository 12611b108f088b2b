"""Whisper checkpoint fetch registry (reference __init__.py:33-64 semantics).

Zero-egress environment: the network is injected (``_urlopen``); what's
under test is the cache/verify/re-download state machine and the
opt-in download gate.
"""

import hashlib
import io
import os

import pytest

from svc_inference_pipeline_tpu.checkpoints.fetch import (
    WHISPER_URLS,
    fetch_whisper_checkpoint,
)
from svc_inference_pipeline_tpu.checkpoints import fetch as fetch_mod


class _FakeResponse(io.BytesIO):
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _with_digest(monkeypatch, payload: bytes, name="tiny"):
    digest = hashlib.sha256(payload).hexdigest()
    monkeypatch.setitem(fetch_mod.WHISPER_SHA256, name, digest)
    return digest


def test_urls_follow_reference_registry_format():
    from svc_inference_pipeline_tpu.checkpoints.torch_convert import WHISPER_SHA256

    for name, url in WHISPER_URLS.items():
        assert WHISPER_SHA256[name] in url  # sha256 is the path component
        assert url.endswith(".pt")
    # 'large' aliases large-v2 (same digest, same artifact)
    assert WHISPER_URLS["large"].endswith("large-v2.pt")


def test_download_gate_blocks_by_default(tmp_path, monkeypatch):
    monkeypatch.delenv("SVC_ALLOW_DOWNLOAD", raising=False)
    with pytest.raises(FileNotFoundError, match="SVC_ALLOW_DOWNLOAD"):
        fetch_whisper_checkpoint("tiny", cache_dir=str(tmp_path))


def test_fetch_download_verify_and_cache(tmp_path, monkeypatch):
    payload = b"model-bytes" * 100
    _with_digest(monkeypatch, payload)
    calls = []

    def urlopen(url):
        calls.append(url)
        return _FakeResponse(payload)

    path = fetch_whisper_checkpoint(
        "tiny", cache_dir=str(tmp_path), allow_download=True, _urlopen=urlopen
    )
    assert open(path, "rb").read() == payload
    assert calls == [WHISPER_URLS["tiny"]]

    # cache hit: no second network call, gate not even consulted
    path2 = fetch_whisper_checkpoint(
        "tiny", cache_dir=str(tmp_path), allow_download=False, _urlopen=urlopen
    )
    assert path2 == path and len(calls) == 1


def test_fetch_redownloads_corrupt_cache(tmp_path, monkeypatch):
    payload = b"good-model-bytes" * 64
    _with_digest(monkeypatch, payload)
    target = tmp_path / "tiny.pt"
    target.write_bytes(b"corrupt")  # stale/corrupt cache entry

    path = fetch_whisper_checkpoint(
        "tiny", cache_dir=str(tmp_path), allow_download=True,
        _urlopen=lambda url: _FakeResponse(payload),
    )
    assert open(path, "rb").read() == payload  # replaced, verified


def test_fetch_rejects_corrupt_download(tmp_path, monkeypatch):
    _with_digest(monkeypatch, b"expected-bytes")
    with pytest.raises(RuntimeError, match="sha256"):
        fetch_whisper_checkpoint(
            "tiny", cache_dir=str(tmp_path), allow_download=True,
            _urlopen=lambda url: _FakeResponse(b"tampered-bytes"),
        )
    assert not os.listdir(tmp_path)  # no partial artifacts left behind


def test_unknown_model_name(tmp_path):
    with pytest.raises(KeyError, match="unknown whisper model"):
        fetch_whisper_checkpoint("huge", cache_dir=str(tmp_path))
