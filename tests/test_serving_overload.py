"""Serving overload protection: bounded queue + 503 shedding + drain
deadline + stream cap (VERDICT r4 weak #5).

Uses a stub pipeline (no device work) so the flood is fast and
deterministic; the reference has no serving layer at all — this protects
the framework's own addition."""

import os
import tempfile
import threading
import time

import numpy as np
import pytest

from svc_inference_pipeline_tpu.config import DEFAULT_CONFIG, load_config
from svc_inference_pipeline_tpu.serving import ServerOverloaded, SVCServer, _Request


@pytest.fixture(scope="module")
def cfg():
    return load_config(DEFAULT_CONFIG)


class SlowFakePipe:
    """Pipeline stand-in: conversions take batch_s seconds of wall time."""

    def __init__(self, cfg, batch_s=0.3):
        self.cfg = cfg
        self.batch_s = batch_s
        self.sampler = "ddpm"

    def _resolve_sampler(self, sampler, speedup):
        return (sampler or "ddpm", speedup or 1)

    def mel_frame_count(self, n_samples):
        return max(1, n_samples // 256)

    def convert_batch(self, wavs, singers, **kw):
        time.sleep(self.batch_s)
        return [np.zeros(2400, np.float32) for _ in wavs]

    def convert(self, wav, singer, **kw):
        time.sleep(self.batch_s)
        return np.zeros(2400, np.float32)


def _wav_bytes(dur=0.2, fs=24000):
    from svc_inference_pipeline_tpu.utils.audio_io import write_wav

    t = np.arange(int(dur * fs)) / fs
    tone = (0.4 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as tf:
        write_wav(tf.name, tone, fs)
    data = open(tf.name, "rb").read()
    os.unlink(tf.name)
    return data


def test_flood_sheds_instead_of_piling_up(cfg):
    """With the queue bounded at 2 and a slow worker, a 10-request flood
    sheds the overflow with ServerOverloaded — every request either
    completes or sheds, and the queue depth never exceeds the cap."""
    pipe = SlowFakePipe(cfg, batch_s=0.4)
    server = SVCServer(pipe, cfg, coalesce_ms=1.0, max_batch=1, max_queue=2)
    payload = _wav_bytes()
    n = 10
    outcomes = [None] * n

    def work(i):
        try:
            outcomes[i] = ("ok", server.convert_bytes(payload, "svcc_CDF1"))
        except ServerOverloaded as e:
            outcomes[i] = ("shed", e)

    try:
        threads = [threading.Thread(target=work, args=(i,)) for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        kinds = [o[0] for o in outcomes if o is not None]
        assert len(kinds) == n, "every request must resolve (no pile-up hang)"
        assert kinds.count("shed") >= 1, "the flood must shed at least once"
        assert kinds.count("ok") >= 1, "shedding must not starve all requests"
        assert server.sheds == kinds.count("shed")
        ok = [o for o in outcomes if o[0] == "ok"]
        assert all(r[1][:4] == b"RIFF" for r in ok)
    finally:
        server.close(drain_s=10.0)


def test_drain_deadline_completes_then_fails(cfg):
    """Requests queued before close() convert while the drain deadline
    holds; past it they fail fast instead of hanging."""
    pipe = SlowFakePipe(cfg, batch_s=0.05)
    server = SVCServer(pipe, cfg, coalesce_ms=1.0, max_batch=1, max_queue=8)

    # within-deadline drain: the queued request still converts
    server._drain_deadline = time.time() + 30.0
    lucky = _Request(np.zeros(2400, np.float32), "svcc_CDF1")
    server.queue.put(lucky)
    server._drain()
    assert lucky.event.is_set() and lucky.error is None
    assert lucky.result is not None

    # expired deadline: the queued request fails, never hangs
    server._drain_deadline = time.time() - 1.0
    stranded = _Request(np.zeros(2400, np.float32), "svcc_CDF1")
    server.queue.put(stranded)
    server._drain()
    assert stranded.event.is_set()
    assert isinstance(stranded.error, RuntimeError)
    server.close(drain_s=0.0)


def test_stream_slot_cap_sheds(cfg):
    """Beyond max_streams concurrent streaming responses, the next stream
    sheds with ServerOverloaded (and counts into the metrics)."""
    pipe = SlowFakePipe(cfg)
    server = SVCServer(pipe, cfg, coalesce_ms=1.0, max_batch=1, max_streams=1)
    try:
        server._streams = server.max_streams  # one stream already open
        gen = server.convert_stream_pcm(_wav_bytes(), "svcc_CDF1")
        with pytest.raises(ServerOverloaded):
            next(gen)
        assert server.sheds == 1
        assert server._streams == server.max_streams  # slot count unchanged
    finally:
        server._streams = 0
        server.close(drain_s=0.0)
