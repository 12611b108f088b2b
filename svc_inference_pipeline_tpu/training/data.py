"""Training data pipeline: wav corpus → bucketed feature batches.

The reference has no training path at all (SURVEY §2.9/§4). This loader
feeds the diffusion and GAN objectives:

* front-end features (normalised mel target, content PPG, F0, energy,
  singer id) computed once per utterance and cached as npz,
* length bucketing so each batch jits one static shape,
* a background-thread prefetcher overlapping host feature extraction and
  device steps (the native C++ codec keeps decode off the Python heap).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from svc_inference_pipeline_tpu.utils.artifacts import load_mel_min_max, normalize_mel_channel
from svc_inference_pipeline_tpu.utils.audio_io import load_audio
from svc_inference_pipeline_tpu.utils.registry import load_singer_lut


class FeatureExtractor:
    """Utterance → training feature dict (mirrors the inference front-end)."""

    def __init__(self, cfg, whisper=None, cache_dir: Optional[str] = None):
        self.cfg = cfg
        self.whisper = whisper
        self.cache_dir = cache_dir
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)

    def __call__(self, wav_path: str, singer_id: int) -> Dict[str, np.ndarray]:
        cache_path = None
        if self.cache_dir:
            key = os.path.basename(wav_path).rsplit(".", 1)[0]
            cache_path = os.path.join(self.cache_dir, f"{key}.npz")
            if os.path.exists(cache_path):
                with np.load(cache_path) as f:
                    out = {k: f[k] for k in f.files}
                out["singer"] = np.array([singer_id], dtype=np.int32)
                return out

        import jax.numpy as jnp

        from svc_inference_pipeline_tpu.ops.f0 import get_f0_features
        from svc_inference_pipeline_tpu.ops.mel import extract_mel_features

        audio, _ = load_audio(wav_path, self.cfg.fs)
        mel, energy = extract_mel_features(jnp.asarray(audio), self.cfg)
        mel = np.asarray(mel)  # [n_mels, T]
        n_frames = mel.shape[-1]
        f0, _ = get_f0_features(np.asarray(audio), n_frames, self.cfg)

        mel_min, mel_max = load_mel_min_max(self.cfg.min_mel_file, self.cfg.max_mel_file)
        mel_norm = normalize_mel_channel(mel, mel_min, mel_max).T  # [T, n_mels]

        feats: Dict[str, np.ndarray] = {
            "mel": mel_norm.astype(np.float32),
            "melody": f0.astype(np.float32),
            "loudness": np.asarray(energy, dtype=np.float32),
            "wave": np.asarray(audio[: n_frames * self.cfg.hop_length], dtype=np.float32),
        }
        if self.whisper is not None:
            feats["content_whisper"] = self.whisper.extract(np.asarray(audio), n_frames).astype(
                np.float32
            )

        if cache_path:
            np.savez(cache_path, **feats)
        feats["singer"] = np.array([singer_id], dtype=np.int32)
        return feats


def bucket_length(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class BucketedLoader:
    """(wav, singer) manifest → shuffled, bucketed, prefetched batches.

    Batches are dicts of stacked arrays cropped/padded to the bucket length;
    items longer than the largest bucket are random-cropped.
    """

    def __init__(
        self,
        manifest: List[Tuple[str, str]],  # (wav_path, singer_name)
        cfg,
        extractor: FeatureExtractor,
        batch_size: int = 8,
        buckets: Sequence[int] = (256, 512, 1024, 2048),
        seed: int = 0,
        prefetch: int = 2,
    ):
        self.cfg = cfg
        self.extractor = extractor
        self.batch_size = batch_size
        self.buckets = tuple(sorted(buckets))
        self.rng = np.random.default_rng(seed)
        lut = load_singer_lut(cfg.singer_file)
        self.items = [(path, lut[name]) for path, name in manifest]
        self.prefetch = prefetch

    def _make_batch(self, idxs: Sequence[int]) -> Dict[str, np.ndarray]:
        feats = [self.extractor(*self.items[i]) for i in idxs]
        max_len = max(f["melody"].shape[0] for f in feats)
        blen = bucket_length(max_len, self.buckets)
        hop = self.cfg.hop_length

        def fit(x: np.ndarray, length: int) -> np.ndarray:
            if x.shape[0] > length:
                start = int(self.rng.integers(0, x.shape[0] - length + 1))
                return x[start : start + length]
            pad = [(0, length - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
            return np.pad(x, pad)

        batch: Dict[str, np.ndarray] = {}
        for key in feats[0]:
            if key == "singer":
                batch[key] = np.stack([f[key] for f in feats])
            elif key == "wave":
                batch[key] = np.stack([fit(f[key], blen * hop) for f in feats])
            else:
                batch[key] = np.stack([fit(f[key], blen) for f in feats])
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self.rng.permutation(len(self.items))
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order) - self.batch_size + 1, self.batch_size)
        ]
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        done = object()

        def producer():
            for idxs in batches:
                q.put(self._make_batch(idxs))
            q.put(done)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is done:
                break
            yield item
