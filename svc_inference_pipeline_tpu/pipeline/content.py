"""Content feature extractors: Whisper PPG (live path) and ContentVec.

Reference behaviour being replaced:
* utils/whisper.py:96-103 reloads the 769M-parameter Whisper model on
  EVERY call — here the encoder params live on device once,
* the audio reaches Whisper through an ffmpeg subprocess at 16 kHz
  (whisper_extractor/audio.py:22-49) — here the 24 kHz pipeline waveform is
  resampled on device, no process boundary,
* features are remapped 480→256 hop on the host in numpy
  (utils/whisper.py:31-81) — here the remap is jitted with the encoder.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from svc_inference_pipeline_tpu.models.whisper import WhisperAudioEncoder, WhisperDims, WHISPER_SIZES
from svc_inference_pipeline_tpu.ops.remap import remap_features
from svc_inference_pipeline_tpu.ops.whisper_mel import (
    N_SAMPLES,
    log_mel_spectrogram,
    pad_or_trim,
)
from svc_inference_pipeline_tpu.ops.resample import resample


def stack_encoder_block_params(params, n_layers: int):
    """Per-block encoder params (``block_i/...`` — the torch-converter
    layout) → the scanned layout (``blocks/block/...`` with a leading layer
    axis) consumed by WhisperAudioEncoder(scan_layers=True)."""
    blocks = [params[f"block_{i}"] for i in range(n_layers)]
    # stack HOST-SIDE: converter/random params arrive as numpy, and an eager
    # jnp.stack under the axon backend round-trips every block over the TPU
    # tunnel (upload f32 → remote stack → the caller's host-side cast then
    # downloads it all again) — ~2.4 GB of avoidable transfers for medium
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *blocks
    )
    out = {k: v for k, v in params.items() if not k.startswith("block_")}
    out["blocks"] = {"block": stacked}
    return out


class WhisperPPGExtractor:
    """audio @ fs → PPG features aligned to the mel hop grid.

    Holds converted encoder params; one jit-compiled function covers
    resample → pad/trim(30 s) → log-mel [80,3000] → encoder [1500, D].
    """

    def __init__(
        self,
        dims: WhisperDims,
        params,
        compute_dtype=jnp.bfloat16,
        fs: int = 24000,
        scan_layers=None,
    ):
        self.dims = dims
        # scan-over-layers: deep encoders (medium = 24 blocks) compile as ONE
        # scanned block instead of 24 unrolled ones — auto-on for ≥ 12
        # layers; per-block params (converter layout) are stacked on the fly
        if scan_layers is None:
            scan_layers = dims.n_audio_layer >= 12
        if scan_layers and "block_0" in params:
            params = stack_encoder_block_params(params, dims.n_audio_layer)
        self.scan_layers = scan_layers
        # matmul weights stored at the compute dtype: the encoder already
        # runs bf16, so f32 storage only doubled the host→device upload
        # (~1.2 GB → 600 MB for medium; ~27 s on this tunnel) and the HBM
        # reads per encode. LayerNorm scales/biases (ndim<2) stay f32 — the
        # norm islands compute in f32.
        if compute_dtype != jnp.float32:
            import numpy as np

            def _store(path, x):
                # LayerNorm scale/bias stay f32 BY PATH, not ndim: the
                # scan-layers stacking promotes them to [L, C] (ndim 2),
                # which an ndim test would wrongly cast into the f32 norm
                # islands (module names: attn_ln / mlp_ln / ln_post)
                if any(
                    getattr(k, "key", "").endswith(("_ln", "ln_post"))
                    for k in path
                ):
                    return np.asarray(x)
                a = np.asarray(x)
                if a.ndim >= 2 and a.dtype == np.float32:
                    return a.astype(jnp.dtype(compute_dtype))  # host-side cast
                return a

            params = jax.tree_util.tree_map_with_path(_store, params)
        self.params = jax.device_put(params)  # keep weights device-resident
        self.fs = fs
        self.encoder = WhisperAudioEncoder(
            dims, compute_dtype=compute_dtype, scan_layers=scan_layers
        )
        self._embed = jax.jit(
            lambda p, mel: self.encoder.apply({"params": p}, mel)
        )

    @classmethod
    def from_torch_checkpoint(cls, path: str, **kw) -> "WhisperPPGExtractor":
        from svc_inference_pipeline_tpu.checkpoints.torch_convert import load_whisper

        dims_dict, params = load_whisper(path)
        dims = WhisperDims(**dims_dict)
        return cls(dims, params["encoder"], **kw)

    @classmethod
    def random_init(cls, size_or_dims="tiny", seed: int = 0, **kw) -> "WhisperPPGExtractor":
        """Random-weight extractor for smoke runs (no checkpoints ship with
        the reference repo). Init runs on the host CPU — compiling a 24-layer
        init graph remotely on the accelerator would waste minutes."""
        dims = (
            WHISPER_SIZES[size_or_dims]
            if isinstance(size_or_dims, str)
            else size_or_dims
        )
        enc = WhisperAudioEncoder(dims)
        from svc_inference_pipeline_tpu.utils.devices import fast_random_params

        params = fast_random_params(
            lambda: enc.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, dims.n_mels, 3000), jnp.float32)
            ),
            seed=seed,
        )["params"]
        return cls(dims, params, **kw)

    def shard(self, mesh, rules) -> None:
        """Re-place the encoder params with tensor-parallel NamedShardings
        (parallel/sharding.py rules); GSPMD propagates through the encode.

        The Pallas attention kernel is turned off here: GSPMD cannot
        partition the opaque pallas_call, so with head-sharded q/k/v it
        would force all-gathers around every layer's attention. The XLA
        formulation partitions cleanly on the head axis instead."""
        from svc_inference_pipeline_tpu.parallel.sharding import shard_params

        self.params = shard_params(self.params, mesh, rules)
        self.encoder = WhisperAudioEncoder(
            self.dims,
            compute_dtype=self.encoder.compute_dtype,
            scan_layers=self.scan_layers,
            use_pallas_attn=False,
        )
        self._embed = jax.jit(
            lambda p, mel: self.encoder.apply({"params": p}, mel)
        )

    def ensure_unstacked(self) -> None:
        """Revert scanned param layout to per-block ``block_i`` dicts.

        The sequence-parallel encoder (parallel/sp_whisper.py) runs a
        python loop over blocks inside ``shard_map`` and therefore needs
        the converter layout; deep encoders stack it for scan-over-layers
        at construction. No-op when already unstacked."""
        if "blocks" not in self.params:
            return
        stacked = self.params["blocks"]["block"]
        params = {k: v for k, v in self.params.items() if k != "blocks"}
        for i in range(self.dims.n_audio_layer):
            params[f"block_{i}"] = jax.tree_util.tree_map(
                lambda x, i=i: x[i], stacked
            )
        self.params = jax.device_put(params)
        self.scan_layers = False
        self.encoder = WhisperAudioEncoder(
            self.dims, compute_dtype=self.encoder.compute_dtype, scan_layers=False
        )
        self._embed = jax.jit(
            lambda p, mel: self.encoder.apply({"params": p}, mel)
        )

    def embed_audio(self, mel: jnp.ndarray) -> jnp.ndarray:
        """[B, 80, 3000] → [B, 1500, D] (whisper_extractor/model.py:217)."""
        return self._embed(self.params, mel)

    def extract(self, audio: np.ndarray, mel_len: int, chunked: bool = True) -> np.ndarray:
        """Waveform @ self.fs → mel-rate PPG [T', D].

        ≤30 s: exactly whisper_feature_extractor (utils/whisper.py:96-103) —
        pad/trim, [1500, D] encode, 480→256 remap. Longer audio: the
        reference silently TRUNCATES to 30 s (whisper_extractor/audio.py:
        52-73, utils/whisper.py:52-56); with ``chunked=True`` (default) the
        clip is encoded in batched 30 s windows instead, so conversion
        covers the full clip (capability beyond the reference).
        """
        from svc_inference_pipeline_tpu.ops.resample import resample_host

        # audio arrives host-resident; resample on host (native C++ path) —
        # C=1 convolutions waste 127/128 TPU lanes
        audio16 = np.asarray(resample_host(np.asarray(audio), self.fs, 16000))
        n_windows = max(1, -(-len(audio16) // N_SAMPLES)) if chunked else 1
        windows = np.zeros((n_windows, N_SAMPLES), dtype=np.float32)
        for w in range(n_windows):
            seg = audio16[w * N_SAMPLES : (w + 1) * N_SAMPLES]
            windows[w, : len(seg)] = seg
        mel = log_mel_spectrogram(jnp.asarray(windows))  # [W, 80, 3000]
        feats = self.embed_audio(mel)  # [W, 1500, D]
        feats = np.asarray(feats, dtype=np.float32).reshape(-1, feats.shape[-1])
        return remap_features(
            feats, mel_len, max_source_len=feats.shape[0]
        )


class ContentVecExtractor:
    """ContentVec/HuBERT content features (configured-off on the reference's
    live path: wired in config but commented out in the driver, infer.py:65).

    Backed by models/hubert.py; checkpoint conversion from fairseq layout.
    """

    def __init__(self, params, cfg=None, fs: int = 24000, output_layer: int = 9):
        from svc_inference_pipeline_tpu.models.hubert import HubertModel, HubertConfig

        self.cfg = cfg or HubertConfig()
        self.model = HubertModel(self.cfg)
        self.params = jax.device_put(params)
        self.fs = fs
        self.output_layer = output_layer
        self._extract = jax.jit(
            lambda p, wav: self.model.apply(
                {"params": p}, wav, output_layer=self.output_layer, final_proj=True
            )
        )

    @classmethod
    def from_torch_checkpoint(cls, path: str, **kw) -> "ContentVecExtractor":
        from svc_inference_pipeline_tpu.checkpoints.hubert_convert import load_hubert

        cfg, params = load_hubert(path)
        return cls(params, cfg=cfg, **kw)

    @classmethod
    def random_init(cls, seed: int = 0, **kw) -> "ContentVecExtractor":
        from svc_inference_pipeline_tpu.models.hubert import HubertModel, HubertConfig

        cfg = HubertConfig()
        model = HubertModel(cfg)
        params = model.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, 16000), jnp.float32),
            output_layer=9,
            final_proj=True,
        )["params"]
        return cls(params, cfg=cfg, **kw)

    def extract(self, audio: np.ndarray, mel_len: int) -> np.ndarray:
        """Waveform @ self.fs → [mel_len, 256] (utils/hubert.py:138-143)."""
        from svc_inference_pipeline_tpu.ops.remap import remap_features_tolerant
        from svc_inference_pipeline_tpu.ops.resample import resample_host

        audio16 = jnp.asarray(resample_host(np.asarray(audio), self.fs, 16000))
        feats = self._extract(self.params, audio16[None])[0]  # [S, 256]
        return remap_features_tolerant(np.asarray(feats, dtype=np.float32), mel_len)
