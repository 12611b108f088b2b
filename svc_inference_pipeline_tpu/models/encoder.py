"""Condition encoder: content + melody + loudness + singer → conditioner.

Functional rebuild of the reference's EncoderFramework
(/root/reference/modules/encoder.py:7-201) with channels-last [B, T, C]
layouts throughout:

* ContentEncoder — Dense(1024→384) per configured content type,
* MelodyEncoder — F0 → searchsorted over 255 log-spaced bins spanning
  (C1−0.1 Hz, C7] → 384-dim embedding (bin semantics: 0 = unvoiced/too-low,
  1 = f0_min, n_bins−2 = f0_max, n_bins−1 = above-max),
* LoudnessEncoder — energy → searchsorted over 255 log-spaced bins in
  [1e-30, 1.5] → embedding,
* SingerEncoder — Embedding(512, 384), broadcast over time,
* merge by elementwise sum (config ``merge_mode: add``) or concat.

torch.bucketize(x, bins) with right=False equals
jnp.searchsorted(bins, x, side='left') — verified in the parity tests.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# MIDI note frequencies: C1 ≈ 32.703 Hz, C7 ≈ 2093.005 Hz (librosa.note_to_hz).
_C1_HZ = 440.0 * 2.0 ** ((24 - 69) / 12.0)
_C7_HZ = 440.0 * 2.0 ** ((96 - 69) / 12.0)

_LOUDNESS_MIN = 1e-30
_LOUDNESS_MAX = 1.5


def melody_bins(n_bins: int) -> np.ndarray:
    """255 log-spaced bucket boundaries over (C1−0.1, C7] (encoder.py:38-57)."""
    return np.exp(
        np.linspace(np.log(_C1_HZ - 0.1), np.log(_C7_HZ), n_bins - 1)
    ).astype(np.float32)


def loudness_bins(n_bins: int) -> np.ndarray:
    """255 log-spaced bucket boundaries in [1e-30, 1.5] (encoder.py:89-99)."""
    return np.exp(
        np.linspace(np.log(_LOUDNESS_MIN), np.log(_LOUDNESS_MAX), n_bins - 1)
    ).astype(np.float32)


class ConditionEncoder(nn.Module):
    """content/melody/loudness/singer → cond [B, T, D].

    ``cfg`` is the mapper config subtree (config/config.json "mapper").
    Only encoders with nonzero input dim are materialised, matching the
    reference's registration rule (encoder.py:156-163).
    """

    cfg: Any

    def setup(self):
        cfg = self.cfg
        content_layers = {}
        for content_type in cfg.content_feature:
            if cfg.input_content_dim[content_type] != 0:
                content_layers[content_type] = nn.Dense(
                    cfg.encoder_content_dim, name=f"content_{content_type}"
                )
        self.content_layers = content_layers

        if cfg.input_melody_dim != 0:
            if cfg.n_bins_melody == 0:
                self.melody = nn.Dense(cfg.encoder_melody_dim, name="melody")
            else:
                self.melody = nn.Embed(
                    cfg.n_bins_melody, cfg.encoder_melody_dim, name="melody"
                )
                self.melody_boundaries = jnp.asarray(melody_bins(cfg.n_bins_melody))

        if cfg.input_loudness_dim != 0:
            if cfg.n_bins_loudness == 0:
                self.loudness = nn.Dense(cfg.encoder_loudness_dim, name="loudness")
            else:
                self.loudness = nn.Embed(
                    cfg.n_bins_loudness, cfg.encoder_loudness_dim, name="loudness"
                )
                self.loudness_boundaries = jnp.asarray(loudness_bins(cfg.n_bins_loudness))

        self.singer = nn.Embed(cfg.singer_table_size, cfg.encoder_singer_dim, name="singer")

    def __call__(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """batch keys: content_<type> [B,T,Din], melody [B,T], loudness [B,T],
        singer [B,1] int — mirrors the reference input dict (infer.py:68-74).
        """
        outputs = []
        for content_type, layer in self.content_layers.items():
            outputs.append(layer(batch[f"content_{content_type}"]))

        cfg = self.cfg
        if cfg.input_melody_dim != 0:
            f0 = batch["melody"]
            if cfg.n_bins_melody == 0:
                outputs.append(self.melody(f0[..., None]))
            else:
                idx = jnp.searchsorted(self.melody_boundaries, f0, side="left")
                outputs.append(self.melody(idx))

        if cfg.input_loudness_dim != 0:
            energy = batch["loudness"]
            if cfg.n_bins_loudness == 0:
                outputs.append(self.loudness(energy[..., None]))
            else:
                idx = jnp.searchsorted(self.loudness_boundaries, energy, side="left")
                outputs.append(self.loudness(idx))

        seq_len = outputs[0].shape[1]
        singer = self.singer(batch["singer"])  # [B, 1, D]
        outputs.append(jnp.broadcast_to(singer, (singer.shape[0], seq_len, singer.shape[-1])))

        if cfg.merge_mode == "concat":
            return jnp.concatenate(outputs, axis=-1)
        assert cfg.merge_mode == "add", cfg.merge_mode
        return sum(outputs)
