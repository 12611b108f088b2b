"""Hop-rate feature remapping: content-feature frames → mel frames.

Whisper/ContentVec emit 20 ms frames (hop 480 at 24 kHz); the acoustic
stack runs at hop 256. The reference maps between the grids by gcd-reducing
480/256 → 15/8, repeating ×15 and mean-pooling ×8
(/root/reference/utils/whisper.py:31-81, utils/hubert.py:83-134). Same exact
integer arithmetic here, as static-shape reshapes that XLA fuses away.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

WHISPER_MAX_SOURCE_LEN = 1500  # 30 s of 20 ms frames (utils/whisper.py:52)


def remap_features(
    raw_feats: np.ndarray,
    target_len: int,
    source_hop: int = 480,
    target_hop: int = 256,
    fast_mapping: bool = True,
    max_source_len: Optional[int] = WHISPER_MAX_SOURCE_LEN,
) -> np.ndarray:
    """[S, D] content frames → [target_len', D] mel-rate frames.

    Whisper-path contract (utils/whisper.py:31-81): target length is capped
    at ``max_source_len · source_hop / target_hop`` (2812 for the defaults);
    ``fast_mapping`` truncates the source to just the frames needed.
    """
    g = math.gcd(source_hop, target_hop)
    src, tgt = source_hop // g, target_hop // g  # 15, 8

    if max_source_len is not None:
        target_len = min(target_len, max_source_len * src // tgt)

    width = raw_feats.shape[-1]
    if fast_mapping:
        source_len = target_len * tgt // src + 1
        raw_feats = raw_feats[:source_len]
    else:
        source_len = raw_feats.shape[0]

    const = source_len * src // tgt * tgt
    up = np.repeat(raw_feats, src, axis=0)
    down = up[:const].reshape(-1, tgt, width).mean(axis=1)
    assert len(down) >= target_len, (len(down), target_len)
    return down[:target_len].astype(raw_feats.dtype)


def remap_features_tolerant(
    raw_feats: np.ndarray,
    target_len: int,
    source_hop: int = 480,
    target_hop: int = 256,
    tolerance: int = 3,
) -> np.ndarray:
    """ContentVec-path variant (utils/hubert.py:83-134): no source cap, a
    ±``tolerance``-frame length check, end-frame repetition when short."""
    g = math.gcd(source_hop, target_hop)
    src, tgt = source_hop // g, target_hop // g

    source_len, width = raw_feats.shape
    const = source_len * src // tgt * tgt
    up = np.repeat(raw_feats, src, axis=0)
    down = up[:const].reshape(-1, tgt, width).mean(axis=1)

    err = abs(target_len - len(down))
    if err > tolerance:
        raise ValueError(
            f"feature/mel length mismatch beyond tolerance: {len(down)} vs "
            f"{target_len} (source {source_len} frames)"
        )
    if len(down) < target_len:
        pad = np.repeat(down[-1:][:], target_len - len(down), axis=0)
        down = np.concatenate([down, pad], axis=0)
    return down[:target_len].astype(raw_feats.dtype)


def remap_features_device(raw_feats, target_len: int,
                          source_hop: int = 480, target_hop: int = 256):
    """jnp version of :func:`remap_features` (fast path) for use inside jit.

    ``target_len`` must already be capped by the caller; shapes are static.
    """
    import jax.numpy as jnp

    g = math.gcd(source_hop, target_hop)
    src, tgt = source_hop // g, target_hop // g
    width = raw_feats.shape[-1]
    source_len = target_len * tgt // src + 1
    raw = raw_feats[:source_len]
    const = source_len * src // tgt * tgt
    up = jnp.repeat(raw, src, axis=0)
    down = up[:const].reshape(-1, tgt, width).mean(axis=1)
    return down[:target_len]


def repeat_expand_2d(content: np.ndarray, target_len: int) -> np.ndarray:
    """Nearest-neighbour length expansion [D, S] → [D, target_len]
    (utils/hubert.py:62-80 semantics, vectorised)."""
    src_len = content.shape[-1]
    # frame i belongs to source position p where boundaries are
    # temp[k] = k * target_len / src_len
    pos = (np.arange(target_len, dtype=np.float64) * src_len) // target_len
    pos = np.minimum(pos.astype(np.int64), src_len - 1)
    return content[:, pos]
