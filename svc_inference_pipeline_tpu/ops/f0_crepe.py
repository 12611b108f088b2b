"""CREPE pitch tracking — native model + torchcrepe-contract decode chain.

The reference exposes a torchcrepe-backed F0 extractor
(/root/reference/utils/f0.py:214-264, dead on the live path): predict with
the "full" model at 16 kHz (viterbi decode + periodicity), median-filter
the periodicity (3), zero it below −60 dB A-weighted loudness, NaN the
pitch where periodicity < threshold, mean-filter (3), zeros for NaN, then
linear-interpolate the voiced samples onto the mel frame grid.

This module re-implements that contract natively:

* **Model** (:class:`CrepeModel`): the CREPE convnet (Kim et al. 2018) in
  Flax — 6 conv blocks (filters 32·[32,4,4,4,8,16] at capacity "full",
  kernels [512,64,…], first stride 4, each block conv→relu→batch-norm→
  maxpool-2 in torchcrepe's order) on 1024-sample frames → 360 sigmoid
  pitch-bin logits, bins at 20 cents from 1997.379 cents (≈31.7 Hz) re
  10 Hz.
* **Weights**: the CREPE checkpoint is a trained artifact torchcrepe
  downloads at install time; this environment has no egress, so
  :func:`load_crepe_params` converts a torchcrepe ``full.pth`` state dict
  when one is provided (path or ``SVC_CREPE_WEIGHTS`` env var) and the
  extractor raises a clear error otherwise. Every part around the net
  (framing, decode, filters, thresholds, resampling grid) is live-tested
  with random weights.
* **Decode**: Viterbi over the 360 bins (torchcrepe's transition: uniform
  self-biased triangular band), then the local weighted-average of cents
  in a ±4-bin window around the decoded bin; periodicity = posterior at
  the decoded bin per frame.
* **Filters/thresholds**: median(3) / mean(3) with edge shrink,
  A-weighted loudness silence gate at −60 dB.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

CENTS_PER_BIN = 20.0
N_BINS = 360
CENTS_OFFSET = 1997.3794084376191
FMIN_CENTS = CENTS_OFFSET
SAMPLE_RATE = 16000
WINDOW_SIZE = 1024


def bins_to_cents(bins):
    return CENTS_PER_BIN * np.asarray(bins, dtype=np.float64) + CENTS_OFFSET


def cents_to_freq(cents):
    return 10.0 * 2.0 ** (np.asarray(cents, dtype=np.float64) / 1200.0)


def freq_to_cents(freq):
    return 1200.0 * np.log2(np.asarray(freq, dtype=np.float64) / 10.0)


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------


def _capacity(model: str):
    mult = {"full": 32, "tiny": 4}[model]
    return [n * mult for n in (32, 4, 4, 4, 8, 16)]


class CrepeModel:
    """Functional CREPE forward (params pytree → pitch-bin probabilities).

    Layout mirrors torchcrepe's modules: conv{i} (+BN folded at convert
    time), classifier linear. Frames arrive mean/std-normalised."""

    def __init__(self, model: str = "full"):
        self.model = model
        self.filters = _capacity(model)
        self.kernels = [512, 64, 64, 64, 64, 64]
        self.strides = [4, 1, 1, 1, 1, 1]

    def init_params(self, rng: np.random.Generator):
        params = {}
        in_ch = 1
        for i, (f, k) in enumerate(zip(self.filters, self.kernels)):
            params[f"conv{i}"] = {
                "kernel": np.asarray(
                    rng.standard_normal((k, in_ch, f)) * (1.0 / np.sqrt(k * in_ch)),
                    np.float32,
                ),
                "bias": np.zeros((f,), np.float32),
                "scale": np.ones((f,), np.float32),  # identity BN
                "shift": np.zeros((f,), np.float32),
            }
            in_ch = f
        flat = self.filters[-1] * 4  # 1024 /4 /2^6 = 4 time positions
        params["classifier"] = {
            "kernel": np.asarray(
                rng.standard_normal((flat, N_BINS)) / np.sqrt(flat), np.float32
            ),
            "bias": np.zeros((N_BINS,), np.float32),
        }
        return params

    def apply(self, params, frames):
        """frames [B, 1024] (normalised) → probabilities [B, 360]."""
        import jax
        import jax.numpy as jnp

        x = jnp.asarray(frames)[:, :, None]  # NWC
        for i, (k, s) in enumerate(zip(self.kernels, self.strides)):
            p = params[f"conv{i}"]
            # torchcrepe's exact padding: first layer (254, 254), the rest
            # (31, 32) — its layer() F.pads before every conv
            pad = (254, 254) if i == 0 else (k // 2 - 1, k // 2)
            x = jax.lax.conv_general_dilated(
                x, jnp.asarray(p["kernel"]), (s,), [pad],
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + jnp.asarray(p["bias"])
            x = jax.nn.relu(x)
            # torchcrepe applies BatchNorm AFTER the relu (conv→relu→BN→
            # maxpool), so BN cannot be folded into the conv — it is kept
            # as an inference-time per-channel affine here (scale/shift),
            # applied before the pool exactly where torchcrepe applies it
            x = x * jnp.asarray(p["scale"]) + jnp.asarray(p["shift"])
            # maxpool 2
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 1), (1, 2, 1), "VALID"
            )
        x = x.reshape(x.shape[0], -1)
        c = params["classifier"]
        logits = x @ jnp.asarray(c["kernel"]) + jnp.asarray(c["bias"])
        return jax.nn.sigmoid(logits)


def load_crepe_params(path: str, model: str = "full"):
    """Convert a torchcrepe ``full.pth``/``tiny.pth`` state dict.

    torchcrepe's layer order is conv→relu→BatchNorm→maxpool, so BN cannot
    be folded into the conv (the relu sits in between); it becomes an
    inference-time per-channel affine (scale = γ/√(σ²+ε), shift = β−μ·scale)
    applied after the relu. Conv kernels transpose from torch [out, in, k]
    (or 2-D [out, in, k, 1]) to WIO, the classifier to [in, out]; torch's
    conv on NCW matches our NWC path exactly. Oracle-tested against a
    torch re-implementation of torchcrepe's forward on synthetic
    checkpoints (tests/test_f0_crepe.py)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params = {}
    for i in range(6):
        w = sd[f"conv{i + 1}.weight"].numpy()  # [out, 1|in, k(, 1)]
        b = sd[f"conv{i + 1}.bias"].numpy()
        gamma = sd[f"conv{i + 1}_BN.weight"].numpy()
        beta = sd[f"conv{i + 1}_BN.bias"].numpy()
        mean = sd[f"conv{i + 1}_BN.running_mean"].numpy()
        var = sd[f"conv{i + 1}_BN.running_var"].numpy()
        scale = gamma / np.sqrt(var + 1e-5)
        shift = beta - mean * scale
        # torchcrepe convs are 2d [out, in, k, 1] in some releases
        if w.ndim == 4:
            w = w[..., 0]
        params[f"conv{i}"] = {
            "kernel": np.ascontiguousarray(w.transpose(2, 1, 0)).astype(np.float32),
            "bias": b.astype(np.float32),
            "scale": scale.astype(np.float32),
            "shift": shift.astype(np.float32),
        }
    cw = sd["classifier.weight"].numpy()  # [360, flat]
    cb = sd["classifier.bias"].numpy()
    params["classifier"] = {
        "kernel": np.ascontiguousarray(cw.T).astype(np.float32),
        "bias": cb.astype(np.float32),
    }
    return params


# ---------------------------------------------------------------------------
# preprocessing / decode / filters (torchcrepe contract)
# ---------------------------------------------------------------------------


def frame_audio(audio16k: np.ndarray, hop_length: int) -> np.ndarray:
    """Centred 1024-sample frames every ``hop_length`` (pad=True), each
    mean-removed and std-normalised (torchcrepe.core.preprocess)."""
    x = np.asarray(audio16k, dtype=np.float32)
    n_frames = 1 + len(x) // hop_length
    xp = np.pad(x, (WINDOW_SIZE // 2, WINDOW_SIZE // 2))
    idx = np.arange(WINDOW_SIZE)[None, :] + hop_length * np.arange(n_frames)[:, None]
    idx = np.minimum(idx, len(xp) - 1)
    frames = xp[idx]
    frames = frames - frames.mean(axis=1, keepdims=True)
    # ddof=1: torch.std is the sample std — 0.05% off the population std
    # at n=1024, but exactness is free
    std = frames.std(axis=1, keepdims=True, ddof=1)
    return frames / np.maximum(std, 1e-10)


def viterbi_decode(probs: np.ndarray, f0_min: float = 50.0, f0_max: float = 2006.0
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """torchcrepe-style Viterbi over the 360 bins → (f0 Hz, periodicity).

    Transition: triangular band of width 12 bins; observation: the net's
    per-bin probabilities normalised per frame; restricted to bins within
    [f0_min, f0_max]. The decoded bin is refined by the local weighted
    average of cents in a ±4-bin window (torchcrepe.decode.weighted_argmax
    applied at the viterbi path); periodicity is the posterior probability
    at the decoded bin."""
    probs = np.asarray(probs, dtype=np.float64)
    n_frames = len(probs)

    cents = bins_to_cents(np.arange(N_BINS))
    freqs = cents_to_freq(cents)
    allowed = (freqs >= f0_min) & (freqs <= f0_max)

    obs = probs / np.maximum(probs.sum(axis=1, keepdims=True), 1e-12)
    with np.errstate(divide="ignore"):
        lobs = np.log(np.maximum(obs, 1e-12))
    lobs[:, ~allowed] = -1e30

    width = 12
    offs = np.arange(-width, width + 1)
    tri = (width + 1 - np.abs(offs)).astype(np.float64)
    tri /= tri.sum()
    ltri = np.log(tri)

    delta = np.full(N_BINS, -np.log(N_BINS)) + lobs[0]
    ptr = np.zeros((n_frames, N_BINS), dtype=np.int32)
    for t in range(1, n_frames):
        best = np.full(N_BINS, -1e30)
        arg = np.zeros(N_BINS, dtype=np.int32)
        for off, lt in zip(offs, ltri):
            lo, hi = max(0, -off), N_BINS - max(0, off)
            if lo >= hi:
                continue
            cand = delta[lo + off : hi + off] + lt
            seg = slice(lo, hi)
            upd = cand > best[seg]
            best[seg] = np.where(upd, cand, best[seg])
            arg[seg] = np.where(upd, np.arange(lo + off, hi + off), arg[seg])
        delta = best + lobs[t]
        ptr[t] = arg

    path = np.zeros(n_frames, dtype=np.int64)
    path[-1] = int(delta.argmax())
    for t in range(n_frames - 2, -1, -1):
        path[t] = ptr[t + 1, path[t + 1]]

    # local weighted average of cents around the decoded bin
    f0 = np.zeros(n_frames)
    pd = np.zeros(n_frames)
    for t in range(n_frames):
        b = path[t]
        lo, hi = max(0, b - 4), min(N_BINS, b + 5)
        w = probs[t, lo:hi]
        c = (w * cents[lo:hi]).sum() / np.maximum(w.sum(), 1e-12)
        f0[t] = float(cents_to_freq(c))
        pd[t] = probs[t, b]
    return f0, pd


def median_filter(x: np.ndarray, win: int = 3) -> np.ndarray:
    """torchcrepe.filter.median: reflect-free windowed median (shrinking
    windows at the edges)."""
    h = win // 2
    out = np.empty_like(x, dtype=np.float64)
    for i in range(len(x)):
        out[i] = np.median(x[max(0, i - h) : i + h + 1])
    return out


def mean_filter(x: np.ndarray, win: int = 3) -> np.ndarray:
    h = win // 2
    out = np.empty_like(x, dtype=np.float64)
    for i in range(len(x)):
        out[i] = np.mean(x[max(0, i - h) : i + h + 1])
    return out


def a_weighted_loudness(audio16k: np.ndarray, hop_length: int) -> np.ndarray:
    """Per-frame A-weighted loudness in dB (torchcrepe.loudness contract:
    1024-point STFT on the same centred frame grid, A-weight, average)."""
    x = np.asarray(audio16k, dtype=np.float64)
    n_frames = 1 + len(x) // hop_length
    xp = np.pad(x, (WINDOW_SIZE // 2, WINDOW_SIZE // 2))
    idx = np.arange(WINDOW_SIZE)[None, :] + hop_length * np.arange(n_frames)[:, None]
    idx = np.minimum(idx, len(xp) - 1)
    raw = xp[idx] * np.hanning(WINDOW_SIZE)

    spec = np.abs(np.fft.rfft(raw, axis=1))
    freqs = np.fft.rfftfreq(WINDOW_SIZE, 1.0 / SAMPLE_RATE)
    fsq = np.square(np.maximum(freqs, 1e-6))
    ra = (
        12194.0**2 * np.square(fsq)
        / ((fsq + 20.6**2) * np.sqrt((fsq + 107.7**2) * (fsq + 737.9**2)) * (fsq + 12194.0**2))
    )
    a_db = 2.0 + 20.0 * np.log10(np.maximum(ra, 1e-30))
    db = 20.0 * np.log10(np.maximum(spec, 1e-10)) + a_db[None, :]
    ref = 20.0 * np.log10(WINDOW_SIZE / 2)  # full-scale sine reference
    # per-frame peak weighted bin: a frame is "loud" if ANY band is — a
    # mean over bins would let one strong partial drown in the −100 dB
    # floor of the other 500 bins and gate voiced frames as silence
    return np.clip(db - ref, -100.0, None).max(axis=1)


# ---------------------------------------------------------------------------
# the reference-contract extractor
# ---------------------------------------------------------------------------

_PARAM_CACHE = {}


def crepe_predict(
    audio16k: np.ndarray,
    hop_length: int,
    f0_min: float,
    f0_max: float,
    model: str = "full",
    params=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(f0, periodicity) on the 16 kHz hop grid."""
    if params is None:
        path = os.environ.get("SVC_CREPE_WEIGHTS", "")
        if not path or not os.path.exists(path):
            raise NotImplementedError(
                "CREPE weights unavailable: torchcrepe's trained checkpoint "
                "is a downloaded artifact and this environment has no "
                "network egress. Provide a torchcrepe full.pth via "
                "SVC_CREPE_WEIGHTS or the params argument; the model, "
                "converter, decoder, filters and thresholds are implemented "
                "and unit-tested (reference utils/f0.py:214-264)."
            )
        key = (path, model)
        if key not in _PARAM_CACHE:
            _PARAM_CACHE[key] = load_crepe_params(path, model)
        params = _PARAM_CACHE[key]

    net = CrepeModel(model)
    frames = frame_audio(audio16k, hop_length)
    probs = np.asarray(net.apply(params, frames))
    return viterbi_decode(probs, f0_min, f0_max)


def get_f0_features_using_crepe(
    audio: np.ndarray,
    mel_len: int,
    fs: int,
    hop_length: int,
    hop_length_new: int,
    f0_min: float,
    f0_max: float,
    threshold: float = 0.3,
    model: str = "full",
    params=None,
) -> np.ndarray:
    """The reference chain (utils/f0.py:214-264), natively."""
    from svc_inference_pipeline_tpu.ops.resample import resample_host

    audio = np.asarray(audio, dtype=np.float32)
    audio16k = resample_host(audio, fs, SAMPLE_RATE) if fs != SAMPLE_RATE else audio

    f0, pd = crepe_predict(audio16k, hop_length_new, f0_min, f0_max, model, params)

    pd = median_filter(pd, 3)
    loud = a_weighted_loudness(audio16k, hop_length_new)
    n = min(len(pd), len(loud))
    pd, f0 = pd[:n], np.asarray(f0[:n], dtype=np.float64)
    pd[loud[:n] < -60.0] = 0.0
    f0[pd < threshold] = np.nan
    f0 = mean_filter(f0, 3)
    f0 = np.nan_to_num(f0, nan=0.0)

    nz = np.nonzero(f0)[0]
    if len(nz) == 0:
        return np.zeros(mel_len)
    time_org = hop_length_new / SAMPLE_RATE * nz
    time_frame = np.arange(mel_len) * hop_length / fs
    return np.interp(time_frame, time_org, f0[nz], left=f0[nz][0], right=f0[nz][-1])
