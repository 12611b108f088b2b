"""F0 estimation: a TPU-native implementation of Praat's autocorrelation
pitch tracker (Boersma 1993), plus the coarse mel-scale quantiser.

The reference calls parselmouth (a C++ Praat wrapper) with
``to_pitch_ac(time_step=hop/fs, voicing_threshold=0.6, pitch_floor=cfg.f0_min,
pitch_ceiling=cfg.f0_max)`` (/root/reference/utils/f0.py:120-161). Here the
same algorithm is expressed as pure JAX:

* framing + Hanning window + FFT autocorrelation → one batched rfft,
* normalisation by the analytic Hanning-window autocorrelation
  (Boersma eq. 18),
* per-frame candidate extraction (local maxima, parabolic refinement,
  octave cost) with static top-K shapes,
* Viterbi path search over (unvoiced + K voiced) states as a
  ``lax.scan`` forward pass + reversed ``lax.scan`` backtrace.

Everything is a single jit region with static shapes — no host loop over
frames, no Python-side candidate lists.

The reference's alternate extractors (pyin, pyworld DIO/harvest,
torchcrepe — utils/f0.py:95-117,164-264) are dead on its live path; the
``method`` parameter of :func:`get_f0_features` keeps the API surface and
raises a clear error for backends that need unavailable native deps.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["praat_pitch_ac", "get_f0_features", "f0_to_coarse", "interpolate_unvoiced"]

# Praat defaults for Sound: To Pitch (ac), besides the explicitly passed ones.
_SILENCE_THRESHOLD = 0.03
_OCTAVE_COST = 0.01
_OCTAVE_JUMP_COST = 0.35
_VOICED_UNVOICED_COST = 0.14
_MAX_CANDIDATES = 15
_PERIODS_PER_WINDOW = 3.0
_INTERPOLATION_DEPTH = 0.5  # AC-Hanning: usable lags up to half the window


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def _hann_window_praat(n: int) -> np.ndarray:
    # Praat's Hanning: w[i] = 0.5 - 0.5 cos(2 pi i / (n+1)), i = 1..n
    i = np.arange(1, n + 1, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * i / (n + 1))).astype(np.float32)


def _hann_autocorr(n_window: int, max_lag: int) -> np.ndarray:
    """Analytic normalised autocorrelation of the Hanning window.

    Boersma (1993) eq. 18: r_w(x) = (1-x)(2/3 + 1/3 cos 2πx) + sin(2πx)/2π,
    with x = lag / window_length.
    """
    x = np.arange(max_lag + 1, dtype=np.float64) / n_window
    r = (1.0 - x) * (2.0 / 3.0 + 1.0 / 3.0 * np.cos(2 * np.pi * x)) + np.sin(
        2 * np.pi * x
    ) / (2 * np.pi)
    return r.astype(np.float32)


@partial(
    jax.jit,
    static_argnames=(
        "fs",
        "hop_length",
        "f0_min",
        "f0_max",
        "voicing_threshold",
        "silence_threshold",
        "octave_cost",
        "octave_jump_cost",
        "voiced_unvoiced_cost",
        "max_candidates",
    ),
)
def praat_pitch_ac(
    audio: jnp.ndarray,
    fs: int,
    hop_length: int,
    f0_min: float,
    f0_max: float,
    voicing_threshold: float = 0.45,
    silence_threshold: float = _SILENCE_THRESHOLD,
    octave_cost: float = _OCTAVE_COST,
    octave_jump_cost: float = _OCTAVE_JUMP_COST,
    voiced_unvoiced_cost: float = _VOICED_UNVOICED_COST,
    max_candidates: int = _MAX_CANDIDATES,
) -> jnp.ndarray:
    """F0 track of a mono waveform; 0 marks unvoiced frames.

    Frame times follow Praat's centred convention:
    ``n_frames = floor((dur - window_dur)/dt) + 1`` with the frame grid
    centred in the signal.
    """
    n = int(audio.shape[-1])
    dt = hop_length / fs
    window_dur = _PERIODS_PER_WINDOW / f0_min
    nsamp_window = 2 * (int(math.floor(window_dur * fs)) // 2)
    half_window = nsamp_window // 2
    nsamp_period = int(math.floor(fs / f0_min))
    half_period = nsamp_period // 2

    duration = n / fs
    n_frames = max(int(math.floor((duration - window_dur) / dt)) + 1, 1)
    mid = 0.5 * duration
    t1 = mid - 0.5 * (n_frames - 1) * dt  # centre of first frame (seconds)

    max_lag = int(nsamp_window * _INTERPOLATION_DEPTH)
    lag_min = max(int(math.ceil(fs / f0_max)), 2)
    nfft = _next_pow2(int(nsamp_window * (1.0 + _INTERPOLATION_DEPTH)))

    x = audio.astype(jnp.float32)
    global_peak = jnp.max(jnp.abs(x - jnp.mean(x))) + 1e-30

    # --- framing (static gather) ------------------------------------------
    centers = np.round((t1 + np.arange(n_frames) * dt) * fs).astype(np.int64)
    frame_start = centers - half_window
    pad = nsamp_window  # generous guard for clamped starts
    xp = jnp.pad(x, (pad, pad))
    idx = frame_start[:, None] + np.arange(nsamp_window)[None, :] + pad
    frames = xp[jnp.asarray(idx.astype(np.int32))]  # [F, W]

    # local mean over one max-period each side of the frame centre
    mean_idx = (centers[:, None] - nsamp_period) + np.arange(2 * nsamp_period)[None, :] + pad
    local_mean = jnp.mean(xp[jnp.asarray(mean_idx.astype(np.int32))], axis=-1, keepdims=True)

    window = jnp.asarray(_hann_window_praat(nsamp_window))
    fw = (frames - local_mean) * window[None, :]  # [F, W]

    # local peak over half a max-period each side of the frame centre
    lo = max(half_window - half_period, 0)
    hi = min(half_window + half_period, nsamp_window)
    local_peak = jnp.max(jnp.abs(fw[:, lo:hi]), axis=-1)
    intensity = jnp.minimum(local_peak / global_peak, 1.0)

    # --- normalised autocorrelation via FFT --------------------------------
    spec = jnp.fft.rfft(fw, n=nfft, axis=-1)
    ac = jnp.fft.irfft(spec * jnp.conj(spec), n=nfft, axis=-1)[:, : max_lag + 1]
    r = ac / (ac[:, :1] + 1e-30)  # r[0] = 1
    r = r / jnp.asarray(_hann_autocorr(nsamp_window, max_lag))[None, :]

    # --- candidate maxima with parabolic refinement ------------------------
    rm1, r0, rp1 = r[:, :-2], r[:, 1:-1], r[:, 2:]  # lags 1..max_lag-1
    lags = np.arange(1, max_lag, dtype=np.float32)
    is_peak = (r0 > rm1) & (r0 >= rp1) & (lags >= lag_min)[None, :]

    denom = rm1 - 2.0 * r0 + rp1
    shift = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (rm1 - rp1) / denom, 0.0)
    shift = jnp.clip(shift, -0.5, 0.5)
    lag_star = lags[None, :] + shift
    r_star = r0 - 0.25 * (rm1 - rp1) * shift
    # fold improbably strong maxima back (Praat: R > 1 → 1/R)
    r_star = jnp.where(r_star > 1.0, 1.0 / r_star, r_star)

    freq = fs / lag_star
    valid = is_peak & (freq <= f0_max) & (freq > 0)

    # ranking strength favours higher frequencies (Boersma eq. 23)
    rank = r_star - octave_cost * jnp.log2(f0_min * lag_star / fs)
    rank = jnp.where(valid, rank, -jnp.inf)
    top_rank, top_idx = jax.lax.top_k(rank, max_candidates - 1)  # [F, K-1]

    cand_freq = jnp.take_along_axis(freq, top_idx, axis=-1)
    cand_r = jnp.take_along_axis(r_star, top_idx, axis=-1)
    cand_valid = jnp.isfinite(top_rank)
    cand_freq = jnp.where(cand_valid, cand_freq, 0.0)

    # --- Viterbi over (unvoiced + K-1 voiced) states ------------------------
    # local scores (Praat Pitch_pathFinder)
    unvoiced_strength = voicing_threshold + jnp.maximum(
        0.0, 2.0 - intensity * (1.0 + voicing_threshold) / silence_threshold
    )  # [F]
    voiced_strength = jnp.where(
        cand_valid,
        cand_r - octave_cost * jnp.log2(f0_max / jnp.maximum(cand_freq, 1e-6)),
        -jnp.inf,
    )  # [F, K-1]
    local = jnp.concatenate([unvoiced_strength[:, None], voiced_strength], axis=-1)  # [F, K]
    freqs_all = jnp.concatenate([jnp.zeros_like(cand_freq[:, :1]), cand_freq], axis=-1)

    time_step_correction = 0.01 / dt  # Praat: costs are per 10 ms
    ojc = octave_jump_cost * time_step_correction
    vuc = voiced_unvoiced_cost * time_step_correction

    def transition_cost(f_prev, f_cur):
        # [K_prev, K_cur]
        pv = f_prev[:, None] > 0
        cv = f_cur[None, :] > 0
        both = pv & cv
        jump = ojc * jnp.abs(
            jnp.log2(jnp.maximum(f_prev[:, None], 1e-6) / jnp.maximum(f_cur[None, :], 1e-6))
        )
        return jnp.where(both, jump, jnp.where(pv == cv, 0.0, vuc))

    def viterbi_step(carry, inp):
        score_prev, f_prev = carry
        local_t, f_cur = inp
        total = score_prev[:, None] - transition_cost(f_prev, f_cur) + local_t[None, :]
        best_prev = jnp.argmax(total, axis=0)
        best_score = jnp.max(total, axis=0)
        return (best_score, f_cur), best_prev

    init = (local[0], freqs_all[0])
    (final_scores, _), backptr = jax.lax.scan(viterbi_step, init, (local[1:], freqs_all[1:]))

    last_state = jnp.argmax(final_scores)

    def backtrace_step(state, ptr_t):
        prev = ptr_t[state]
        return prev, prev

    # backptr[t] maps the state at frame t+1 to the best state at frame t;
    # walking it in reverse emits the chosen state of frames F-2 .. 0.
    _, states_prefix = jax.lax.scan(backtrace_step, last_state, backptr, reverse=True)
    states = jnp.concatenate([states_prefix, last_state[None]])  # [F]

    f0 = jnp.take_along_axis(freqs_all, states[:, None], axis=-1)[:, 0]
    return f0


def get_f0_features(
    audio: np.ndarray,
    mel_len: int,
    cfg,
    speed: int = 1,
    method: str = "parselmouth",
) -> Tuple[np.ndarray, np.ndarray]:
    """(f0 [mel_len], coarse pitch [mel_len]) — reference API
    (utils/f0.py:120-161) with the same voicing threshold (0.6) and the same
    centred padding to the mel frame grid.
    """
    if method not in ("parselmouth", "ac", "dio", "pyin", "harvest"):
        raise NotImplementedError(
            f"F0 method {method!r}: 'parselmouth' (Praat ac), 'dio', "
            "'pyin' and 'harvest' are implemented natively; 'crepe' needs "
            "its trained checkpoint (see ops/f0_crepe.py) and is called "
            "via get_f0_features_using_crepe."
        )
    if mel_len < 1 or len(np.asarray(audio)) < 1:
        # degenerate clip (shorter than one hop): fail with a clear message
        # instead of a zero-size reduction deep inside f0_to_coarse
        raise ValueError(
            f"clip too short for F0 extraction: {len(np.asarray(audio))} "
            f"samples -> {mel_len} mel frames (need at least one hop of "
            f"{getattr(cfg, 'hop_length', '?')} samples)"
        )
    hop_size = int(np.round(cfg.hop_length * speed))
    if method == "harvest":
        f0 = get_f0_features_using_harvest(
            np.asarray(audio), mel_len, cfg.fs, hop_size,
            float(cfg.f0_min), float(cfg.f0_max),
        )
        f0 = np.pad(f0, (0, max(0, mel_len - len(f0))))
        coarse = f0_to_coarse(f0, cfg.pitch_bin, cfg.pitch_min, cfg.pitch_max)
        return f0, coarse
    if method == "dio":
        f0 = get_f0_features_using_dio(
            np.asarray(audio), mel_len, cfg.fs, hop_size,
            float(cfg.f0_min), float(cfg.f0_max),
        )
        f0 = np.pad(f0, (0, max(0, mel_len - len(f0))))
        coarse = f0_to_coarse(f0, cfg.pitch_bin, cfg.pitch_min, cfg.pitch_max)
        return f0, coarse
    if method == "pyin":
        f0 = get_f0_features_using_pyin(
            np.asarray(audio), cfg.fs, cfg.win_length, hop_size,
            float(cfg.f0_min), float(cfg.f0_max),
        )
        f0 = np.pad(f0, (0, max(0, mel_len - len(f0))))[:mel_len]
        coarse = f0_to_coarse(f0, cfg.pitch_bin, cfg.pitch_min, cfg.pitch_max)
        return f0, coarse
    # The tracker's Viterbi is a long serial scan over tiny [K,K] matrices —
    # latency-bound on a TPU (~0.8 s for 10 s audio) and trivial on the host
    # CPU (~50 ms). Pitch extraction is front-end work; pin it to the host.
    from svc_inference_pipeline_tpu.utils.devices import host_cpu

    with jax.default_device(host_cpu()):
        f0 = np.asarray(
            praat_pitch_ac(
                jnp.asarray(audio),
                fs=cfg.fs,
                hop_length=hop_size,
                f0_min=float(cfg.f0_min),
                f0_max=float(cfg.f0_max),
                voicing_threshold=0.6,
            )
        )

    # Pad to the mel frame grid with a centred offset (utils/f0.py:156-157).
    pad_size = (int(len(audio) // hop_size) - len(f0) + 1) // 2
    total = mel_len - len(f0) - pad_size
    if total < 0:
        f0 = f0[: mel_len - pad_size]
        total = 0
    f0 = np.pad(f0, [[pad_size, total]], mode="constant")

    coarse = f0_to_coarse(f0, cfg.pitch_bin, cfg.pitch_min, cfg.pitch_max)
    return f0, coarse


def f0_to_coarse(f0: np.ndarray, pitch_bin: int, pitch_min: float, pitch_max: float) -> np.ndarray:
    """Mel-scale quantisation of F0 to [1, pitch_bin-1]; 0 Hz stays in bin 1.

    Reference: utils/f0.py:46-65 (same mel-scale constants and clamping).
    """
    f0_mel_min = 1127.0 * np.log(1.0 + pitch_min / 700.0)
    f0_mel_max = 1127.0 * np.log(1.0 + pitch_max / 700.0)
    f0_mel = 1127.0 * np.log(1.0 + np.asarray(f0, dtype=np.float64) / 700.0)
    voiced = f0_mel > 0
    f0_mel = np.where(
        voiced,
        (f0_mel - f0_mel_min) * (pitch_bin - 2) / (f0_mel_max - f0_mel_min) + 1.0,
        f0_mel,
    )
    f0_mel = np.clip(f0_mel, 1.0, pitch_bin - 1)
    coarse = np.rint(f0_mel).astype(np.int64)
    assert coarse.max() <= pitch_bin - 1 and coarse.min() >= 1, (coarse.max(), coarse.min())
    return coarse


def get_log_f0(f0: np.ndarray) -> np.ndarray:
    """log-F0 with unvoiced frames mapped to log(1)=0 (utils/f0.py:86-89)."""
    f0 = np.array(f0, dtype=np.float64)
    f0[f0 == 0] = 1.0
    return np.log(f0)


def _unavailable(name: str, dep: str):
    raise NotImplementedError(
        f"F0 backend {name!r} requires {dep}, which is not available in this "
        "environment. These extractors are dead code on the reference's live "
        "path (utils/f0.py:95-117,164-264); the Praat-AC contract is "
        "implemented natively as praat_pitch_ac/get_f0_features."
    )


def get_f0_features_using_pyin(audio, fs, win_length, hop_length, f0_min, f0_max):
    """pYIN backend — the reference's librosa.pyin call
    (utils/f0.py:95-117) re-derived natively (ops/f0_pyin.py): same
    parameter surface, unvoiced frames (nan in librosa) returned as 0."""
    from svc_inference_pipeline_tpu.ops.f0_pyin import pyin

    f0, voiced, _ = pyin(
        np.asarray(audio, dtype=np.float64),
        fs=fs,
        fmin=float(f0_min),
        fmax=float(f0_max),
        win_length=int(win_length),
        hop_length=int(hop_length),
    )
    f0 = f0.astype(np.float64)
    f0[~voiced] = 0.0
    return f0


def get_f0_features_using_dio(audio, mel_len, fs, hop_length, f0_min, f0_max):
    """DIO+StoneMask backend — the reference's pyworld call
    (utils/f0.py:164-188) re-derived natively (ops/f0_dio.py):
    channels_in_octave=2, frame_period=1000·hop/fs, truncated to mel_len."""
    from svc_inference_pipeline_tpu.ops.f0_dio import dio, stonemask

    x = np.asarray(audio, dtype=np.float64)
    _f0, t = dio(
        x, fs,
        f0_floor=float(f0_min), f0_ceil=float(f0_max),
        channels_in_octave=2.0,
        frame_period=1000.0 * hop_length / fs,
    )
    f0 = stonemask(x, _f0, t, fs)
    return f0.astype(np.float64)[:mel_len]


def get_f0_features_using_harvest(audio, mel_len, fs, hop_length, f0_min, f0_max):
    """Harvest backend — the reference's pyworld call (utils/f0.py:191-211)
    re-derived natively (ops/f0_harvest.py): frame_period = 1000·hop/fs,
    truncated to mel_len."""
    from svc_inference_pipeline_tpu.ops.f0_harvest import harvest

    f0, _t = harvest(
        np.asarray(audio, dtype=np.float64), fs,
        f0_floor=float(f0_min), f0_ceil=float(f0_max),
        frame_period=1000.0 * hop_length / fs,
    )
    return f0.astype(np.float64)[:mel_len]


def get_f0_features_using_crepe(audio, mel_len, fs, hop_length, hop_length_new,
                                f0_min, f0_max, threshold=0.3, **kw):
    """CREPE backend — the reference's torchcrepe chain (utils/f0.py:
    214-264) natively (ops/f0_crepe.py): CREPE convnet in Flax + viterbi
    decode, periodicity median filter, −60 dB silence gate, threshold,
    mean filter, voiced-sample interpolation onto the mel grid. The
    trained checkpoint is a downloaded artifact (absent here, no egress):
    provide torchcrepe's full.pth via ``SVC_CREPE_WEIGHTS`` or
    ``params=``."""
    from svc_inference_pipeline_tpu.ops.f0_crepe import (
        get_f0_features_using_crepe as _impl,
    )

    return _impl(audio, mel_len, fs, hop_length, hop_length_new,
                 f0_min, f0_max, threshold, **kw)


def get_f0_features_using_parselmouth(audio, mel_len, cfg, speed=1):
    """Reference-named alias for the live path (utils/f0.py:120-161)."""
    return get_f0_features(np.asarray(audio), mel_len, cfg, speed=speed)


def interpolate_unvoiced(f0: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Linearly interpolate across unvoiced gaps; returns (f0, uv mask).

    Mirrors utils/f0.py:68-83 (including the 3-tap min erosion of the mask).
    """
    f0 = np.array(f0, dtype=np.float64)
    uv = f0 == 0
    if (~uv).any():
        f0[uv] = np.interp(np.where(uv)[0], np.where(~uv)[0], f0[~uv])
        uvf = uv.astype(np.float64)
        uvf = np.min(np.array([uvf[:-2], uvf[1:-1], uvf[2:]]), axis=0)
        uvf = np.pad(uvf, (1, 1))
        return f0, uvf
    return f0, uv.astype(np.float64)
