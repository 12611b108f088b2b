"""Quality metrics: mel MAE, F0 RMSE, waveform SNR — and the golden run.

The validation contract from BASELINE.md: compare converted audio against
the reference pipeline's committed output (gen/1100000814_svcc_CDF1.wav) on
spectral, pitch, and waveform axes.

    # score two existing waveforms
    python -m svc_inference_pipeline_tpu.eval ref.wav test.wav

    # the READY-TO-RUN real-checkpoint validation: load the trained
    # mapper/vocoder/whisper checkpoints (reference on-disk formats —
    # utils/load_models.py:30,60 ``state_dict``/``generator_state_dict``,
    # whisper ``dims``+``model_state_dict``), convert the reference's test
    # clip, and score it against the committed golden output
    python -m svc_inference_pipeline_tpu.eval --golden \
        --mapper ckpts/mapper.pt --vocoder ckpts/vocoder.pt \
        [--whisper medium|/path/medium.pt]  # registry name fetches under
                                            # SVC_ALLOW_DOWNLOAD=1
"""

from __future__ import annotations

import json
import os
import sys
from typing import Dict

import numpy as np


def _align(a: np.ndarray, b: np.ndarray):
    n = min(len(a), len(b))
    return a[:n], b[:n]


def mel_mae(wav_a: np.ndarray, wav_b: np.ndarray, cfg) -> float:
    """Mean absolute log-mel difference (the BASELINE '<1e-3' axis when the
    inputs are the same pipeline's tensors; for audio comparisons expect
    magnitudes in the 0.1-1 range)."""
    import jax.numpy as jnp

    from svc_inference_pipeline_tpu.ops.mel import extract_mel_features

    a, b = _align(np.asarray(wav_a), np.asarray(wav_b))
    ma, _ = extract_mel_features(jnp.asarray(a), cfg)
    mb, _ = extract_mel_features(jnp.asarray(b), cfg)
    return float(np.abs(np.asarray(ma) - np.asarray(mb)).mean())


def f0_rmse_cents(wav_a: np.ndarray, wav_b: np.ndarray, cfg) -> Dict[str, float]:
    """F0 RMSE in cents over frames voiced in both, plus voicing agreement."""
    from svc_inference_pipeline_tpu.ops.f0 import get_f0_features

    a, b = _align(np.asarray(wav_a), np.asarray(wav_b))
    n_frames = len(a) // cfg.hop_length
    fa, _ = get_f0_features(a, n_frames, cfg)
    fb, _ = get_f0_features(b, n_frames, cfg)
    both = (fa > 0) & (fb > 0)
    if both.sum() == 0:
        return {"f0_rmse_cents": float("nan"), "voicing_agreement": 0.0}
    cents = 1200.0 * np.log2(fa[both] / fb[both])
    return {
        "f0_rmse_cents": float(np.sqrt(np.mean(cents**2))),
        "voicing_agreement": float(((fa > 0) == (fb > 0)).mean()),
    }


def mcd_from_mels(ma: np.ndarray, mb: np.ndarray, n_coeffs: int = 13) -> float:
    """MCD (dB) from two ln-mel spectrograms shaped [n_mels, T]."""
    from scipy.fftpack import dct

    # per-FRAME DCT-II over the MEL axis → cepstra; c₀ (frame energy)
    # excluded. Features are [n_mels, T] (time last) — transpose first.
    ca = dct(np.asarray(ma).T, type=2, axis=-1, norm="ortho")[:, 1 : n_coeffs + 1]
    cb = dct(np.asarray(mb).T, type=2, axis=-1, norm="ortho")[:, 1 : n_coeffs + 1]
    n = min(len(ca), len(cb))  # frame alignment
    dist = np.sqrt(np.sum((ca[:n] - cb[:n]) ** 2, axis=-1))
    return float((10.0 / np.log(10.0)) * np.sqrt(2.0) * dist.mean())


def mcd_db(wav_a: np.ndarray, wav_b: np.ndarray, cfg, n_coeffs: int = 13) -> float:
    """Mel-cepstral distortion (dB) — the standard SVC-challenge spectral
    metric: per-frame DCT-II of the log-mel → cepstra c₁..c_K,
        MCD = (10/ln10)·√2 · mean‖c_a − c_b‖₂.
    """
    import jax.numpy as jnp

    from svc_inference_pipeline_tpu.ops.mel import extract_mel_features

    a, b = _align(np.asarray(wav_a), np.asarray(wav_b))
    ma, _ = extract_mel_features(jnp.asarray(a), cfg)
    mb, _ = extract_mel_features(jnp.asarray(b), cfg)
    return mcd_from_mels(np.asarray(ma), np.asarray(mb), n_coeffs)


def waveform_snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """SNR of ``test`` against ``ref`` (dB), sample-aligned."""
    a, b = _align(np.asarray(ref, np.float64), np.asarray(test, np.float64))
    noise = a - b
    denom = float(np.mean(noise**2))
    if denom == 0:
        return float("inf")
    return float(10.0 * np.log10(np.mean(a**2) / denom))


def evaluate_waveforms(ref: np.ndarray, test: np.ndarray, cfg) -> Dict[str, float]:
    """All BASELINE.md axes between two same-rate waveforms."""
    import jax.numpy as jnp

    from svc_inference_pipeline_tpu.ops.mel import extract_mel_features

    # one mel front-end pass per waveform, shared by both spectral metrics
    a, b = _align(np.asarray(ref), np.asarray(test))
    ma = np.asarray(extract_mel_features(jnp.asarray(a), cfg)[0])
    mb = np.asarray(extract_mel_features(jnp.asarray(b), cfg)[0])
    out: Dict[str, float] = {
        "mel_mae": float(np.abs(ma - mb).mean()),
        "mcd_db": mcd_from_mels(ma, mb),
        "snr_db": waveform_snr_db(ref, test),
    }
    out.update(f0_rmse_cents(ref, test, cfg))
    return out


def evaluate_pair(ref_path: str, test_path: str, cfg=None) -> Dict[str, float]:
    from svc_inference_pipeline_tpu.config import DEFAULT_CONFIG, load_config
    from svc_inference_pipeline_tpu.utils.audio_io import load_audio

    cfg = cfg or load_config(DEFAULT_CONFIG)
    ref, _ = load_audio(ref_path, cfg.fs)
    test, _ = load_audio(test_path, cfg.fs)
    return evaluate_waveforms(ref, test, cfg)


#: the reference repo's own test clip + committed golden output
#: (/root/reference/infer.py:26-28)
GOLDEN_INPUT = "/root/reference/test_set/1100000814.wav"
GOLDEN_WAV = "/root/reference/gen/1100000814_svcc_CDF1.wav"
GOLDEN_SINGER = "svcc_CDF1"


def golden_eval(cfg, input_path: str = GOLDEN_INPUT, singer: str = GOLDEN_SINGER,
                golden_path: str = GOLDEN_WAV, output_path: str | None = None,
                pipeline=None) -> Dict[str, float]:
    """Convert ``input_path`` with the TRAINED checkpoints configured in
    ``cfg`` and score the result against the reference's committed golden
    output on the BASELINE.md axes (F0 RMSE, SNR, mel MAE, MCD).

    The checkpoints load through the reference's exact on-disk contracts:
    mapper ``ckpt["state_dict"]`` and vocoder ``ckpt["generator_state_dict"]``
    with DDP prefixes stripped and shape-filtered (utils/load_models.py:30-45,
    60-75), whisper ``{"dims", "model_state_dict"}``. Missing files raise
    with remediation instead of silently falling back to random weights.
    """
    import time

    from svc_inference_pipeline_tpu.utils.audio_io import load_audio, save_audio

    for role, path in (("mapper (--mapper / cfg.svc_model_path)", cfg.svc_model_path),
                       ("vocoder (--vocoder / cfg.vocoder_model_path)", cfg.vocoder_model_path)):
        if not os.path.exists(str(path)):
            raise FileNotFoundError(
                f"{role}: {path!r} not found. The reference's trained "
                "checkpoints are not publicly downloadable (its config "
                "points at a private mount — config/config.json:9-10); "
                "point the flag at a local copy."
            )

    if pipeline is None:
        from svc_inference_pipeline_tpu.pipeline.convert import SVCPipeline

        pipeline = SVCPipeline.from_config(cfg, random_weights=False)

    audio, _ = load_audio(input_path, cfg.fs)
    import jax

    t0 = time.time()
    wave = pipeline.convert(np.asarray(audio), singer, key=jax.random.PRNGKey(0))
    wall = time.time() - t0

    wave = np.asarray(wave)
    if output_path:
        save_audio(output_path, wave, cfg.fs)

    golden, _ = load_audio(golden_path, cfg.fs)
    out = evaluate_waveforms(np.asarray(golden), wave, cfg)
    out["rtf"] = wall / (len(audio) / cfg.fs)
    out["duration_s"] = len(audio) / cfg.fs
    return out


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        prog="python -m svc_inference_pipeline_tpu.eval",
        description="Score two waveforms, or run the golden real-checkpoint validation",
    )
    p.add_argument("wavs", nargs="*", metavar="WAV", help="REF.wav TEST.wav (pair mode)")
    p.add_argument("--golden", action="store_true",
                   help="convert the reference test clip with trained "
                        "checkpoints and score vs the committed golden output")
    p.add_argument("--config", default="./config/config.json")
    p.add_argument("--mapper", default=None, help="mapper .pt (ckpt['state_dict'])")
    p.add_argument("--vocoder", default=None, help="vocoder .pt (ckpt['generator_state_dict'])")
    p.add_argument("--whisper", default=None,
                   help="whisper .pt path or registry name (fetches under SVC_ALLOW_DOWNLOAD=1)")
    p.add_argument("--input", default=GOLDEN_INPUT)
    p.add_argument("--singer", default=GOLDEN_SINGER)
    p.add_argument("--golden-wav", default=GOLDEN_WAV)
    p.add_argument("--output", default=None, help="also save the converted WAV here")
    args = p.parse_args(argv)

    if not args.golden:
        if len(args.wavs) != 2:
            p.error("pair mode takes exactly REF.wav TEST.wav (or use --golden)")
        print(json.dumps(evaluate_pair(args.wavs[0], args.wavs[1]), indent=2))
        return 0

    from svc_inference_pipeline_tpu.config import load_config

    cfg = load_config(args.config)
    if args.mapper:
        cfg.svc_model_path = args.mapper
    if args.vocoder:
        cfg.vocoder_model_path = args.vocoder
    if args.whisper:
        cfg.whisper_model = args.whisper
    print(json.dumps(golden_eval(
        cfg, input_path=args.input, singer=args.singer,
        golden_path=args.golden_wav, output_path=args.output,
    )))
    return 0


if __name__ == "__main__":
    sys.exit(main())
