"""Pipeline-level int8 quality gate + speed on the real chip.

Converts the 10 s bench clip three ways — denoiser_quantize None /
'int8-w1' / 'int8' — with the SAME random weights and key, and reports
per-variant e2e RTF plus waveform SNR and final-waveform correlation vs
the full-precision (bf16) chain. This is the number the quality gate in
tests/test_int8_denoiser.py pins at reduced shape; here it runs at the
production shape the bench uses.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from svc_inference_pipeline_tpu.config import DEFAULT_CONFIG, load_config
    from svc_inference_pipeline_tpu.pipeline.convert import SVCPipeline
    from svc_inference_pipeline_tpu.utils.audio_io import load_audio

    cfg = load_config(DEFAULT_CONFIG)
    src = "/root/reference/test_set/1100000814.wav"
    audio, _ = load_audio(src, cfg.fs)
    audio = np.asarray(audio)
    reps = int(np.ceil(10 * cfg.fs / len(audio)))
    audio = np.tile(audio, reps)[: 10 * cfg.fs]
    duration = len(audio) / cfg.fs

    key = jax.random.PRNGKey(0)
    outs, rtfs = {}, {}
    for quant in (None, "int8-w1", "int8"):
        tag = quant or "bf16"
        cfg.denoiser_quantize = quant
        pipe = SVCPipeline.from_config(
            cfg, random_weights=True, whisper_size="medium", bucket=16
        )
        # pcm16 + upload_pcm16 match bench.py's executable exactly — the
        # warm-up rides .jax_cache instead of paying a fresh remote compile
        t0 = time.time()
        w = pipe.convert(audio, "svcc_CDF1", key=key, pcm16=True, upload_pcm16=True)
        print(f"{tag}: warm-up {time.time() - t0:.1f}s", flush=True)
        ts = []
        for i in range(5):
            t0 = time.time()
            w = pipe.convert(audio, "svcc_CDF1", key=key, pcm16=True,
                             upload_pcm16=True)
            ts.append(time.time() - t0)
        outs[tag] = np.asarray(w, np.float64) / 32767.0
        rtfs[tag] = float(np.median(ts) / duration)
        print(f"{tag}: e2e RTF {rtfs[tag]:.4f}", flush=True)
        del pipe

    ref = outs["bf16"]
    for tag, w in outs.items():
        if tag == "bf16":
            continue
        n = min(len(w), len(ref))
        err = w[:n] - ref[:n]
        snr = 10.0 * np.log10(np.sum(ref[:n] ** 2) / max(np.sum(err**2), 1e-30))
        corr = float(np.corrcoef(w[:n], ref[:n])[0, 1])
        print(
            f"{tag:>8} vs bf16 waveform: SNR {snr:6.1f} dB  corr {corr:.6f}  "
            f"rtf {rtfs[tag]:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
