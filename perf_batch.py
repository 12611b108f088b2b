"""Batched-serving throughput on the real chip: clips/sec at B in {1,4,8}.

Wall medians carry +-20-55 ms of tunnel jitter per call; the profiled
device time of the warm core executable (same method as bench.py) shows
how much of each batch is device compute vs amortisable overhead — the
number that decides whether batching can pay beyond overhead amortisation.

PERF_BATCH_SAMPLER=ddpm runs the DDPM-1000 path (batched fused Pallas
denoiser) instead of the PLMS@10 serving default.
PERF_BATCH_SIZES=1,4,8 overrides the batch list.
PERF_BATCH_QUANTIZE=int8 turns on the int8 denoiser speed mode.
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

    from bench import _profiled_device_ms
    from svc_inference_pipeline_tpu.config import DEFAULT_CONFIG, HParams, load_config
    from svc_inference_pipeline_tpu.pipeline.convert import SVCPipeline
    from svc_inference_pipeline_tpu.utils.audio_io import load_audio

    sampler = os.environ.get("PERF_BATCH_SAMPLER", "plms")
    sizes = [int(s) for s in os.environ.get("PERF_BATCH_SIZES", "1,4,8").split(",")]

    cfg = load_config(DEFAULT_CONFIG)
    d = cfg.to_dict()
    d["mapper"]["sampler"] = sampler
    quant = os.environ.get("PERF_BATCH_QUANTIZE") or None
    if quant:
        d["denoiser_quantize"] = quant
    cfg = HParams(**d)

    src = "/root/reference/test_set/1100000814.wav"
    audio, _ = load_audio(src, cfg.fs)
    audio = np.asarray(audio)
    reps = int(np.ceil(10 * cfg.fs / len(audio)))
    clip = np.tile(audio, reps)[: 10 * cfg.fs]
    dur = len(clip) / cfg.fs

    pipe = SVCPipeline.from_config(cfg, random_weights=True, whisper_size="medium")
    singers = ["svcc_CDF1", "svcc_CDM1", "svcc_IDF1", "svcc_IDM1"]

    print(f"sampler={sampler}  sizes={sizes}  quantize={quant}", flush=True)
    base_clips_s = None
    for b in sizes:
        clips = [clip] * b
        names = (singers * ((b + 3) // 4))[:b]
        t0 = time.time()
        pipe.convert_batch(clips, names, key=jax.random.PRNGKey(0))  # compile
        print(f"B={b}: warm-up {time.time() - t0:.1f}s", flush=True)
        ts = []
        for i in range(3):
            t0 = time.time()
            pipe.convert_batch(clips, names, key=jax.random.PRNGKey(i))
            ts.append(time.time() - t0)
        t = float(np.median(ts))

        dev_ms = 0.0
        try:
            dev_ms = _profiled_device_ms(
                lambda: pipe.convert_batch(clips, names, key=jax.random.PRNGKey(9))
            )
        except Exception as e:  # profiling is auxiliary
            print(f"  (device profile unavailable: {e})", flush=True)

        clips_s = b / t
        speedup = "" if base_clips_s is None else f"  {clips_s / base_clips_s:.2f}x vs B={sizes[0]}"
        if base_clips_s is None:
            base_clips_s = clips_s
        print(
            f"B={b}: {t*1000:7.1f} ms/batch  device {dev_ms:7.1f} ms "
            f"({dev_ms / (t*1000) * 100:4.0f}%)  → {clips_s:6.2f} clips/s "
            f"({b*dur/t:6.2f}x realtime aggregate){speedup}",
            flush=True,
        )


if __name__ == "__main__":
    main()
