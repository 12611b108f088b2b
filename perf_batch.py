"""Batched-serving throughput on the real chip: clips/sec at B=1 vs B=4."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from svc_inference_pipeline_tpu.config import DEFAULT_CONFIG, HParams, load_config
    from svc_inference_pipeline_tpu.pipeline.convert import SVCPipeline
    from svc_inference_pipeline_tpu.utils.audio_io import load_audio

    cfg = load_config(DEFAULT_CONFIG)
    d = cfg.to_dict()
    d["mapper"]["sampler"] = "plms"  # serving path: the supported fast sampler
    cfg = HParams(**d)

    src = "/root/reference/test_set/1100000814.wav"
    audio, _ = load_audio(src, cfg.fs)
    audio = np.asarray(audio)
    reps = int(np.ceil(10 * cfg.fs / len(audio)))
    clip = np.tile(audio, reps)[: 10 * cfg.fs]
    dur = len(clip) / cfg.fs

    pipe = SVCPipeline.from_config(cfg, random_weights=True, whisper_size="medium")
    singers = ["svcc_CDF1", "svcc_CDM1", "svcc_IDF1", "svcc_IDM1"]

    for b in (1, 4):
        clips = [clip] * b
        names = singers[:b]
        pipe.convert_batch(clips, names, key=jax.random.PRNGKey(0))  # compile
        ts = []
        for i in range(3):
            t0 = time.time()
            pipe.convert_batch(clips, names, key=jax.random.PRNGKey(i))
            ts.append(time.time() - t0)
        t = float(np.median(ts))
        print(
            f"B={b}: {t*1000:7.1f} ms/batch → {b/t:6.2f} clips/s "
            f"({b*dur/t:6.2f}x realtime aggregate)",
            flush=True,
        )


if __name__ == "__main__":
    main()
