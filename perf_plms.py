"""Measure the fast-sampler (PLMS/DDIM) e2e RTF on the TPU."""

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
    d["mapper"]["sampler"] = sys.argv[1] if len(sys.argv) > 1 else "plms"
    d["mapper"]["plms_speedup"] = 10
    cfg = HParams(**d)

    audio, _ = load_audio("/root/reference/test_set/1100000814.wav", cfg.fs)
    audio = np.tile(np.asarray(audio), 3)[: 10 * cfg.fs]

    pipe = SVCPipeline.from_config(cfg, random_weights=True, whisper_size="medium")
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    pipe.convert(audio, "svcc_CDF1", key=key)
    print(f"warm-up {time.time()-t0:.1f}s", flush=True)
    times = []
    for i in range(3):
        t0 = time.time()
        pipe.convert(audio, "svcc_CDF1", key=jax.random.PRNGKey(i))
        times.append(time.time() - t0)
    rtf = np.median(times) / 10.0
    print(f"{d['mapper']['sampler']}@10 e2e: {[f'{t:.3f}' for t in times]} → RTF {rtf:.4f}")


if __name__ == "__main__":
    main()
