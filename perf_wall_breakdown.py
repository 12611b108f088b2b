"""Wall-clock phase breakdown of one convert() call on the real chip.

Separates: audio upload, front-end dispatch→ready, host F0, core
dispatch→ready, output fetch — to attribute the gap between device time
(~428 ms from the profile) and e2e wall (~519 ms).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from svc_inference_pipeline_tpu.config import DEFAULT_CONFIG, load_config
    from svc_inference_pipeline_tpu.pipeline.convert import SVCPipeline
    from svc_inference_pipeline_tpu.ops.f0 import get_f0_features
    from svc_inference_pipeline_tpu.utils.artifacts import pitch_shift
    from svc_inference_pipeline_tpu.utils.audio_io import load_audio

    cfg = load_config(DEFAULT_CONFIG)
    audio, _ = load_audio("/root/reference/test_set/1100000814.wav", cfg.fs)
    audio = np.asarray(audio)
    reps = int(np.ceil(10 * cfg.fs / len(audio)))
    audio = np.tile(audio, reps)[: 10 * cfg.fs]

    pipe = SVCPipeline.from_config(cfg, random_weights=True, whisper_size="medium")
    key = jax.random.PRNGKey(0)
    # compile everything once
    pipe.convert(audio, "svcc_CDF1", key=key, pcm16=True, upload_pcm16=True)

    def phase_run(tag, upload_pcm16):
        t = {}
        t0 = time.perf_counter()
        if upload_pcm16:
            dev = np.clip(np.round(audio * 32768.0), -32768, 32767).astype(np.int16)
        else:
            dev = audio
        a_dev = jnp.asarray(dev)
        a_dev.block_until_ready()
        t["upload"] = time.perf_counter() - t0

        from svc_inference_pipeline_tpu.ops.resample import _out_len
        from svc_inference_pipeline_tpu.ops.whisper_mel import N_SAMPLES

        t0 = time.perf_counter()
        len16 = _out_len(len(audio), 2, 3)
        n_windows = max(1, -(-len16 // N_SAMPLES))
        n_frames = min(pipe.mel_frame_count(len(audio)), n_windows * 1500 * 15 // 8)
        from svc_inference_pipeline_tpu.pipeline.convert import pad_to_bucket
        padded = pad_to_bucket(n_frames, pipe.bucket)
        energy, content = pipe._frontend_device(
            pipe.whisper.params, a_dev, n_windows=n_windows,
            n_frames=n_frames, padded=padded)
        t["fe_dispatch"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        f0, _c = get_f0_features(audio, n_frames, cfg)
        f0 = pitch_shift(f0, cfg)
        t["host_f0"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready((energy, content))
        t["fe_wait"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        f0p = np.pad(f0[:n_frames], (0, padded - n_frames)).astype(np.float32)
        from svc_inference_pipeline_tpu.utils.registry import get_singer_id
        batch = {
            "content_whisper": content,
            "melody": jnp.asarray(f0p)[None],
            "loudness": energy,
            "singer": jnp.asarray(get_singer_id(cfg, "svcc_CDF1")[None].astype(np.int32)),
        }
        smp, spd = pipe._resolve_sampler(None, None)
        wave = pipe._core(pipe.cond_params, pipe.denoiser_params, pipe.vocoder_params,
                          batch, key, jnp.asarray([n_frames], jnp.int32),
                          n_frames=padded, pcm16=True, sampler=smp, speedup=spd)
        t["core_dispatch"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        wave.block_until_ready()
        t["core_wait"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = np.asarray(wave)
        t["fetch"] = time.perf_counter() - t0
        total = sum(t.values())
        print(f"[{tag}] " + "  ".join(f"{k}={v*1000:.1f}" for k, v in t.items())
              + f"  TOTAL={total*1000:.1f} ms", flush=True)

    for tag, pc in (("f32", False), ("i16", True), ("f32", False), ("i16", True)):
        phase_run(tag, pc)


if __name__ == "__main__":
    main()
