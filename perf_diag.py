"""Stage-by-stage TPU timing diagnostic (not part of the test suite)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def timed(name, fn, n=3):
    import numpy as _np

    def run():
        out = fn()
        if hasattr(out, "sum"):
            float(_np.asarray(out).sum())
        return out

    run()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {min(ts)*1000:10.1f} ms (min of {n})", flush=True)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from svc_inference_pipeline_tpu.config import DEFAULT_CONFIG, load_config
    from svc_inference_pipeline_tpu.pipeline.convert import SVCPipeline
    from svc_inference_pipeline_tpu.utils.audio_io import load_audio

    cfg = load_config(DEFAULT_CONFIG)
    print("devices:", jax.devices(), flush=True)

    # dispatch round-trip latency
    one = jnp.ones((8, 128))
    f_triv = jax.jit(lambda x: x * 2)
    f_triv(one).block_until_ready()
    timed("trivial dispatch round-trip", lambda: f_triv(one).block_until_ready(), n=10)

    # transfer latency: 6 MB each way
    big = np.zeros((1500, 1024), np.float32)
    timed("host->device 6MB", lambda: jax.device_put(big).block_until_ready(), n=5)
    dbig = jax.device_put(big)
    timed("device->host 6MB", lambda: np.asarray(dbig), n=5)

    src = "/root/reference/test_set/1100000814.wav"
    audio, _ = load_audio(src, cfg.fs)
    audio = np.tile(np.asarray(audio), 3)[: 10 * cfg.fs]

    from svc_inference_pipeline_tpu.ops.resample import resample
    from svc_inference_pipeline_tpu.ops.mel import extract_mel_features
    from svc_inference_pipeline_tpu.ops.f0 import praat_pitch_ac
    from svc_inference_pipeline_tpu.ops.whisper_mel import log_mel_spectrogram, pad_or_trim

    timed("resample 44.1k->24k (host array in)", lambda: np.asarray(resample(audio, 24000, 16000)))
    mel, energy = extract_mel_features(jnp.asarray(audio), cfg)
    timed("mel+energy", lambda: np.asarray(extract_mel_features(jnp.asarray(audio), cfg)[0]))
    timed(
        "praat f0",
        lambda: np.asarray(
            praat_pitch_ac(jnp.asarray(audio), cfg.fs, cfg.hop_length, 65.0, 800.0, voicing_threshold=0.6)
        ),
    )
    a16 = pad_or_trim(resample(jnp.asarray(audio), 24000, 16000))
    timed("whisper logmel", lambda: log_mel_spectrogram(a16).block_until_ready())

    pipe = SVCPipeline.from_config(cfg, random_weights=True, whisper_size="medium")
    wmel = log_mel_spectrogram(a16)[None]
    timed("whisper-medium encode (bf16)", lambda: pipe.whisper.embed_audio(wmel).block_until_ready())

    batch, n_frames = pipe.extract_features(audio, "svcc_CDF1")
    print("frames:", n_frames, "padded:", batch["melody"].shape[1], flush=True)
    arrays = {k: jnp.asarray(v) for k, v in batch.items()}
    padded = batch["melody"].shape[1]
    key = jax.random.PRNGKey(0)

    timed(
        "core (cond+ddpm1000+vocoder)",
        lambda: pipe._core(
            pipe.cond_params, pipe.denoiser_params, pipe.vocoder_params, arrays, key,
            jnp.asarray([padded], jnp.int32), n_frames=padded,
            sampler=pipe._resolve_sampler(None, None)[0],
            speedup=pipe._resolve_sampler(None, None)[1],
        ).block_until_ready(),
    )

    # core split: denoiser-only scan vs vocoder-only. Params are explicit
    # jit ARGUMENTS — closing over device arrays embeds them as HLO
    # constants, which blows past the remote-compile request limit (413).
    from svc_inference_pipeline_tpu.models.diffsvc_fast import make_fast_denoise_fn
    from svc_inference_pipeline_tpu.sampling.ddpm import ddpm_sample

    cond = pipe.cond_encoder.apply({"params": pipe.cond_params}, arrays)
    shape = (1, padded, 100)

    def scan_only(dp, c, k):
        fn = make_fast_denoise_fn(dp, c, pipe.schedule.num_steps, pipe.cfg.mapper,
                                  compute_dtype=pipe.denoiser.compute_dtype or jnp.float32)
        return ddpm_sample(fn, c, k, shape, pipe.schedule)

    f_ddpm = jax.jit(scan_only)
    timed("ddpm 1000-step scan alone (fast path)",
          lambda: f_ddpm(pipe.denoiser_params, cond, key).block_until_ready())

    mel_in = jnp.zeros((1, padded, 100))
    f_voc = jax.jit(lambda p, m: pipe.vocoder.apply({"params": p}, m))
    timed("bigvgan vocoder alone", lambda: f_voc(pipe.vocoder_params, mel_in).block_until_ready())

    # one denoiser step alone
    x = jnp.zeros(shape)
    t = jnp.zeros((1, 1), jnp.int32)
    f_step = jax.jit(lambda p, xx, c, tt: pipe.denoiser.apply({"params": p}, xx, c, tt))
    timed("single denoiser forward",
          lambda: f_step(pipe.denoiser_params, x, cond, t).block_until_ready())


if __name__ == "__main__":
    main()
