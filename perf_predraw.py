"""A/B: pre-drawn vs per-step z in the fused DDPM-1000 sampler (real chip).

Production shape (B=1, T=944, M=100, C=384, L=20, 1000 steps). The pre-draw
variant replaces 1000 small latency-bound threefry fusions inside the scan
(~4.5 ms/conversion in the round-3 core profile) with one vmapped draw
before it (+0.5 GB transient HBM). Keys are identical, so outputs are
bit-identical — only the walls differ.
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
    from svc_inference_pipeline_tpu.models.diffsvc import DiffSVCDenoiser
    from svc_inference_pipeline_tpu.ops.pallas import denoiser_step
    from svc_inference_pipeline_tpu.ops.pallas.denoiser_step import make_pallas_denoise_fn
    from svc_inference_pipeline_tpu.sampling.schedule import DiffusionSchedule
    from svc_inference_pipeline_tpu.utils.devices import fast_random_params

    cfg = load_config(DEFAULT_CONFIG)
    mcfg = cfg.mapper
    b, t = 1, 944
    model = DiffSVCDenoiser(mcfg, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, mcfg.n_mel)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, t, mcfg.conditioner_size)), jnp.float32)
    params = fast_random_params(
        lambda: model.init(jax.random.PRNGKey(0), x, cond, jnp.zeros((b, 1), jnp.int32))
    )["params"]
    sched = DiffusionSchedule.from_factors(mcfg.noise_schedule_factors)

    cond = jax.device_put(cond)
    key = jax.random.PRNGKey(7)
    shape = (b, t, mcfg.n_mel)

    results = {}
    for predraw in (True, False):
        denoiser_step._PREDRAW_Z = predraw
        fn = make_pallas_denoise_fn(params, cond, sched.num_steps, mcfg,
                                    compute_dtype=jnp.bfloat16)
        run = jax.jit(lambda k: fn.fused_ddpm(k, shape, sched))
        t0 = time.time()
        out = run(key)
        s = float(jnp.sum(out))  # fetch a scalar — forces completion
        print(f"predraw={predraw}: warm-up {time.time() - t0:.1f}s  sum {s:.5f}",
              flush=True)
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            float(jnp.sum(run(jax.random.PRNGKey(7))))
            ts.append(time.perf_counter() - t0)
        results[predraw] = (float(np.median(ts)), s)
        print(f"predraw={predraw}: fused DDPM-1000 median {np.median(ts)*1000:7.1f} ms "
              f"(min {min(ts)*1000:.1f})", flush=True)

    assert abs(results[True][1] - results[False][1]) < 1e-3, results
    d = (results[False][0] - results[True][0]) * 1000
    print(f"pre-draw saves {d:+.1f} ms per DDPM-1000 conversion", flush=True)


if __name__ == "__main__":
    main()
