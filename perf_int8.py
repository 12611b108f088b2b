"""A/B: bf16 vs int8 fused DDPM sampler at production shape (real chip).

Production shape (B=1, T=944, M=100, C=384, L=20, 1000 steps). Int8 runs
the two hot per-layer matmuls (dilated conv [T,3C]@[3C,2C], output
projection [T,C]@[C,2C]) on the int8 MXU at 2x the bf16 rate — the
per-step FLOP roof drops from ~226 µs to ~113 µs. Costs: a per-step
dynamic activation quantisation (one VPU max-reduce + rescale) and a
measured accuracy delta vs the bf16 chain (reported below as relative
error / correlation on the final mel).
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
    # init leaves the final projection zero — randomize so quality deltas
    # are measurable
    params = jax.tree.map(
        lambda p: jnp.asarray(
            (np.random.default_rng(1).standard_normal(p.shape) * 0.05).astype(
                np.float32
            ),
            p.dtype,
        ),
        params,
    )
    sched = DiffusionSchedule.from_factors(mcfg.noise_schedule_factors)

    cond = jax.device_put(cond)
    key = jax.random.PRNGKey(7)
    shape = (b, t, mcfg.n_mel)

    outs = {}
    variants = [
        (None, 0), ("int8", 0), ("int8-w1", 0), ("int8", 50), ("int8-w1", 50),
    ]
    for quant, tail in variants:
        tag = (quant or "bf16") + (f"+tail{tail}" if tail else "")
        fn = make_pallas_denoise_fn(params, cond, sched.num_steps, mcfg,
                                    compute_dtype=jnp.bfloat16, quantize=quant,
                                    quantize_tail=tail)
        run = jax.jit(lambda k: fn.fused_ddpm(k, shape, sched))
        t0 = time.time()
        out = run(key)
        outs[tag] = np.asarray(out)
        print(f"{tag}: warm-up {time.time() - t0:.1f}s", flush=True)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(jnp.sum(run(key)))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(
            f"{tag}: fused DDPM-{sched.num_steps} median {med*1000:7.1f} ms "
            f"({med/sched.num_steps*1e6:.0f} us/step, min {min(ts)*1000:.1f})",
            flush=True,
        )

    a = outs["bf16"]
    for tag, q in outs.items():
        if tag == "bf16":
            continue
        rel = float(np.abs(q - a).max() / np.abs(a).max())
        corr = float(np.corrcoef(q.ravel(), a.ravel())[0, 1])
        rmse = float(np.sqrt(np.mean((q - a) ** 2)))
        print(f"{tag:>12} vs bf16 final mel: rel-max-err {rel:.4f}  "
              f"corr {corr:.6f}  rmse {rmse:.5f}", flush=True)


if __name__ == "__main__":
    main()
