"""Vocoder XLA-vs-Pallas timing on the TPU (not part of the test suite).

All jitted functions reduce to a scalar INSIDE the jit — fetching full
outputs over the axon tunnel (~37 MB/s) would dominate the measurement,
and block_until_ready is unreliable under the remote runtime.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def timed(name, fn, n=5):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn())  # scalar fetch forces full execution
        ts.append(time.perf_counter() - t0)
    print(f"{name:45s} {min(ts)*1000:9.1f} ms", flush=True)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from svc_inference_pipeline_tpu.config import DEFAULT_CONFIG, load_config
    from svc_inference_pipeline_tpu.models.bigvgan import BigVGANGenerator
    from svc_inference_pipeline_tpu.utils.devices import fast_random_params

    cfg = load_config(DEFAULT_CONFIG)
    vcfg = cfg.vocoder
    T = 960
    mel = jnp.zeros((1, T, vcfg.input_dim), jnp.float32)

    for use_pallas in (False, True):
        for dtype_name, dtype in (("bf16", jnp.bfloat16),):
            gen = BigVGANGenerator(vcfg, use_pallas=use_pallas, compute_dtype=dtype)
            params = jax.device_put(
                fast_random_params(lambda: gen.init(jax.random.PRNGKey(0), mel[:, :16]))["params"]
            )
            f = jax.jit(lambda p, m: jnp.sum(gen.apply({"params": p}, m)))
            try:
                timed(f"vocoder pallas={use_pallas} {dtype_name}", lambda: f(params, mel))
            except Exception as e:
                print(f"vocoder pallas={use_pallas} {dtype_name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

    from svc_inference_pipeline_tpu.ops.pallas.snake import fused_activation1d
    from svc_inference_pipeline_tpu.models.bigvgan import downsample1d, snake_beta, upsample1d

    for t, c in ((3840, 768), (15360, 384), (122880, 48), (245760, 24)):
        x = jnp.zeros((1, t, c), jnp.float32)
        alpha = jnp.zeros(c)
        beta = jnp.zeros(c)
        f_x = jax.jit(
            lambda a: jnp.sum(downsample1d(snake_beta(upsample1d(a, 2, 12), alpha, beta, True), 2, 12))
        )
        timed(f"xla act1d T={t} C={c}", lambda: f_x(x))
        f_p = jax.jit(lambda a: jnp.sum(fused_activation1d(a, alpha, beta, "snakebeta", True)))
        try:
            timed(f"pallas act1d T={t} C={c}", lambda: f_p(x))
        except Exception as e:
            print(f"pallas act1d T={t} C={c}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

    # plain conv cost at the same shapes (AMP blocks: 18 convs per stage)
    import flax.linen as nn

    for t, c in ((3840, 768), (15360, 384)):
        x = jnp.zeros((1, t, c), jnp.bfloat16)
        conv = nn.Conv(c, kernel_size=(3,), padding=[(1, 1)], dtype=jnp.bfloat16)
        p = conv.init(jax.random.PRNGKey(0), x)["params"]
        fc = jax.jit(lambda pp, a: jnp.sum(conv.apply({"params": pp}, a)))
        timed(f"conv k3 T={t} C={c} bf16", lambda: fc(p, x))


if __name__ == "__main__":
    main()
