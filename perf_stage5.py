"""Stage-5 cost split: fused kernel vs boundary patch vs upsample conv."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def timed(name, fn, n=4):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{name:52s} {min(ts)*1000:9.1f} ms", flush=True)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from svc_inference_pipeline_tpu.ops.pallas.amp_stage import _xla_stage, fused_amp_stage

    T, C = 245760, 24
    ks = (3, 7, 11)
    dils = ((1, 3, 5),) * 3
    rng = np.random.default_rng(0)

    def pair(k):
        return tuple(
            jnp.asarray(v, jnp.float32) for v in (
                rng.standard_normal((k, C, C)) * 0.05,
                rng.standard_normal(C) * 0.02,
                rng.standard_normal((k, C, C)) * 0.05,
                rng.standard_normal(C) * 0.02,
                rng.standard_normal(C) * 0.1,
                rng.standard_normal(C) * 0.1,
                rng.standard_normal(C) * 0.1,
                rng.standard_normal(C) * 0.1,
            )
        )

    params = tuple(tuple(pair(k) for _ in ds) for k, ds in zip(ks, dils))
    params = jax.device_put(params)
    x = jax.device_put(jnp.asarray(rng.standard_normal((1, T, C)) * 0.3, jnp.bfloat16))

    f_full = jax.jit(lambda xx, pp: jnp.sum(fused_amp_stage(
        xx, pp, ks, dils, "snakebeta", True, exact_edges=True).astype(jnp.float32)))
    timed("stage (kernel + edge patch)", lambda: float(f_full(x, params)))

    f_nopatch = jax.jit(lambda xx, pp: jnp.sum(fused_amp_stage(
        xx, pp, ks, dils, "snakebeta", True, exact_edges=False).astype(jnp.float32)))
    timed("stage (kernel only)", lambda: float(f_nopatch(x, params)))

    f_tile4k = jax.jit(lambda xx, pp: jnp.sum(fused_amp_stage(
        xx, pp, ks, dils, "snakebeta", True, t_tile=4096, exact_edges=False).astype(jnp.float32)))
    timed("stage (kernel only, t_tile=4096)", lambda: float(f_tile4k(x, params)))

    span = 448
    xs = jax.device_put(jnp.asarray(rng.standard_normal((1, span, C)) * 0.3, jnp.bfloat16))
    f_patch = jax.jit(lambda xx, pp: jnp.sum(_xla_stage(xx, pp, ks, dils, "snakebeta", True).astype(jnp.float32)))
    timed("xla patch span alone (one side)", lambda: float(f_patch(xs, params)))

    # upsample transposed conv at stage-5 input size
    from svc_inference_pipeline_tpu.models.bigvgan import TorchConvTranspose1d

    up = TorchConvTranspose1d(24, 4, 2, dtype=jnp.bfloat16)
    xin = jax.device_put(jnp.asarray(rng.standard_normal((1, T // 2, 48)) * 0.3, jnp.bfloat16))
    pvar = up.init(jax.random.PRNGKey(0), xin)
    f_up = jax.jit(lambda pp, xx: jnp.sum(up.apply(pp, xx).astype(jnp.float32)))
    timed("upsample convT 122880x48 -> 245760x24", lambda: float(f_up(pvar, xin)))


if __name__ == "__main__":
    main()
