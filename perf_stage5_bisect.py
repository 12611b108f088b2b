"""Attribute fused-AMP-stage kernel time: packed vs unpacked × act/conv.

Uses the _DEBUG hooks in ops/pallas/amp_stage.py; jax.clear_caches()
between variants because the hooks are not part of the jit key.
"""

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

    from svc_inference_pipeline_tpu.ops.pallas import amp_stage
    from svc_inference_pipeline_tpu.ops.pallas.amp_stage import fused_amp_stage

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

    for g in (4, 2, 1):
        for no_act, no_conv, tag in (
            (False, False, "full"),
            (True, False, "convs only"),
            (False, True, "acts only"),
            (True, True, "dma+shift only"),
        ):
            amp_stage._DEBUG.update(force_g=g, no_act=no_act, no_conv=no_conv)
            jax.clear_caches()
            f = jax.jit(lambda xx, pp: jnp.sum(fused_amp_stage(
                xx, pp, ks, dils, "snakebeta", True,
                exact_edges=False).astype(jnp.float32)))
            timed(f"g={g} {tag}", lambda: float(f(x, params)))


if __name__ == "__main__":
    main()
