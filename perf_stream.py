"""Device timing for the streamed (C=768) AMP stage: serial weight
fetches vs the double-buffered DMA schedule (amp_stage._DEBUG
["serial_stream"] A/B). Round-3 result: 9.77 ms serial -> 7.91 ms
double-buffered, kernel-only, [1, 3776, 768]."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import _profiled_device_ms
    from svc_inference_pipeline_tpu.ops.pallas import amp_stage
    from svc_inference_pipeline_tpu.ops.pallas.amp_stage import fused_amp_stage

    rng = np.random.default_rng(0)
    c0, t0 = 768, 3776
    ks = (3, 7, 11)
    dils = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    x = jnp.asarray(rng.standard_normal((1, t0, c0)) * 0.1, jnp.bfloat16)

    def mk_pair(c, k):
        # fused_amp_stage wants per-pair (w1, b1, w2, b2, al1, be1, al2, be2)
        # with w as [k, C, C] tap-major weight stacks
        w1 = jnp.asarray(rng.standard_normal((k, c, c)) * 0.02, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((k, c, c)) * 0.02, jnp.float32)
        b = jnp.asarray(rng.standard_normal((c,)) * 0.01, jnp.float32)
        a = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
        return (w1, b, w2, b, a, a, a, a)

    block_params = tuple(
        tuple(mk_pair(c0, ks[blk]) for _ in dils[blk]) for blk in range(3)
    )

    for serial in (True, False):
        amp_stage._DEBUG["serial_stream"] = serial
        jax.clear_caches()  # the debug knob is not part of the jit key
        run = lambda: fused_amp_stage(
            x, block_params, ks, dils, exact_edges=False
        ).block_until_ready()
        run()
        ms = _profiled_device_ms(run)
        tag = "serial " if serial else "dblbuf "
        print(f"streamed stage0 {tag} [1,{t0},{c0}] kernel-only: device {ms:6.2f} ms",
              flush=True)
    amp_stage._DEBUG["serial_stream"] = False


if __name__ == "__main__":
    main()
