"""Profiled DEVICE time for the denoiser-step variants (no tunnel jitter)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, ".")
    import perf_kernel3 as pk
    from bench import _profiled_device_ms
    from svc_inference_pipeline_tpu.models import diffsvc_fast
    from svc_inference_pipeline_tpu.ops.pallas.denoiser_step import make_pallas_denoise_fn

    cfg = pk.Cfg()
    T, C, L, M = 944, cfg.residual_channels, cfg.residual_layer_num, cfg.n_mel
    rng = np.random.default_rng(0)
    def dense(i, o):
        return {"kernel": jnp.asarray(rng.standard_normal((i, o)) * 0.02, jnp.float32),
                "bias": jnp.asarray(rng.standard_normal((o,)) * 0.01, jnp.float32)}
    params = {"mel_preprocess": dense(M, C), "skip_projection": dense(C, C),
              "output_projection": dense(C, M),
              "diffusion_embedding": {"projection1": dense(128, 512),
                                       "projection2": dense(512, 512)}}
    for i in range(L):
        params[f"residual_{i}"] = {
            "dilated_conv": {"kernel": jnp.asarray(rng.standard_normal((3, C, 2*C))*0.02, jnp.float32),
                              "bias": jnp.asarray(rng.standard_normal((2*C,))*0.01, jnp.float32)},
            "conditioner_projection": dense(C, 2*C),
            "output_projection": dense(C, 2*C),
            "diffusion_projection": dense(512, C)}
    cond = jnp.asarray(rng.standard_normal((1, T, C)) * 0.1, jnp.float32)
    key = jax.random.PRNGKey(0)
    shape = (1, T, M)

    den_xla = diffsvc_fast.make_fast_denoise_fn(params, cond, 1000, cfg)
    den_p1 = make_pallas_denoise_fn(params, cond, 1000, cfg)
    den_v2 = pk.build_v2_fn(params, cond, 1000, cfg)

    for nm, d in [("xla", den_xla), ("pallas-r1", den_p1), ("pallas-v2", den_v2)]:
        f = jax.jit(pk.plain_scan_mod(d, shape, cond))
        float(f(key))  # compile+warm (cached from perf_kernel3 run)
        ms = _profiled_device_ms(lambda: float(f(key)))
        print(f"{nm:12s} device {ms:8.2f} ms / {pk.STEPS} steps = {ms/pk.STEPS*1000:7.1f} us/step",
              flush=True)

if __name__ == "__main__":
    main()
