"""Per-stage vocoder cost bisect: compile generators truncated after stage k."""

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
        float(fn())
        ts.append(time.perf_counter() - t0)
    print(f"{name:42s} {min(ts)*1000:9.1f} ms", flush=True)
    return min(ts)


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from svc_inference_pipeline_tpu.config import DEFAULT_CONFIG, load_config
    from svc_inference_pipeline_tpu.models.bigvgan import (
        AMPBlock1,
        Activation1d,
        TorchConv1d,
        TorchConvTranspose1d,
    )
    from svc_inference_pipeline_tpu.utils.devices import fast_random_params

    cfg = load_config(DEFAULT_CONFIG).vocoder
    T = 960
    dtype = jnp.bfloat16

    class Truncated(nn.Module):
        n_stages: int
        use_pallas: bool = True

        @nn.compact
        def __call__(self, mel):
            x = TorchConv1d(cfg.upsample_initial_channel, 7, name="conv_pre", dtype=dtype)(
                mel.astype(dtype)
            )
            for i in range(self.n_stages):
                u = cfg.upsample_rates[i]
                k = cfg.upsample_kernel_sizes[i]
                ch = cfg.upsample_initial_channel // (2 ** (i + 1))
                x = TorchConvTranspose1d(ch, k, u, name=f"up_{i}", dtype=dtype)(x)
                acc = None
                for j, (rk, rd) in enumerate(
                    zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
                ):
                    y = AMPBlock1(cfg, ch, rk, tuple(rd), name=f"rb_{i}_{j}",
                                  use_pallas=self.use_pallas, dtype=dtype)(x)
                    acc = y if acc is None else acc + y
                x = acc / len(cfg.resblock_kernel_sizes)
            return jnp.sum(x.astype(jnp.float32))

    mel = jnp.zeros((1, T, cfg.input_dim), jnp.float32)
    prev = 0.0
    for n_stages in range(0, 7):
        model = Truncated(n_stages)
        params = jax.device_put(
            fast_random_params(lambda: model.init(jax.random.PRNGKey(0), mel[:, :16]))["params"]
        )
        f = jax.jit(lambda p, m: model.apply({"params": p}, m))
        t = timed(f"stages 0..{n_stages-1}" if n_stages else "conv_pre only",
                  lambda: f(params, mel))
        if n_stages:
            print(f"    → stage {n_stages-1} marginal: {(t-prev)*1000:.1f} ms", flush=True)
        prev = t


if __name__ == "__main__":
    main()
