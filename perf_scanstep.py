"""DDPM scan-step floor: dilated-conv chain vs im2col-matmul formulation."""

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
    print(f"{name:50s} {min(ts)*1000:9.1f} ms", flush=True)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    T, C = 960, 384
    STEPS = 100  # amortise dispatch
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 8)

    convs = [
        jax.random.normal(ks[0], (3, C, 2 * C), dt) * 0.02 for _ in range(20)
    ]
    outs = [jax.random.normal(ks[1], (C, 2 * C), dt) * 0.02 for _ in range(20)]
    conds = jax.random.normal(ks[2], (20, 1, T, 2 * C), dt)
    x0 = jax.random.normal(ks[3], (1, T, C), dt)

    def chain_conv(x):
        skip = jnp.zeros((1, T, C), jnp.float32)
        for i in range(20):
            d = 2 ** (i % 4)
            y = jax.lax.conv_general_dilated(
                x, convs[i], (1,), [(d, d)], rhs_dilation=(d,),
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + conds[i]
            g, f = jnp.split(y, 2, axis=-1)
            y = jax.nn.sigmoid(g) * jnp.tanh(f)
            y = y @ outs[i]
            r, s = jnp.split(y, 2, axis=-1)
            x = (x + r) * np.float32(0.7071).astype(dt)
            skip = skip + s.astype(jnp.float32)
        return x, skip

    def chain_matmul(x):
        skip = jnp.zeros((1, T, C), jnp.float32)
        for i in range(20):
            d = 2 ** (i % 4)
            w = convs[i]
            xp = jnp.pad(x, [(0, 0), (d, d), (0, 0)])
            y = (
                xp[:, : T, :] @ w[0]
                + xp[:, d : d + T, :] @ w[1]
                + xp[:, 2 * d : 2 * d + T, :] @ w[2]
                + conds[i]
            )
            g, f = jnp.split(y, 2, axis=-1)
            y = jax.nn.sigmoid(g) * jnp.tanh(f)
            y = y @ outs[i]
            r, s = jnp.split(y, 2, axis=-1)
            x = (x + r) * np.float32(0.7071).astype(dt)
            skip = skip + s.astype(jnp.float32)
        return x, skip

    for name, chain in (("conv chain", chain_conv), ("im2col matmul chain", chain_matmul)):

        def scan_fn(x0):
            def body(x, _):
                x, skip = chain(x)
                return x, None

            x, _ = jax.lax.scan(body, x0, None, length=STEPS)
            return jnp.sum(x.astype(jnp.float32))

        f = jax.jit(scan_fn)
        t = timed(f"{name} ×{STEPS} steps", lambda: f(x0))
        print(f"    → per step: {t/STEPS*1e3:.3f} ms", flush=True)

    # same at T=1024 for tiling comparison
    T2 = 1024
    conds2 = jax.random.normal(ks[4], (20, 1, T2, 2 * C), dt)
    x02 = jax.random.normal(ks[5], (1, T2, C), dt)

    def chain_conv_1024(x):
        skip = jnp.zeros((1, T2, C), jnp.float32)
        for i in range(20):
            d = 2 ** (i % 4)
            y = jax.lax.conv_general_dilated(
                x, convs[i], (1,), [(d, d)], rhs_dilation=(d,),
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + conds2[i]
            g, f = jnp.split(y, 2, axis=-1)
            y = jax.nn.sigmoid(g) * jnp.tanh(f)
            y = y @ outs[i]
            r, s = jnp.split(y, 2, axis=-1)
            x = (x + r) * np.float32(0.7071).astype(dt)
            skip = skip + s.astype(jnp.float32)
        return x, skip

    def scan_1024(x0):
        def body(x, _):
            x, _ = chain_conv_1024(x)
            return x, None

        x, _ = jax.lax.scan(body, x0, None, length=STEPS)
        return jnp.sum(x.astype(jnp.float32))

    f2 = jax.jit(scan_1024)
    t = timed(f"conv chain T=1024 ×{STEPS}", lambda: f2(x02))
    print(f"    → per step: {t/STEPS*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
