"""Round-3 DDPM scan decomposition on the real chip.

Questions this answers (T=944, C=384, L=20, bf16 — production shape):
  1. runtime + REMOTE COMPILE time of the live formulation (unroll=8)
  2. whether a scan-over-layers body (20x smaller HLO) costs runtime
     - compile time is the driver-timeout bottleneck: the axon backend's
       cache "hit" path deserialises as slowly as it compiles (~7 min for
       _convert_core), so the only real fix is a smaller graph
  3. what the per-step RNG (threefry inside the scan) costs      [pre-noise]
  4. what the gate transcendentals cost                          [idgate]
Differences between variants are trustworthy; absolute walls carry the
~30-50 ms tunnel round trip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


class Cfg:
    residual_layer_num = 20
    residual_channels = 384
    residual_kernel_size = 3
    dilation_cycle_length = 4
    n_mel = 100


def timed(name, fn, n=5):
    t0 = time.perf_counter()
    fn()  # compile
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:45s} {med*1000:9.1f} ms  (min {min(ts)*1000:7.1f})   compile {compile_s:7.1f} s",
          flush=True)
    return med


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from svc_inference_pipeline_tpu.models import diffsvc_fast
    from svc_inference_pipeline_tpu.sampling.ddpm import ddpm_sample
    from svc_inference_pipeline_tpu.sampling.schedule import DiffusionSchedule

    cfg = Cfg()
    T, C, L, M = 944, cfg.residual_channels, cfg.residual_layer_num, cfg.n_mel
    STEPS = 1000
    rng = np.random.default_rng(0)

    def dense(i, o):
        return {
            "kernel": jnp.asarray(rng.standard_normal((i, o)) * 0.02, jnp.float32),
            "bias": jnp.zeros((o,), jnp.float32),
        }

    params = {
        "mel_preprocess": dense(M, C),
        "skip_projection": dense(C, C),
        "output_projection": dense(C, M),
        "diffusion_embedding": {
            "projection1": dense(128, 512),
            "projection2": dense(512, 512),
        },
    }
    for i in range(L):
        params[f"residual_{i}"] = {
            "dilated_conv": {
                "kernel": jnp.asarray(rng.standard_normal((3, C, 2 * C)) * 0.02, jnp.float32),
                "bias": jnp.zeros((2 * C,), jnp.float32),
            },
            "conditioner_projection": dense(C, 2 * C),
            "output_projection": dense(C, 2 * C),
            "diffusion_projection": dense(512, C),
        }

    cond = jnp.asarray(rng.standard_normal((1, T, C)) * 0.1, jnp.float32)
    sched = DiffusionSchedule.from_factors([1e-4, 0.06, STEPS])
    key = jax.random.PRNGKey(0)
    shape = (1, T, M)

    den = diffsvc_fast.make_fast_denoise_fn(params, cond, STEPS, cfg)
    pre = diffsvc_fast.precompute(params, cond, STEPS, cfg)

    # --- 1. live formulation --------------------------------------------
    full = jax.jit(lambda k: ddpm_sample(den, cond, k, shape, sched)[0, 0, 0])
    base = timed("live: python-unrolled layers, u8", lambda: float(full(key)))

    # --- 2. scan-over-layers body ---------------------------------------
    # stack per-layer weights once; dilation via dynamic_slice into a
    # padded buffer (halo = max dilation 8); identical arithmetic.
    PADH = 8
    w1 = jnp.stack(
        [params[f"residual_{i}"]["dilated_conv"]["kernel"].astype(jnp.bfloat16).reshape(3 * C, 2 * C)
         for i in range(L)]
    )  # [L, 3C, 2C]  (tap-major rows: [left;mid;right] blocks)
    b1 = jnp.stack([params[f"residual_{i}"]["dilated_conv"]["bias"].astype(jnp.bfloat16) for i in range(L)])
    wo = jnp.stack([params[f"residual_{i}"]["output_projection"]["kernel"].astype(jnp.bfloat16) for i in range(L)])
    bo = jnp.stack([params[f"residual_{i}"]["output_projection"]["bias"].astype(jnp.bfloat16) for i in range(L)])
    dils = jnp.asarray([2 ** (i % cfg.dilation_cycle_length) for i in range(L)], jnp.int32)
    conds_l = pre.cond_projs[:, 0].astype(jnp.bfloat16)  # [L, T, 2C]

    wmel = params["mel_preprocess"]["kernel"].astype(jnp.bfloat16)
    bmel = params["mel_preprocess"]["bias"].astype(jnp.bfloat16)
    wskip = params["skip_projection"]["kernel"].astype(jnp.bfloat16)
    bskip = params["skip_projection"]["bias"].astype(jnp.bfloat16)
    wout_f = params["output_projection"]["kernel"].astype(jnp.bfloat16)
    bout_f = params["output_projection"]["bias"].astype(jnp.bfloat16)
    inv_sqrt2 = np.float32(1.0 / np.sqrt(2.0))
    inv_sqrtL = np.float32(1.0 / np.sqrt(L))

    def den_layerscan(x, _c, t):
        h = jax.nn.relu(
            jnp.dot(x[0].astype(jnp.bfloat16), wmel, preferred_element_type=jnp.float32)
            + bmel.astype(jnp.float32)
        ).astype(jnp.bfloat16)  # [T, C]
        steps_t = pre.step_rows[t[0, 0]].astype(jnp.bfloat16)  # [L, C]

        def layer(carry, inp):
            h, skip = carry
            w1_i, b1_i, wo_i, bo_i, cond_i, step_i, d = inp
            y = h + step_i
            ypad = jnp.pad(y, [(PADH, PADH), (0, 0)])
            left = jax.lax.dynamic_slice(ypad, (PADH - d, 0), (T, C))
            right = jax.lax.dynamic_slice(ypad, (PADH + d, 0), (T, C))
            y3 = jnp.concatenate([left, y, right], axis=-1)  # [T, 3C]
            a = jnp.dot(y3, w1_i, preferred_element_type=jnp.float32)
            a = a + b1_i.astype(jnp.float32) + cond_i.astype(jnp.float32)
            g = jax.nn.sigmoid(a[:, :C]) * jnp.tanh(a[:, C:])
            yo = jnp.dot(g.astype(jnp.bfloat16), wo_i, preferred_element_type=jnp.float32)
            yo = yo + bo_i.astype(jnp.float32)
            h = ((h.astype(jnp.float32) + yo[:, :C]) * inv_sqrt2).astype(jnp.bfloat16)
            return (h, skip + yo[:, C:]), None

        skip0 = jnp.zeros((T, C), jnp.float32)
        (h, skip), _ = jax.lax.scan(
            layer, (h, skip0), (w1, b1, wo, bo, conds_l, steps_t, dils)
        )
        out = skip * inv_sqrtL
        out = jax.nn.relu(
            jnp.dot(out.astype(jnp.bfloat16), wskip, preferred_element_type=jnp.float32)
            + bskip.astype(jnp.float32)
        )
        out = jnp.dot(out.astype(jnp.bfloat16), wout_f, preferred_element_type=jnp.float32)
        out = out + bout_f.astype(jnp.float32)
        return out[None].astype(jnp.float32)

    # parity check on CPU-ish quick: compare one step vs live denoiser
    x_chk = jnp.asarray(rng.standard_normal(shape) * 0.3, jnp.float32)
    t_chk = jnp.asarray([[500]], jnp.int32)
    a = den(x_chk, cond, t_chk)
    b = den_layerscan(x_chk, cond, t_chk)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"layer-scan one-step max|diff| vs live: {err:.3e}", flush=True)

    for u in (8, 4):
        f = jax.jit(
            lambda k, u=u: ddpm_sample(den_layerscan, cond, k, shape, sched, unroll=u)[0, 0, 0]
        )
        timed(f"layer-scan denoiser, u{u}", lambda f=f: float(f(key)))

    # --- 3. RNG cost: noise precomputed outside the scan -----------------
    def pre_noise(k):
        num = sched.num_steps
        k, init_key = jax.random.split(k)
        x = (1.0 / 1.2) * jax.random.normal(init_key, shape, jnp.float32)
        step_keys = jax.random.split(k, num)
        noises = jax.vmap(lambda kk: jax.random.normal(kk, shape, jnp.float32))(step_keys)
        ts = jnp.arange(num - 1, -1, -1, dtype=jnp.int32)

        def body(x, inp):
            t, nz = inp
            eps = den(x, cond, jnp.full((1, 1), t, jnp.int32))
            x0 = jnp.clip(
                sched.sqrt_recip_alphas_cumprod[t] * x
                - sched.sqrt_recipm1_alphas_cumprod[t] * eps,
                -1.0, 1.0,
            )
            mean = sched.posterior_mean_coef1[t] * x0 + sched.posterior_mean_coef2[t] * x
            nonzero = (t > 0).astype(x.dtype)
            return mean + nonzero * jnp.exp(0.5 * sched.posterior_log_variance_clipped[t]) * nz, None

        x, _ = jax.lax.scan(body, x, (ts, noises), unroll=8)
        return x[0, 0, 0]

    timed("pre-generated noise, u8", lambda: float(jax.jit(pre_noise)(key)))

    # --- 4. transcendental cost: identity gate ---------------------------
    def make_idgate_den():
        def idgate_step(x, _c, t):
            h = jax.nn.relu(diffsvc_fast._dense(params["mel_preprocess"], x.astype(jnp.bfloat16)))
            steps_t = pre.step_rows[t[0, 0]]
            t_len = x.shape[1]
            skip_sum = jnp.zeros((*h.shape[:-1], C), dtype=jnp.float32)
            for i in range(L):
                p = params[f"residual_{i}"]
                y = h + steps_t[i]
                d = 2 ** (i % cfg.dilation_cycle_length)
                w = p["dilated_conv"]["kernel"].astype(jnp.bfloat16)
                yp = jnp.pad(y, [(0, 0), (d, d), (0, 0)])
                y3 = jnp.concatenate(
                    [yp[:, :t_len], yp[:, d : d + t_len], yp[:, 2 * d : 2 * d + t_len]],
                    axis=-1,
                )
                y = y3 @ w.reshape(3 * w.shape[1], w.shape[2])
                y = y + p["dilated_conv"]["bias"].astype(jnp.bfloat16)
                y = y + pre.cond_projs[i]
                gate, filt = jnp.split(y, 2, axis=-1)
                y = gate * filt  # identity gate
                y = diffsvc_fast._dense(p["output_projection"], y)
                residual, skip = jnp.split(y, 2, axis=-1)
                h = (h + residual) * inv_sqrt2.astype(jnp.bfloat16)
                skip_sum = skip_sum + skip.astype(jnp.float32)
            out = skip_sum * inv_sqrtL
            out = jax.nn.relu(diffsvc_fast._dense(params["skip_projection"], out.astype(jnp.bfloat16)))
            out = diffsvc_fast._dense(params["output_projection"], out)
            return out.astype(jnp.float32)

        return idgate_step

    iden = make_idgate_den()

    def plain_scan(den_fn):
        def run(k):
            x = jax.random.normal(k, shape, jnp.float32)
            ts = jnp.arange(STEPS - 1, -1, -1, dtype=jnp.int32)

            def body(x, t):
                e = den_fn(x, cond, jnp.full((1, 1), t, jnp.int32))
                return e * 1e-3 + x * 0.999, None

            x, _ = jax.lax.scan(body, x, ts, unroll=8)
            return x[0, 0, 0]

        return run

    timed("control: real gate, no sampler/RNG, u8",
          lambda f=jax.jit(plain_scan(den)): float(f(key)))
    timed("idgate (no sigmoid/tanh), u8",
          lambda f=jax.jit(plain_scan(iden)): float(f(key)))


if __name__ == "__main__":
    main()
