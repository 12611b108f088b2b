"""DDPM scan variants on the real chip: baseline vs concat-tap vs unroll."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def timed(name, fn, n=3):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{name:46s} {min(ts)*1000:9.1f} ms", flush=True)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from svc_inference_pipeline_tpu.config import DEFAULT_CONFIG, HParams, load_config
    from svc_inference_pipeline_tpu.models.diffsvc_fast import make_fast_denoise_fn, precompute, denoise_step
    from svc_inference_pipeline_tpu.models.diffsvc import DiffSVCDenoiser
    from svc_inference_pipeline_tpu.sampling.ddpm import ddpm_sample
    from svc_inference_pipeline_tpu.sampling.schedule import DiffusionSchedule
    from svc_inference_pipeline_tpu.utils.devices import fast_random_params

    cfg = load_config(DEFAULT_CONFIG)
    d = cfg.to_dict()
    d["mapper"]["noise_schedule_factors"] = [0.0001, 0.02, 200]  # 200 steps → ×5
    cfg = HParams(**d)
    mcfg = cfg.mapper

    T = 960
    den = DiffSVCDenoiser(mcfg, compute_dtype=jnp.bfloat16)
    params = fast_random_params(
        lambda: den.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 16, mcfg.n_mel)),
            jnp.zeros((1, 16, mcfg.conditioner_size)),
            jnp.zeros((1, 1), jnp.int32),
        )
    )["params"]
    params = jax.device_put(
        jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    )
    cond = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (1, T, mcfg.conditioner_size)) * 0.1
    )
    sched = DiffusionSchedule.from_config(mcfg)
    shape = (1, T, mcfg.n_mel)
    key = jax.random.PRNGKey(2)

    import math

    def dense(p, x):
        y = x @ p["kernel"].astype(x.dtype)
        if "bias" in p:
            y = y + p["bias"].astype(x.dtype)
        return y

    def make_concat_fn(params, cond):
        pre = precompute(params, cond, sched.num_steps, mcfg, jnp.bfloat16)
        L, c = mcfg.residual_layer_num, mcfg.residual_channels
        # [3, C, 2C] → [3C, 2C]
        wflat = {
            i: params[f"residual_{i}"]["dilated_conv"]["kernel"].reshape(3 * c, 2 * c)
            for i in range(L)
        }

        def fn(x, _c, tt):
            t = tt[0, 0]
            h = jax.nn.relu(dense(params["mel_preprocess"], x.astype(jnp.bfloat16)))
            steps_t = pre.step_rows[t]
            t_len = x.shape[1]
            skip_sum = jnp.zeros((*h.shape[:-1], c), dtype=jnp.float32)
            for i in range(L):
                p = params[f"residual_{i}"]
                y = h + steps_t[i]
                dd = 2 ** (i % mcfg.dilation_cycle_length)
                yp = jnp.pad(y, [(0, 0), (dd, dd), (0, 0)])
                y3 = jnp.concatenate(
                    [yp[:, :t_len], yp[:, dd : dd + t_len], yp[:, 2 * dd : 2 * dd + t_len]],
                    axis=-1,
                )  # [B, T, 3C]
                y = y3 @ wflat[i].astype(jnp.bfloat16)
                y = y + p["dilated_conv"]["bias"].astype(jnp.bfloat16)
                y = y + pre.cond_projs[i]
                gate, filt = jnp.split(y, 2, axis=-1)
                y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
                y = dense(p["output_projection"], y)
                residual, skip = jnp.split(y, 2, axis=-1)
                h = (h + residual) * np.float32(1.0 / math.sqrt(2.0)).astype(jnp.bfloat16)
                skip_sum = skip_sum + skip.astype(jnp.float32)
            out = skip_sum * np.float32(1.0 / math.sqrt(L))
            out = jax.nn.relu(dense(params["skip_projection"], out.astype(jnp.bfloat16)))
            out = dense(params["output_projection"], out)
            return out.astype(jnp.float32)

        return fn

    # params/cond/key are jit ARGUMENTS — a zero-argument jit gets
    # constant-folded by the XLA evaluator (measured: "runtime" = pure
    # dispatch round trip, compile takes minutes)
    def run(variant, unroll):
        from svc_inference_pipeline_tpu.sampling.ddpm import INIT_NOISE_STD, p_sample_step

        def go(dparams, c, k):
            fn = (make_fast_denoise_fn(dparams, c, sched.num_steps, mcfg, jnp.bfloat16)
                  if variant == "base" else make_concat_fn(dparams, c))
            k2, init_key = jax.random.split(k)
            x = INIT_NOISE_STD * jax.random.normal(init_key, shape, dtype=jnp.float32)
            step_keys = jax.random.split(k2, sched.num_steps)

            def body(xc, inp):
                t, kk = inp
                return p_sample_step(fn, sched, xc, t, c, kk), None

            ts = jnp.arange(sched.num_steps - 1, -1, -1, dtype=jnp.int32)
            out, _ = jax.lax.scan(body, x, (ts, step_keys), unroll=unroll)
            # scalar result: block_until_ready is unreliable over the tunnel —
            # fetching the scalar is the only dependable sync
            return jnp.sum(out.astype(jnp.float32)), out

        return jax.jit(go, static_argnums=())

    f_base = run("base", 1)
    timed("baseline scan (200 steps)", lambda: float(f_base(params, cond, key)[0]))
    f_cat = run("concat", 1)
    timed("concat-tap scan (200 steps)", lambda: float(f_cat(params, cond, key)[0]))
    f_u2 = run("base", 2)
    timed("baseline unroll=2 (200 steps)", lambda: float(f_u2(params, cond, key)[0]))
    f_cu2 = run("concat", 2)
    timed("concat-tap unroll=2 (200 steps)", lambda: float(f_cu2(params, cond, key)[0]), n=6)
    f_cu4 = run("concat", 4)
    timed("concat-tap unroll=4 (200 steps)", lambda: float(f_cu4(params, cond, key)[0]), n=6)
    f_cu8 = run("concat", 8)
    timed("concat-tap unroll=8 (200 steps)", lambda: float(f_cu8(params, cond, key)[0]), n=6)

    a = np.asarray(f_base(params, cond, key)[1])
    b = np.asarray(f_cat(params, cond, key)[1])
    print("concat vs baseline max err:", np.abs(a - b).max(), flush=True)


if __name__ == "__main__":
    main()
