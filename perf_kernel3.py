"""Round-3: retuned whole-step Pallas denoiser vs the XLA fast path.

The XLA step runs at 0.304 ms (146 TFLOP/s, 76% bf16 peak) at the
production shape (T=944, C=384, L=20). FLOP roof is 0.226 ms; the gap is
materialised intermediates (y3 [T,3C] concat ~2.1 MB write+read per layer,
f32 pre-activations) plus per-op overheads. A VMEM-resident kernel pays
only the weight/cond stream (~3.8 MB/layer, hides under the 11 us matmul).

Round-1's kernel (ops/pallas/denoiser_step.py) ran the conv as THREE
K=384 matmuls with a switch over shifted slices — measured 0.628 ms, i.e.
2x off today's XLA. Variants here:
  v2: concat-tap — build y3 [T, 3C] in scratch (3 static-shift VMEM
      copies via a 4-way dilation switch), ONE [T,3C]@[3C,2C] matmul;
      b1 + cond folded into one VMEM add.
  v2-bf16gate: same, sigmoid/tanh evaluated in bf16.
Differences between variants are trustworthy; absolute walls carry the
~30-50 ms tunnel round trip per call (amortised over a 100-step scan).
"""

import functools
import math
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


LANE = 128
STEPS = 100  # amortise dispatch; report per-step


def make_kernel_v2(t_len, c, n_layers, cycle):
    from jax.experimental import pallas as pl

    import jax
    import jax.numpy as jnp

    inv_sqrt2 = np.float32(1.0 / math.sqrt(2.0))
    inv_sqrt_l = np.float32(1.0 / math.sqrt(n_layers))

    def kernel(
        x_ref,      # [T, M_pad]
        step_ref,   # [1, 1, C]
        w1_ref,     # [1, 3C, 2C]   (tap-major rows)
        condb_ref,  # [1, T, 2C]    (cond + b1 folded)
        wout_ref,   # [1, C, 2C]
        bout_ref,   # [1, 1, 2C]
        wmel_ref,   # [M_pad, C]
        bmel_ref,   # [1, C]
        wskip_ref,  # [C, C]
        bskip_ref,  # [1, C]
        wo_ref,     # [C, M_pad]
        bo_ref,     # [1, M_pad]
        out_ref,    # [T, M_pad]
        h_ref,      # scratch [T, C] bf16
        y3_ref,     # scratch [T, 3C] bf16   (concat-tap conv input)
        skip_ref,   # scratch [T, C] f32
    ):
        layer = pl.program_id(0)

        @pl.when(layer == 0)
        def _init():
            h0 = jnp.dot(x_ref[:], wmel_ref[:], preferred_element_type=jnp.float32)
            h0 = jnp.maximum(h0 + bmel_ref[0].astype(jnp.float32), 0.0)
            h_ref[:] = h0.astype(h_ref.dtype)
            skip_ref[:] = jnp.zeros((t_len, c), jnp.float32)

        step_row = step_ref[0, 0].astype(jnp.float32)  # [C]
        h = h_ref[:]
        y_in = (h.astype(jnp.float32) + step_row).astype(h_ref.dtype)

        # concat-tap build: [left | centre | right] with static dilation
        # shifts selected by a 4-way switch (halo rows zero-filled)
        y3_ref[:, c : 2 * c] = y_in
        exp = jax.lax.rem(layer, cycle)

        def write_taps(d):
            def branch():
                zeros = jnp.zeros((d, c), y_in.dtype)
                y3_ref[:d, :c] = zeros
                y3_ref[d:, :c] = y_in[: t_len - d]
                y3_ref[: t_len - d, 2 * c :] = y_in[d:]
                y3_ref[t_len - d :, 2 * c :] = zeros
                return 0

            return branch

        # lax.switch with side-effecting branches on refs
        jax.lax.switch(exp, [write_taps(2 ** e) for e in range(cycle)])

        acc = jnp.dot(y3_ref[:], w1_ref[0], preferred_element_type=jnp.float32)
        acc = acc + condb_ref[0].astype(jnp.float32)

        # f32 gates: bf16 sigmoid/tanh trips a Mosaic vector.broadcast
        # lowering bug, and perf_scan3 measured transcendentals at ~2% anyway
        g = jax.nn.sigmoid(acc[:, :c]) * jnp.tanh(acc[:, c:])
        g = g.astype(h_ref.dtype)

        yo = jnp.dot(g, wout_ref[0], preferred_element_type=jnp.float32)
        yo = yo + bout_ref[0, 0].astype(jnp.float32)
        h_ref[:] = ((h.astype(jnp.float32) + yo[:, :c]) * inv_sqrt2).astype(h_ref.dtype)
        skip_ref[:] = skip_ref[:] + yo[:, c:]

        @pl.when(layer == n_layers - 1)
        def _epilogue():
            sk = skip_ref[:] * inv_sqrt_l
            s1 = jnp.dot(sk.astype(h_ref.dtype), wskip_ref[:], preferred_element_type=jnp.float32)
            s1 = jnp.maximum(s1 + bskip_ref[0].astype(jnp.float32), 0.0)
            out = jnp.dot(s1.astype(h_ref.dtype), wo_ref[:], preferred_element_type=jnp.float32)
            out_ref[:] = (out + bo_ref[0].astype(jnp.float32)).astype(out_ref.dtype)

    return kernel


def build_v2_fn(params, cond, num_steps, cfg):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from svc_inference_pipeline_tpu.models.diffsvc_fast import precompute

    L, cyc, c, n_mel = (cfg.residual_layer_num, cfg.dilation_cycle_length,
                        cfg.residual_channels, cfg.n_mel)
    t_len = cond.shape[1]
    m_pad = -(-n_mel // LANE) * LANE
    dt = jnp.bfloat16

    pre = precompute(params, cond, num_steps, cfg, dt)
    w1 = jnp.stack(
        [params[f"residual_{i}"]["dilated_conv"]["kernel"].astype(dt).reshape(3 * c, 2 * c)
         for i in range(L)]
    )  # [L, 3C, 2C]
    b1 = jnp.stack([params[f"residual_{i}"]["dilated_conv"]["bias"] for i in range(L)])
    condb = (pre.cond_projs[:, 0].astype(jnp.float32) + b1[:, None, :]).astype(dt)  # [L,T,2C]
    wout = jnp.stack([params[f"residual_{i}"]["output_projection"]["kernel"].astype(dt)
                      for i in range(L)])
    bout = jnp.stack([params[f"residual_{i}"]["output_projection"]["bias"].astype(dt)
                      for i in range(L)])[:, None, :]
    wmel = jnp.pad(params["mel_preprocess"]["kernel"].astype(dt), [(0, m_pad - n_mel), (0, 0)])
    bmel = params["mel_preprocess"]["bias"].astype(dt)[None]
    wskip = params["skip_projection"]["kernel"].astype(dt)
    bskip = params["skip_projection"]["bias"].astype(dt)[None]
    wo = jnp.pad(params["output_projection"]["kernel"].astype(dt), [(0, 0), (0, m_pad - n_mel)])
    bo = jnp.pad(params["output_projection"]["bias"].astype(dt), (0, m_pad - n_mel))[None]

    kernel = make_kernel_v2(t_len, c, L, cyc)

    def fixed(shape):
        return pl.BlockSpec(shape, lambda l: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    def per_layer(shape):
        return pl.BlockSpec((1, *shape), lambda l: (l, *(0 for _ in shape)),
                            memory_space=pltpu.VMEM)

    interpret = jax.default_backend() != "tpu"

    @jax.jit
    def run_step(x, step_rows_t):
        xp = jnp.pad(x[0].astype(dt), [(0, 0), (0, m_pad - n_mel)])
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((t_len, m_pad), jnp.float32),
            grid=(L,),
            in_specs=[
                fixed((t_len, m_pad)),
                per_layer((1, c)),
                per_layer((3 * c, 2 * c)),
                per_layer((t_len, 2 * c)),
                per_layer((c, 2 * c)),
                per_layer((1, 2 * c)),
                fixed((m_pad, c)),
                fixed((1, c)),
                fixed((c, c)),
                fixed((1, c)),
                fixed((c, m_pad)),
                fixed((1, m_pad)),
            ],
            out_specs=fixed((t_len, m_pad)),
            scratch_shapes=[
                pltpu.VMEM((t_len, c), dt),
                pltpu.VMEM((t_len, 3 * c), dt),
                pltpu.VMEM((t_len, c), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(xp, step_rows_t[:, None, :].astype(dt), w1, condb, wout, bout,
          wmel, bmel, wskip, bskip, wo, bo)
        return out[None, :, :n_mel].astype(jnp.float32)

    def fn(x, _c, t):
        return run_step(x, pre.step_rows[t[0, 0]])

    return fn



def plain_scan_mod(den_fn, shape, cond):
    """Module-level scan harness (shared with perf_kernel3_prof.py)."""
    import jax
    import jax.numpy as jnp

    def run(k):
        x = jax.random.normal(k, shape, jnp.float32)
        ts = jnp.arange(STEPS - 1, -1, -1, dtype=jnp.int32)

        def body(x, t):
            e = den_fn(x, cond, jnp.full((1, 1), t, jnp.int32))
            return e * 1e-3 + x * 0.999, None

        x, _ = jax.lax.scan(body, x, ts, unroll=4)
        return x[0, 0, 0]

    return run


def timed(name, fn, n=5):
    t0 = time.perf_counter()
    fn()
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:42s} {med*1000:9.1f} ms total  {med*1000/STEPS:7.3f} ms/step  "
          f"(compile {compile_s:6.1f} s)", flush=True)
    return med


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from svc_inference_pipeline_tpu.models import diffsvc_fast
    from svc_inference_pipeline_tpu.ops.pallas.denoiser_step import make_pallas_denoise_fn

    cfg = Cfg()
    T, C, L, M = 944, cfg.residual_channels, cfg.residual_layer_num, cfg.n_mel
    rng = np.random.default_rng(0)

    def dense(i, o):
        return {
            "kernel": jnp.asarray(rng.standard_normal((i, o)) * 0.02, jnp.float32),
            "bias": jnp.asarray(rng.standard_normal((o,)) * 0.01, jnp.float32),
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
                "bias": jnp.asarray(rng.standard_normal((2 * C,)) * 0.01, jnp.float32),
            },
            "conditioner_projection": dense(C, 2 * C),
            "output_projection": dense(C, 2 * C),
            "diffusion_projection": dense(512, C),
        }

    cond = jnp.asarray(rng.standard_normal((1, T, C)) * 0.1, jnp.float32)
    key = jax.random.PRNGKey(0)
    shape = (1, T, M)

    den_xla = diffsvc_fast.make_fast_denoise_fn(params, cond, 1000, cfg)
    den_p1 = make_pallas_denoise_fn(params, cond, 1000, cfg)
    den_v2 = build_v2_fn(params, cond, 1000, cfg)

    # parity first (one step, t=500)
    x_chk = jnp.asarray(rng.standard_normal(shape) * 0.3, jnp.float32)
    t_chk = jnp.asarray([[500]], jnp.int32)
    ref = den_xla(x_chk, cond, t_chk)
    scale = float(jnp.max(jnp.abs(ref)))
    for nm, d in [("pallas-r1", den_p1), ("v2", den_v2)]:
        err = float(jnp.max(jnp.abs(d(x_chk, cond, t_chk) - ref)))
        print(f"parity {nm:14s} max|diff|={err:.3e}  (ref scale {scale:.2f})", flush=True)

    for nm, d in [("xla fast path", den_xla), ("pallas-r1 (3x K=384)", den_p1),
                  ("pallas-v2 concat-tap", den_v2)]:
        f = jax.jit(plain_scan_mod(d, shape, cond))
        timed(nm, lambda f=f: float(f(key)))


if __name__ == "__main__":
    main()
