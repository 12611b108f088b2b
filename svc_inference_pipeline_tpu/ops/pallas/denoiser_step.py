"""Whole DiffSVC denoiser forward as ONE Pallas kernel.

The sampling scan evaluates the 20-block epsilon-predictor 1000 times; as
XLA ops that is ~120 kernels per step with the [T,3C] concat-tap conv
input and the f32 pre-activations materialised to HBM every layer. This
kernel runs the complete chain — mel preprocess, 20 gated dilated-conv
residual blocks, skip reduction, output projection — in a single
``pallas_call``:

* grid = (batch, layers): Pallas's automatic pipelining double-buffers
  each layer's weights + precomputed conditioner block HBM→VMEM while
  the previous layer computes; batch elements run as outer grid steps
  over the same VMEM scratch (re-initialised at layer 0),
* activations (h, the concat-tap conv input y3, the skip accumulator)
  live in VMEM scratch across grid iterations — they never touch HBM,
* the k=3 dilated conv is ONE [T,3C]@[3C,2C] MXU matmul (tap-major rows);
  the three taps are built in VMEM by static-shift copies selected from a
  4-way dilation switch (Mosaic needs static sublane offsets),
* the dilated-conv bias is folded into the precomputed conditioner block
  (one add instead of two),
* gate⊙tanh, residual scaling, and the skip add run on the VPU between
  the two matmuls.

Measured on the v5e at the production shape (T=944, C=384, L=20, bf16,
profiled device time): 261.9 us/step vs 281.7 us for the XLA fast path
(models/diffsvc_fast.py) — a 7% step win, ~20 ms over a DDPM-1000
conversion (perf_kernel3_prof.py; FLOP roof is 226 us). Round-1's variant
of this kernel (three K=C matmuls over a switch of shifted slices) was
316 us — the concat-tap rewrite is what crosses XLA.

Consumes the same converted parameter pytree as models/diffsvc.py. Used
inside the DDPM/PLMS scans via :func:`make_pallas_denoise_fn`; numerics
match models/diffsvc_fast.py to compute-dtype tolerance (parity tests).

Restrictions: kernel_size 3, dilation cycle 2^(i mod cycle), residual
channels multiple of 128. Any batch size (B>1 = batched serving).
Reference behaviour being accelerated: the per-step denoiser of
/root/reference/modules/diffsvc.py:60-130 inside the 1000-step loop of
/root/reference/modules/diffsvcrepo_inference.py:234-240.
"""

from __future__ import annotations

import functools
import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from svc_inference_pipeline_tpu.models.diffsvc_fast import precompute

LANE = 128


class StackedDenoiser(NamedTuple):
    """Per-layer weights stacked for the kernel (compute dtype)."""

    w1: jnp.ndarray  # [L, 3C, 2C]  (tap-major rows: [left; mid; right])
    b1: jnp.ndarray  # [L, 2C]      (f32 — folded into the cond block)
    wout: jnp.ndarray  # [L, C, 2C]
    bout: jnp.ndarray  # [L, 1, 2C]
    wmel: jnp.ndarray  # [M_pad, C]
    bmel: jnp.ndarray  # [1, C]
    wskip: jnp.ndarray  # [C, C]
    bskip: jnp.ndarray  # [1, C]
    wo: jnp.ndarray  # [C, M_pad]
    bo: jnp.ndarray  # [1, M_pad]


def stack_denoiser_params(params: Any, cfg, dtype=jnp.bfloat16) -> StackedDenoiser:
    L = cfg.residual_layer_num
    c = cfg.residual_channels
    n_mel = cfg.n_mel
    m_pad = -(-n_mel // LANE) * LANE

    def cast(x):
        return jnp.asarray(x, dtype=dtype)

    w1 = jnp.stack(
        [cast(params[f"residual_{i}"]["dilated_conv"]["kernel"]).reshape(3 * c, 2 * c)
         for i in range(L)]
    )
    b1 = jnp.stack(
        [jnp.asarray(params[f"residual_{i}"]["dilated_conv"]["bias"], jnp.float32)
         for i in range(L)]
    )
    wout = jnp.stack([cast(params[f"residual_{i}"]["output_projection"]["kernel"]) for i in range(L)])
    bout = jnp.stack([cast(params[f"residual_{i}"]["output_projection"]["bias"]) for i in range(L)])[:, None, :]

    wmel = cast(params["mel_preprocess"]["kernel"])
    wmel = jnp.pad(wmel, [(0, m_pad - n_mel), (0, 0)])
    bmel = cast(params["mel_preprocess"]["bias"])[None]
    wskip = cast(params["skip_projection"]["kernel"])
    bskip = cast(params["skip_projection"]["bias"])[None]
    wo = jnp.pad(cast(params["output_projection"]["kernel"]), [(0, 0), (0, m_pad - n_mel)])
    bo = jnp.pad(cast(params["output_projection"]["bias"]), (0, m_pad - n_mel))[None]
    return StackedDenoiser(w1, b1, wout, bout, wmel, bmel, wskip, bskip, wo, bo)


def _make_kernel(t_len: int, c: int, n_layers: int, cycle: int):
    from jax.experimental import pallas as pl

    inv_sqrt2 = np.float32(1.0 / math.sqrt(2.0))
    inv_sqrt_l = np.float32(1.0 / math.sqrt(n_layers))

    def kernel(
        x_ref,      # [1, T, M_pad]  (this batch element)
        step_ref,   # [1, 1, C]   (this layer's step row)
        w1_ref,     # [1, 3C, 2C]
        condb_ref,  # [1, 1, T, 2C]  (conditioner projection + conv bias)
        wout_ref,   # [1, C, 2C]
        bout_ref,   # [1, 1, 2C]
        wmel_ref,   # [M_pad, C]
        bmel_ref,   # [1, C]
        wskip_ref,  # [C, C]
        bskip_ref,  # [1, C]
        wo_ref,     # [C, M_pad]
        bo_ref,     # [1, M_pad]
        out_ref,    # [1, T, M_pad]
        h_ref,      # scratch [T, C]  compute dtype
        y3_ref,     # scratch [T, 3C] compute dtype (concat-tap conv input)
        skip_ref,   # scratch [T, C]  f32
    ):
        layer = pl.program_id(1)

        @pl.when(layer == 0)
        def _init():
            h0 = jnp.dot(x_ref[0], wmel_ref[:], preferred_element_type=jnp.float32)
            h0 = jnp.maximum(h0 + bmel_ref[0].astype(jnp.float32), 0.0)
            h_ref[:] = h0.astype(h_ref.dtype)
            skip_ref[:] = jnp.zeros((t_len, c), jnp.float32)

        step_row = step_ref[0, 0].astype(jnp.float32)  # [C]
        h = h_ref[:]
        y_in = (h.astype(jnp.float32) + step_row).astype(h_ref.dtype)

        # concat-tap build: [left | centre | right], the dilation shift
        # selected by a static 4-way switch (Mosaic requires static
        # sublane offsets; halo rows are zero-filled = the conv's padding)
        y3_ref[:, c : 2 * c] = y_in

        def write_taps(d):
            def branch():
                zeros = jnp.zeros((d, c), y_in.dtype)
                y3_ref[:d, :c] = zeros
                y3_ref[d:, :c] = y_in[: t_len - d]
                y3_ref[: t_len - d, 2 * c :] = y_in[d:]
                y3_ref[t_len - d :, 2 * c :] = zeros
                return 0

            return branch

        exp = jax.lax.rem(layer, cycle)
        jax.lax.switch(exp, [write_taps(2 ** e) for e in range(cycle)])

        # ONE deep-K matmul for the whole dilated conv; bias pre-folded
        # into the conditioner block. f32 gates: bf16 transcendentals trip
        # a Mosaic lowering bug and measure ~2% anyway (perf_scan3).
        acc = jnp.dot(y3_ref[:], w1_ref[0], preferred_element_type=jnp.float32)
        acc = acc + condb_ref[0, 0].astype(jnp.float32)
        g = (jax.nn.sigmoid(acc[:, :c]) * jnp.tanh(acc[:, c:])).astype(h_ref.dtype)

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
            out_ref[0] = (out + bo_ref[0].astype(jnp.float32)).astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg_key", "interpret"))
def _denoise_pallas(
    stacked: StackedDenoiser,
    condb: jnp.ndarray,  # [B, L, T, 2C] — cond projection + conv bias, compute dtype
    step_rows_t: jnp.ndarray,  # [L, C]
    x: jnp.ndarray,  # [B, T, n_mel]
    cfg_key,  # (n_layers, cycle, c, n_mel, t_len)
    interpret: bool = False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = interpret or jax.default_backend() != "tpu"
    n_layers, cycle, c, n_mel, t_len = cfg_key
    m_pad = -(-n_mel // LANE) * LANE
    dtype = stacked.w1.dtype
    b = x.shape[0]

    xp = jnp.pad(x.astype(dtype), [(0, 0), (0, 0), (0, m_pad - n_mel)])  # [B, T, M_pad]

    kernel = _make_kernel(t_len, c, n_layers, cycle)
    grid = (b, n_layers)  # layer innermost: scratch carries across layers per clip

    def fixed(shape):
        # same block every grid step
        return pl.BlockSpec(shape, lambda bi, l: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    def per_layer(shape):
        return pl.BlockSpec(
            (1, *shape), lambda bi, l: (l, *(0 for _ in shape)), memory_space=pltpu.VMEM
        )

    def per_batch(shape):
        return pl.BlockSpec(
            (1, *shape), lambda bi, l: (bi, *(0 for _ in shape)), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t_len, m_pad), jnp.float32),
        grid=grid,
        in_specs=[
            per_batch((t_len, m_pad)),  # x
            per_layer((1, c)),  # step rows [L,1,C]
            per_layer((3 * c, 2 * c)),  # w1
            pl.BlockSpec(  # cond + b1 [B,L,T,2C]
                (1, 1, t_len, 2 * c), lambda bi, l: (bi, l, 0, 0), memory_space=pltpu.VMEM
            ),
            per_layer((c, 2 * c)),  # wout
            per_layer((1, 2 * c)),  # bout [L,1,2C]
            fixed((m_pad, c)),  # wmel
            fixed((1, c)),  # bmel
            fixed((c, c)),  # wskip
            fixed((1, c)),  # bskip
            fixed((c, m_pad)),  # wo
            fixed((1, m_pad)),  # bo
        ],
        out_specs=per_batch((t_len, m_pad)),
        scratch_shapes=[
            pltpu.VMEM((t_len, c), dtype),
            pltpu.VMEM((t_len, 3 * c), dtype),
            pltpu.VMEM((t_len, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        xp,
        step_rows_t.astype(dtype)[:, None, :],
        stacked.w1,
        condb,
        stacked.wout,
        stacked.bout,
        stacked.wmel,
        stacked.bmel,
        stacked.wskip,
        stacked.bskip,
        stacked.wo,
        stacked.bo,
    )
    return out[:, :, :n_mel].astype(jnp.float32)


def make_pallas_denoise_fn(params: Any, cond: jnp.ndarray, num_steps: int, cfg,
                           compute_dtype=jnp.bfloat16, interpret: bool = False):
    """Sampler-compatible denoise_fn backed by the fused kernel.

    Falls back (by raising at build) if the shape restrictions don't hold.
    """
    c = cfg.residual_channels
    assert c % LANE == 0, c
    assert cfg.residual_kernel_size == 3

    pre = precompute(params, cond, num_steps, cfg, compute_dtype)
    stacked = stack_denoiser_params(params, cfg, compute_dtype)
    # fold the dilated-conv bias into the conditioner block: one VMEM add
    # per layer instead of two; [L,B,T,2C] -> batch-major [B,L,T,2C]
    condb = (pre.cond_projs.astype(jnp.float32)
             + stacked.b1[:, None, None, :]).astype(compute_dtype)
    condb = jnp.swapaxes(condb, 0, 1)  # [B, L, T, 2C]
    t_len = cond.shape[1]
    cfg_key = (cfg.residual_layer_num, cfg.dilation_cycle_length, c, cfg.n_mel, t_len)

    def fn(x, _cond_unused, t):
        step_rows_t = pre.step_rows[t[0, 0]]  # [L, C]
        return _denoise_pallas(stacked, condb, step_rows_t, x, cfg_key, interpret)

    return fn
