"""Whole DiffSVC denoiser forward as ONE Pallas kernel.

The sampling scan evaluates the 20-block epsilon-predictor 1000 times; as
XLA ops that is ~120 kernels per step at ~68% MXU utilisation. This kernel
runs the complete chain — mel preprocess, 20 gated dilated-conv residual
blocks, skip reduction, output projection — in a single ``pallas_call``:

* grid = (layers,): Pallas's automatic pipelining double-buffers each
  layer's weights + precomputed conditioner block HBM→VMEM while the
  previous layer computes,
* activations (h, skip accumulator) live in VMEM scratch across grid
  iterations — they never touch HBM,
* the k=3 dilated conv is 3 shifted [T,C]×[C,2C] MXU matmuls with the
  dilation-dependent offsets computed from the layer index (dynamic
  ``pl.ds`` starts into a zero-padded activation buffer),
* gate⊙tanh, residual scaling, and the skip add fuse into the matmul
  epilogues on the VPU.

Consumes the same converted parameter pytree as models/diffsvc.py (weights
are stacked per-layer once at pipeline build). Used inside the DDPM/PLMS
scans via :func:`make_pallas_denoise_fn`; numerics match
models/diffsvc_fast.py to bf16 tolerance (parity tests).

Restrictions: kernel_size 3, dilation cycle 2^(i mod cycle), residual
channels multiple of 128, B=1 (the single-clip conversion path).
"""

from __future__ import annotations

import functools
import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from svc_inference_pipeline_tpu.models.diffsvc_fast import Precomputed, precompute

LANE = 128
PAD = 8  # max dilation halo each side (cycle length 4 → d ≤ 8)


class StackedDenoiser(NamedTuple):
    """Per-layer weights stacked for the kernel (bf16)."""

    w1: jnp.ndarray  # [L, 3, C, 2C]
    b1: jnp.ndarray  # [L, 2C]
    wout: jnp.ndarray  # [L, C, 2C]
    bout: jnp.ndarray  # [L, 2C]
    wmel: jnp.ndarray  # [M_pad, C]
    bmel: jnp.ndarray  # [C]
    wskip: jnp.ndarray  # [C, C]
    bskip: jnp.ndarray  # [C]
    wo: jnp.ndarray  # [C, M_pad]
    bo: jnp.ndarray  # [M_pad]


def stack_denoiser_params(params: Any, cfg, dtype=jnp.bfloat16) -> StackedDenoiser:
    L = cfg.residual_layer_num
    n_mel = cfg.n_mel
    m_pad = -(-n_mel // LANE) * LANE

    def cast(x):
        return jnp.asarray(x, dtype=dtype)

    w1 = jnp.stack([cast(params[f"residual_{i}"]["dilated_conv"]["kernel"]) for i in range(L)])
    b1 = jnp.stack([cast(params[f"residual_{i}"]["dilated_conv"]["bias"]) for i in range(L)])
    wout = jnp.stack([cast(params[f"residual_{i}"]["output_projection"]["kernel"]) for i in range(L)])
    bout = jnp.stack([cast(params[f"residual_{i}"]["output_projection"]["bias"]) for i in range(L)])

    wmel = cast(params["mel_preprocess"]["kernel"])
    wmel = jnp.pad(wmel, [(0, m_pad - n_mel), (0, 0)])
    bmel = cast(params["mel_preprocess"]["bias"])
    wskip = cast(params["skip_projection"]["kernel"])
    bskip = cast(params["skip_projection"]["bias"])
    wo = jnp.pad(cast(params["output_projection"]["kernel"]), [(0, 0), (0, m_pad - n_mel)])
    bo = jnp.pad(cast(params["output_projection"]["bias"]), (0, m_pad - n_mel))
    return StackedDenoiser(w1, b1, wout, bout, wmel, bmel, wskip, bskip, wo, bo)


def _make_kernel(t_len: int, c: int, n_layers: int, cycle: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    inv_sqrt2 = np.float32(1.0 / math.sqrt(2.0))
    inv_sqrt_l = np.float32(1.0 / math.sqrt(n_layers))

    def kernel(
        x_ref,  # [T, M_pad]
        step_ref,  # [1, 1, C]  (this layer's step row)
        w1_ref,  # [1, 3, C, 2C]
        b1_ref,  # [1, 1, 2C]
        cond_ref,  # [1, T, 2C]
        wout_ref,  # [1, C, 2C]
        bout_ref,  # [1, 1, 2C]
        wmel_ref,  # [M_pad, C]
        bmel_ref,  # [1, C]
        wskip_ref,  # [C, C]
        bskip_ref,  # [1, C]
        wo_ref,  # [C, M_pad]
        bo_ref,  # [1, M_pad]
        out_ref,  # [T, M_pad]
        h_pad,  # scratch [T + 2*PAD, C] bf16
        ypad,  # scratch [T + 2*PAD, C] bf16 (conv input with halo)
        skip,  # scratch [T, C] f32
    ):
        layer = pl.program_id(0)

        @pl.when(layer == 0)
        def _init():
            h0 = jnp.dot(x_ref[:], wmel_ref[:], preferred_element_type=jnp.float32)
            h0 = jnp.maximum(h0 + bmel_ref[0].astype(jnp.float32), 0.0)
            h_pad[0:PAD, :] = jnp.zeros((PAD, c), h_pad.dtype)
            h_pad[PAD + t_len :, :] = jnp.zeros((PAD, c), h_pad.dtype)
            h_pad[PAD : PAD + t_len, :] = h0.astype(h_pad.dtype)
            ypad[0:PAD, :] = jnp.zeros((PAD, c), ypad.dtype)
            ypad[PAD + t_len :, :] = jnp.zeros((PAD, c), ypad.dtype)
            skip[:] = jnp.zeros((t_len, c), jnp.float32)

        # d = 2^(layer mod cycle) — selected via a static 4-way branch
        # (Mosaic cannot prove dynamic sublane offsets aligned)
        exp = jax.lax.rem(layer, cycle)

        step_row = step_ref[0, 0].astype(jnp.float32)  # [C]
        h_center = h_pad[PAD : PAD + t_len, :].astype(jnp.float32)
        y_in = (h_center + step_row).astype(h_pad.dtype)

        # conv input goes through the ypad scratch (halo rows stay zero)
        ypad[PAD : PAD + t_len, :] = y_in

        w1 = w1_ref[0]

        # the switch only SELECTS the shifted slices (bf16) — the matmuls
        # run once outside, keeping the f32 accumulator single-instanced
        def slices_with(d_static):
            def branch(_):
                return (
                    ypad[PAD - d_static : PAD - d_static + t_len, :],
                    ypad[PAD + d_static : PAD + d_static + t_len, :],
                )

            return branch

        left, right = jax.lax.switch(
            exp, [slices_with(2**e) for e in range(cycle)], None
        )
        acc = jnp.dot(left, w1[0], preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(
            ypad[PAD : PAD + t_len, :], w1[1], preferred_element_type=jnp.float32
        )
        acc = acc + jnp.dot(right, w1[2], preferred_element_type=jnp.float32)
        acc = acc + b1_ref[0, 0].astype(jnp.float32)
        acc = acc + cond_ref[0].astype(jnp.float32)

        gate = jax.nn.sigmoid(acc[:, :c])
        filt = jnp.tanh(acc[:, c:])
        g = (gate * filt).astype(h_pad.dtype)

        yo = jnp.dot(g, wout_ref[0], preferred_element_type=jnp.float32)
        yo = yo + bout_ref[0, 0].astype(jnp.float32)
        residual = yo[:, :c]
        h_new = (h_center + residual) * inv_sqrt2
        h_pad[PAD : PAD + t_len, :] = h_new.astype(h_pad.dtype)
        skip[:] = skip[:] + yo[:, c:]

        @pl.when(layer == n_layers - 1)
        def _epilogue():
            sk = skip[:] * inv_sqrt_l
            s1 = jnp.dot(
                sk.astype(h_pad.dtype), wskip_ref[:], preferred_element_type=jnp.float32
            )
            s1 = jnp.maximum(s1 + bskip_ref[0].astype(jnp.float32), 0.0)
            out = jnp.dot(
                s1.astype(h_pad.dtype), wo_ref[:], preferred_element_type=jnp.float32
            )
            out_ref[:] = (out + bo_ref[0].astype(jnp.float32)).astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg_key", "interpret"))
def _denoise_pallas(
    stacked: StackedDenoiser,
    cond_projs: jnp.ndarray,  # [L, 1, T, 2C] (from diffsvc_fast.precompute)
    step_rows_t: jnp.ndarray,  # [L, C]
    x: jnp.ndarray,  # [1, T, n_mel]
    cfg_key,  # (n_layers, cycle, c, n_mel, t_len)
    interpret: bool = False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = interpret or jax.default_backend() != "tpu"
    n_layers, cycle, c, n_mel, t_len = cfg_key
    m_pad = -(-n_mel // LANE) * LANE
    dtype = stacked.w1.dtype

    xp = jnp.pad(x[0].astype(dtype), [(0, 0), (0, m_pad - n_mel)])  # [T, M_pad]
    conds = cond_projs[:, 0].astype(dtype)  # [L, T, 2C]

    kernel = _make_kernel(t_len, c, n_layers, cycle)
    grid = (n_layers,)

    def fixed(shape):
        # same block every grid step
        return pl.BlockSpec(shape, lambda l: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    def per_layer(shape):
        return pl.BlockSpec(
            (1, *shape), lambda l: (l, *(0 for _ in shape)), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t_len, m_pad), jnp.float32),
        grid=grid,
        in_specs=[
            fixed((t_len, m_pad)),  # x
            per_layer((1, c)),  # step rows [L,1,C]
            per_layer((3, c, 2 * c)),  # w1
            per_layer((1, 2 * c)),  # b1 [L,1,2C]
            per_layer((t_len, 2 * c)),  # cond
            per_layer((c, 2 * c)),  # wout
            per_layer((1, 2 * c)),  # bout [L,1,2C]
            fixed((m_pad, c)),  # wmel
            fixed((1, c)),  # bmel
            fixed((c, c)),  # wskip
            fixed((1, c)),  # bskip
            fixed((c, m_pad)),  # wo
            fixed((1, m_pad)),  # bo
        ],
        out_specs=fixed((t_len, m_pad)),
        scratch_shapes=[
            pltpu.VMEM((t_len + 2 * PAD, c), dtype),
            pltpu.VMEM((t_len + 2 * PAD, c), dtype),
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
        stacked.b1[:, None, :],
        conds,
        stacked.wout,
        stacked.bout[:, None, :],
        stacked.wmel,
        stacked.bmel[None, :],
        stacked.wskip,
        stacked.bskip[None, :],
        stacked.wo,
        stacked.bo[None, :],
    )
    return out[None, :, :n_mel].astype(jnp.float32)


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
    t_len = cond.shape[1]
    cfg_key = (cfg.residual_layer_num, cfg.dilation_cycle_length, c, cfg.n_mel, t_len)

    def fn(x, _cond_unused, t):
        step_rows_t = pre.step_rows[t[0, 0]]  # [L, C]
        return _denoise_pallas(stacked, pre.cond_projs, step_rows_t, x, cfg_key, interpret)

    return fn
