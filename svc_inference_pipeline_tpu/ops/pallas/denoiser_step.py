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

# A/B switch (perf_scanstep.py): draw all 1000 step noises in one vmapped
# threefry before the scan instead of per-step inside it. Bit-identical
# draws either way; trades transient HBM (steps × B × T × M_pad f32 —
# ~0.5 GB at the production 10 s single-clip shape) for the per-step RNG
# time. Falls back to per-step draws above _PREDRAW_Z_MAX_BYTES so long
# clips / big serving batches never balloon peak memory.
_PREDRAW_Z = True
_PREDRAW_Z_MAX_BYTES = 768 * 1024 * 1024


class StackedDenoiser(NamedTuple):
    """Per-layer weights stacked for the kernel (compute dtype).

    When quantised (``stack_denoiser_params(..., quantize="int8")``) the
    two hot matmul weights w1/wout are symmetric per-output-channel int8
    and ``w1s``/``wouts`` carry their f32 column scales; everything else
    (biases, the once-per-step mel/skip/output projections) stays at the
    compute dtype. int8 runs the MXU at 2x the bf16 rate (int32
    accumulation), halving the per-step FLOP roof of the 1000-step scan.
    """

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
    w1s: Any = None  # [L, 1, 2C] f32 — int8 column scales (quantized only)
    wouts: Any = None  # [L, 1, 2C] f32


def _quantize_cols(w):
    """Symmetric per-output-channel int8: w ≈ q * s, q ∈ [-127, 127]."""
    w = jnp.asarray(w, jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True), 1e-12) / 127.0
    q = jnp.clip(jnp.rint(w / s), -127, 127).astype(jnp.int8)
    return q, s


def stack_denoiser_params(
    params: Any, cfg, dtype=jnp.bfloat16, quantize: str | None = None
) -> StackedDenoiser:
    L = cfg.residual_layer_num
    c = cfg.residual_channels
    n_mel = cfg.n_mel
    m_pad = -(-n_mel // LANE) * LANE

    def cast(x):
        return jnp.asarray(x, dtype=dtype)

    w1_f = [
        jnp.asarray(params[f"residual_{i}"]["dilated_conv"]["kernel"], jnp.float32)
        .reshape(3 * c, 2 * c)
        for i in range(L)
    ]
    wout_f = [
        jnp.asarray(params[f"residual_{i}"]["output_projection"]["kernel"], jnp.float32)
        for i in range(L)
    ]
    w1s = wouts = None
    if quantize in ("int8", "int8-w1"):
        q1 = [_quantize_cols(w) for w in w1_f]
        w1 = jnp.stack([q for q, _ in q1])
        w1s = jnp.stack([s for _, s in q1])
        if quantize == "int8":
            qo = [_quantize_cols(w) for w in wout_f]
            wout = jnp.stack([q for q, _ in qo])
            wouts = jnp.stack([s for _, s in qo])
        else:
            # mixed mode: the output projection stays at the compute dtype
            # — it carries ~2/3 of the int8 weight-rounding error at 1/3
            # of the matmul FLOPs (perf_int8_iso.py)
            wout = jnp.stack([w.astype(dtype) for w in wout_f])
    elif quantize is None:
        w1 = jnp.stack([w.astype(dtype) for w in w1_f])
        wout = jnp.stack([w.astype(dtype) for w in wout_f])
    else:
        raise ValueError(
            f"unknown quantize mode {quantize!r} (use None, 'int8' or 'int8-w1')"
        )
    b1 = jnp.stack(
        [jnp.asarray(params[f"residual_{i}"]["dilated_conv"]["bias"], jnp.float32)
         for i in range(L)]
    )
    bout = jnp.stack([cast(params[f"residual_{i}"]["output_projection"]["bias"]) for i in range(L)])[:, None, :]

    wmel = cast(params["mel_preprocess"]["kernel"])
    wmel = jnp.pad(wmel, [(0, m_pad - n_mel), (0, 0)])
    bmel = cast(params["mel_preprocess"]["bias"])[None]
    wskip = cast(params["skip_projection"]["kernel"])
    bskip = cast(params["skip_projection"]["bias"])[None]
    wo = jnp.pad(cast(params["output_projection"]["kernel"]), [(0, 0), (0, m_pad - n_mel)])
    bo = jnp.pad(cast(params["output_projection"]["bias"]), (0, m_pad - n_mel))[None]
    return StackedDenoiser(w1, b1, wout, bout, wmel, bmel, wskip, bskip, wo, bo,
                           w1s, wouts)


def _make_kernel(t_len: int, c: int, n_layers: int, cycle: int,
                 fused: bool = False, quant1: bool = False,
                 quant2: bool = False):
    from jax.experimental import pallas as pl

    inv_sqrt2 = np.float32(1.0 / math.sqrt(2.0))
    inv_sqrt_l = np.float32(1.0 / math.sqrt(n_layers))

    def kernel(*refs):
        # x_ref  [1, T, M_pad] — this batch element (f32 carry when fused,
        #                        compute dtype otherwise)
        # step_ref [1, 1, C], w1_ref [1, 3C, 2C], condb_ref [1, 1, T, 2C]
        # wout_ref [1, C, 2C], bout_ref [1, 1, 2C], wmel/bmel, wskip/bskip,
        # wo/bo — the stacked weights; fused adds z_ref [1, T, M_pad] (f32
        # step noise) and s_ref [1, 5] (SMEM schedule scalars for step t:
        # sqrt(1/acum), sqrt(1/acum - 1), post_coef1, post_coef2, sigma);
        # quant1/quant2 add w1s_ref/wouts_ref [1, 1, 2C] f32 int8 column
        # scales (each present only when its matmul is quantized).
        refs = list(refs)
        if quant1:
            w1s_ref = refs.pop(12)
        if quant2:
            wouts_ref = refs.pop(12)
        if fused:
            (x_ref, step_ref, w1_ref, condb_ref, wout_ref, bout_ref,
             wmel_ref, bmel_ref, wskip_ref, bskip_ref, wo_ref, bo_ref,
             z_ref, s_ref, out_ref, h_ref, y3_ref, skip_ref) = refs
        else:
            (x_ref, step_ref, w1_ref, condb_ref, wout_ref, bout_ref,
             wmel_ref, bmel_ref, wskip_ref, bskip_ref, wo_ref, bo_ref,
             out_ref, h_ref, y3_ref, skip_ref) = refs
        layer = pl.program_id(1)

        @pl.when(layer == 0)
        def _init():
            xin = x_ref[0]
            if fused:  # carry arrives f32; same cast the wrapper used to do
                xin = xin.astype(h_ref.dtype)
            h0 = jnp.dot(xin, wmel_ref[:], preferred_element_type=jnp.float32)
            h0 = jnp.maximum(h0 + bmel_ref[0].astype(jnp.float32), 0.0)
            h_ref[:] = h0.astype(h_ref.dtype)
            skip_ref[:] = jnp.zeros((t_len, c), jnp.float32)

        step_row = step_ref[0, 0].astype(jnp.float32)  # [C]
        h = h_ref[:]
        y_f = h.astype(jnp.float32) + step_row

        if quant1:
            # dynamic symmetric per-tensor int8 for the conv input: one
            # VPU max-reduction (~0.4 µs at [944,384]) buys an int8 MXU
            # matmul at 2x the bf16 rate. Finer activation scales measure
            # NO accuracy gain: a per-row (per-time-step) variant for both
            # matmuls reproduced the per-tensor chain's error to 6 digits
            # (perf_int8_iso.py — the int8 error is entirely WEIGHT
            # rounding) while costing +33 µs/step, so per-tensor stays.
            s_y = jnp.maximum(jnp.max(jnp.abs(y_f)), 1e-12) * (1.0 / 127.0)
            y_in = jnp.clip(jnp.rint(y_f * (1.0 / s_y)), -127.0, 127.0).astype(
                jnp.int8
            )
        else:
            y_in = y_f.astype(h_ref.dtype)

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
        if quant1:
            acc = jnp.dot(y3_ref[:], w1_ref[0], preferred_element_type=jnp.int32)
            acc = acc.astype(jnp.float32) * (s_y * w1s_ref[0, 0])
        else:
            acc = jnp.dot(y3_ref[:], w1_ref[0], preferred_element_type=jnp.float32)
        acc = acc + condb_ref[0, 0].astype(jnp.float32)
        gf = jax.nn.sigmoid(acc[:, :c]) * jnp.tanh(acc[:, c:])

        if quant2:
            # the gate output is bounded in (-1, 1) — static 1/127 scale,
            # no reduction needed (finer scales: no measured gain, above)
            gq = jnp.clip(jnp.rint(gf * 127.0), -127.0, 127.0).astype(jnp.int8)
            yo = jnp.dot(gq, wout_ref[0], preferred_element_type=jnp.int32)
            yo = yo.astype(jnp.float32) * (wouts_ref[0, 0] * (1.0 / 127.0))
        else:
            g = gf.astype(wout_ref.dtype)
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
            out = out + bo_ref[0].astype(jnp.float32)
            if fused:
                # the whole ancestral DDPM update, still in VMEM — the
                # sampler's x̂₀/posterior element-wise pass never round-trips
                # HBM (diffsvcrepo_inference.py:36-88 numerics: clamp, then
                # posterior mean + σ·z; σ is 0 at t=0, folded into s_ref[4])
                xf = x_ref[0]
                x0 = jnp.clip(s_ref[0, 0] * xf - s_ref[0, 1] * out, -1.0, 1.0)
                out_ref[0] = s_ref[0, 2] * x0 + s_ref[0, 3] * xf + s_ref[0, 4] * z_ref[0]
            else:
                out_ref[0] = out.astype(out_ref.dtype)

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
    quant1 = stacked.w1.dtype == jnp.int8
    quant2 = stacked.wout.dtype == jnp.int8
    dtype = stacked.wmel.dtype  # compute dtype (== w1.dtype unless int8)
    b = x.shape[0]

    xp = jnp.pad(x.astype(dtype), [(0, 0), (0, 0), (0, m_pad - n_mel)])  # [B, T, M_pad]

    kernel = _make_kernel(t_len, c, n_layers, cycle, quant1=quant1, quant2=quant2)
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

    scale_specs = [per_layer((1, 2 * c))] * (int(quant1) + int(quant2))
    scale_args = ([stacked.w1s] if quant1 else []) + (
        [stacked.wouts] if quant2 else []
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
            *scale_specs,  # w1s, wouts [L,1,2C] f32 (quantized only)
        ],
        out_specs=per_batch((t_len, m_pad)),
        scratch_shapes=[
            pltpu.VMEM((t_len, c), dtype),
            pltpu.VMEM((t_len, 3 * c), stacked.w1.dtype),
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
        *scale_args,
    )
    return out[:, :, :n_mel].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg_key", "interpret"))
def _ddpm_step_pallas(
    stacked: StackedDenoiser,
    condb: jnp.ndarray,  # [B, L, T, 2C]
    step_rows_t: jnp.ndarray,  # [L, C]
    x: jnp.ndarray,  # [B, T, M_pad] f32 — padded sampler carry
    z: jnp.ndarray,  # [B, T, M_pad] f32 — this step's noise (pad channels 0)
    srow: jnp.ndarray,  # [5] f32 — schedule scalars for step t
    cfg_key,
    interpret: bool = False,
):
    """Denoiser forward + ancestral DDPM update x_t → x_{t−1}, one kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = interpret or jax.default_backend() != "tpu"
    n_layers, cycle, c, n_mel, t_len = cfg_key
    m_pad = -(-n_mel // LANE) * LANE
    quant1 = stacked.w1.dtype == jnp.int8
    quant2 = stacked.wout.dtype == jnp.int8
    dtype = stacked.wmel.dtype  # compute dtype (== w1.dtype unless int8)
    b = x.shape[0]

    kernel = _make_kernel(
        t_len, c, n_layers, cycle, fused=True, quant1=quant1, quant2=quant2
    )
    grid = (b, n_layers)

    def fixed(shape):
        return pl.BlockSpec(shape, lambda bi, l: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    def per_layer(shape):
        return pl.BlockSpec(
            (1, *shape), lambda bi, l: (l, *(0 for _ in shape)), memory_space=pltpu.VMEM
        )

    def per_batch(shape):
        return pl.BlockSpec(
            (1, *shape), lambda bi, l: (bi, *(0 for _ in shape)), memory_space=pltpu.VMEM
        )

    scale_specs = [per_layer((1, 2 * c))] * (int(quant1) + int(quant2))
    scale_args = ([stacked.w1s] if quant1 else []) + (
        [stacked.wouts] if quant2 else []
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t_len, m_pad), jnp.float32),
        grid=grid,
        in_specs=[
            per_batch((t_len, m_pad)),  # x (f32 carry)
            per_layer((1, c)),  # step rows [L,1,C]
            per_layer((3 * c, 2 * c)),  # w1
            pl.BlockSpec(
                (1, 1, t_len, 2 * c), lambda bi, l: (bi, l, 0, 0), memory_space=pltpu.VMEM
            ),
            per_layer((c, 2 * c)),  # wout
            per_layer((1, 2 * c)),  # bout
            fixed((m_pad, c)),  # wmel
            fixed((1, c)),  # bmel
            fixed((c, c)),  # wskip
            fixed((1, c)),  # bskip
            fixed((c, m_pad)),  # wo
            fixed((1, m_pad)),  # bo
            *scale_specs,  # w1s, wouts [L,1,2C] f32 (quantized only)
            per_batch((t_len, m_pad)),  # z
            pl.BlockSpec((1, 5), lambda bi, l: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=per_batch((t_len, m_pad)),
        scratch_shapes=[
            pltpu.VMEM((t_len, c), dtype),
            pltpu.VMEM((t_len, 3 * c), stacked.w1.dtype),
            pltpu.VMEM((t_len, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x,
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
        *scale_args,
        z,
        srow[None].astype(jnp.float32),
    )


def _ddpm_sample_fused(stacked, condb, step_rows, key, shape, schedule, cfg_key,
                       interpret: bool = False, unroll: int = 8,
                       stacked_fp=None, tail: int = 0):
    """Full ancestral DDPM reverse process with the sampler update fused
    into the denoiser kernel's epilogue.

    Key-split order, noise-draw shapes, and f32 update math are identical
    to :func:`sampling.ddpm.ddpm_sample` (same PRNG keys → bit-identical
    noise), so this path is interchangeable with the scan+kernel
    composition it replaces — it just keeps the [B,T,M] carry padded to
    the lane boundary and never materialises ε, x̂₀, or the posterior mean
    to HBM. Per-step schedule scalars ride a precomputed [steps, 5] table
    through the scan's xs.

    ``stacked_fp`` + ``tail``: mixed-precision chain — the first
    ``num_steps − tail`` steps run on ``stacked`` (int8) and the LAST
    ``tail`` steps on ``stacked_fp`` (full compute dtype). The late steps
    set the fine detail of the final mel, so a short full-precision tail
    recovers most of the int8 weight-rounding error at ~tail/num_steps of
    the bf16 cost (measured: perf_int8_iso.py / perf_int8.py).
    """
    from svc_inference_pipeline_tpu.sampling.ddpm import INIT_NOISE_STD

    n_layers, cycle, c, n_mel, t_len = cfg_key
    m_pad = -(-n_mel // LANE) * LANE
    num_steps = schedule.num_steps
    pad = [(0, 0), (0, 0), (0, m_pad - n_mel)]

    key, init_key = jax.random.split(key)
    x = INIT_NOISE_STD * jax.random.normal(init_key, tuple(shape), dtype=jnp.float32)
    x = jnp.pad(x, pad)
    step_keys = jax.random.split(key, num_steps)

    # Pre-draw every step's z in ONE vmapped threefry (bit-identical to the
    # per-step draws: same key → same bits) and pre-pad to the lane
    # boundary, so the scan body reads a slice instead of running 1000
    # small latency-bound RNG fusions (~4.5 ms/conversion on v5e).
    # [steps, B, T, M_pad] f32 ≈ 0.5 GB at production shapes — transient.
    z_bytes = num_steps * int(np.prod(shape[:-1])) * m_pad * 4
    predraw = _PREDRAW_Z and z_bytes <= _PREDRAW_Z_MAX_BYTES
    predrawn_zs = None
    if predraw:
        predrawn_zs = jax.vmap(
            lambda k: jnp.pad(
                jax.random.normal(k, tuple(shape), dtype=jnp.float32), pad
            )
        )(step_keys)

    ts = jnp.arange(num_steps - 1, -1, -1, dtype=jnp.int32)
    sigma = jnp.where(
        ts > 0, jnp.exp(0.5 * schedule.posterior_log_variance_clipped[ts]), 0.0
    )
    rows = jnp.stack(
        [
            schedule.sqrt_recip_alphas_cumprod[ts],
            schedule.sqrt_recipm1_alphas_cumprod[ts],
            schedule.posterior_mean_coef1[ts],
            schedule.posterior_mean_coef2[ts],
            sigma,
        ],
        axis=1,
    ).astype(jnp.float32)  # [steps, 5]

    def body_for(st):
        def body(x, inp):
            if predraw:
                t, z, srow = inp
            else:
                t, k, srow = inp
                z = jax.random.normal(k, tuple(shape), dtype=jnp.float32)  # same draw
                z = jnp.pad(z, pad)
            x = _ddpm_step_pallas(
                st, condb, step_rows[t], x, z, srow, cfg_key, interpret
            )
            return x, None

        return body

    xs = (ts, predrawn_zs if predraw else step_keys, rows)
    tail = int(min(max(tail, 0), num_steps)) if stacked_fp is not None else 0

    def run_scan(st, x0, seg_xs, n):
        unroll_eff = max(u for u in range(1, unroll + 1) if n % u == 0)
        out, _ = jax.lax.scan(body_for(st), x0, seg_xs, unroll=unroll_eff)
        return out

    if tail == 0:
        x = run_scan(stacked, x, xs, num_steps)
    else:
        split = num_steps - tail
        if split > 0:
            xs1 = jax.tree.map(lambda a: a[:split], xs)
            x = run_scan(stacked, x, xs1, split)
        xs2 = jax.tree.map(lambda a: a[split:], xs)
        x = run_scan(stacked_fp, x, xs2, tail)
    return x[:, :, :n_mel]


def make_pallas_denoise_fn(params: Any, cond: jnp.ndarray, num_steps: int, cfg,
                           compute_dtype=jnp.bfloat16, interpret: bool = False,
                           quantize: str | None = None,
                           quantize_tail: int = 0):
    """Sampler-compatible denoise_fn backed by the fused kernel.

    Falls back (by raising at build) if the shape restrictions don't hold.
    ``quantize="int8"`` runs the two hot per-layer matmuls on int8 MXU
    (per-output-channel weight scales, dynamic per-tensor activation
    scale) — ~2x the bf16 MXU rate at a measured quality cost (see
    tests/test_int8_denoiser.py and perf_int8.py). ``quantize_tail=K``
    (DDPM fused path only) runs the LAST K reverse steps at the full
    compute dtype — the int8 error is weight rounding that the late
    steps largely repair (perf_int8_iso.py), so a short tail buys the
    quality gate at ~K/num_steps of the bf16 cost.
    """
    c = cfg.residual_channels
    assert c % LANE == 0, c
    assert cfg.residual_kernel_size == 3

    pre = precompute(params, cond, num_steps, cfg, compute_dtype)
    stacked = stack_denoiser_params(params, cfg, compute_dtype, quantize=quantize)
    stacked_fp = (
        stack_denoiser_params(params, cfg, compute_dtype)
        if quantize and quantize_tail > 0
        else None
    )
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

    # DDPM gets a whole-sampler fast path: the ancestral update runs in the
    # kernel epilogue (ε/x̂₀/posterior never touch HBM). Other samplers
    # (PLMS/DDIM/DPM++ multistep histories) keep composing with ``fn``.
    fn.fused_ddpm = functools.partial(
        _ddpm_sample_fused, stacked, condb, pre.step_rows,
        cfg_key=cfg_key, interpret=interpret,
        stacked_fp=stacked_fp, tail=quantize_tail,
    )
    return fn
