"""Fused BigVGAN AMP conv-pair — Pallas TPU kernel.

One AMPBlock1 iteration is ``x + conv_k,1(act1d(conv_k,d(act1d(x))))``
(modules/bigvgan.py:424-433). Composed from XLA ops at the late generator
stages (C = 24…96, T up to 245k) this is ~10 ops whose NWC convolutions pad
channels to 128 lanes — measured 40–81 ms per stage for ~zero useful FLOPs.

This kernel runs the whole pair in ONE VMEM pass per tile:

* both anti-aliased snake sandwiches inline (same polyphase decomposition
  as ops/pallas/snake.py — the 2×-rate signal never exists in memory),
* both convolutions as k shifted [rows,128]×[128,128] MXU matmuls,
* the residual add fused at the end.

Valid-region bookkeeping: each act1d consumes an 8-row halo per side, the
dilated conv d·(k−1)/2, the plain conv (k−1)/2 — total halo
H = 16 + (d+1)(k−1)/2 (≤ 46 for k=11, d=5). Interior tiles read their true
neighbours through an H-halo DMA; the outermost H output rows are patched
by the caller with the exact XLA composition (global edge semantics:
replicate for the resamplers, zeros for the convs).

Restriction: C ≤ 128 (zero-padded to the 128-lane width; zero weights/bias
keep the padding lanes exactly zero), act ratios 2/2 with kernel 12.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from svc_inference_pipeline_tpu.models import bigvgan as _bg
from svc_inference_pipeline_tpu.ops.pallas.snake import _phase_taps

LANE = 128
ACT_HALO = 8


def _pair_halo(k: int, d: int) -> int:
    return 2 * ACT_HALO + (d + 1) * (k - 1) // 2


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _make_kernel(t_tile: int, k: int, d: int, taps, c_pad: int = LANE):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    even_up, odd_up, down_even, down_odd = taps
    h_exact = _pair_halo(k, d)
    # bf16 VMEM tiles need 16-row alignment — allocate a rounded halo and
    # offset the residual/output slices by the surplus
    halo = _round_up(h_exact, 16)

    def act1d(a, alpha, inv_beta):
        """[N+16, 128] → [N, 128]; snake sandwich, f32."""
        n = a.shape[0] - 2 * ACT_HALO
        n_phase = n + 6
        even = a[2 : 2 + n_phase, :] * even_up[0]
        odd = a[3 : 3 + n_phase, :] * odd_up[0]
        for m in range(1, 6):
            even = even + a[m + 2 : m + 2 + n_phase, :] * even_up[m]
            odd = odd + a[m + 3 : m + 3 + n_phase, :] * odd_up[m]
        even = 2.0 * even
        odd = 2.0 * odd
        even = even + inv_beta * jnp.square(jnp.sin(even * alpha))
        odd = odd + inv_beta * jnp.square(jnp.sin(odd * alpha))
        out = odd[0:n, :] * down_odd[0] + even[1 : 1 + n, :] * down_even[0]
        for m in range(1, 6):
            out = out + odd[m : m + n, :] * down_odd[m]
            out = out + even[m + 1 : m + 1 + n, :] * down_even[m]
        return out

    def conv(a, w_ref, b_ref, dil):
        """[N + dil(k−1), C] → [N, C]; k shifted matmuls (bf16 in, f32 acc)."""
        n = a.shape[0] - dil * (k - 1)
        ab = a.astype(w_ref.dtype)
        acc = jnp.dot(ab[0:n, :], w_ref[0], preferred_element_type=jnp.float32)
        for m in range(1, k):
            acc = acc + jnp.dot(
                ab[m * dil : m * dil + n, :], w_ref[m], preferred_element_type=jnp.float32
            )
        return acc + b_ref[0]

    def kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, act_ref, out_ref):
        bi = pl.program_id(0)
        ti = pl.program_id(1)

        def body(tile_ref, sem):
            dma = pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(ti * t_tile, t_tile + 2 * halo), :],
                tile_ref,
                sem,
            )
            dma.start()
            dma.wait()
            a0 = tile_ref[:].astype(jnp.float32)  # [t_tile + 2H, 128]

            # act params: rows = alpha1, inv_beta1, alpha2, inv_beta2
            alpha1 = act_ref[0]
            inv_b1 = act_ref[1]
            alpha2 = act_ref[2]
            inv_b2 = act_ref[3]

            a1 = act1d(a0, alpha1, inv_b1)
            a2 = conv(a1, w1_ref, b1_ref, d)
            a3 = act1d(a2, alpha2, inv_b2)
            a4 = conv(a3, w2_ref, b2_ref, 1)
            # a4[j] aligns with input row j + h_exact; the tile's outputs
            # start at input row `halo`
            surplus = halo - h_exact
            res = a0[halo : halo + t_tile, :] + a4[surplus : surplus + t_tile, :]
            out_ref[0] = res.astype(out_ref.dtype)

        pl.run_scoped(
            body,
            pltpu.VMEM((t_tile + 2 * halo, c_pad), x_hbm.dtype),
            pltpu.SemaphoreType.DMA,
        )

    return kernel, halo


def _xla_pair(x, w1, b1, w2, b2, alpha1, beta1, alpha2, beta2, k, d, kind, logscale):
    """The exact composed path (global edge semantics) — boundary oracle."""

    def act(a, al, be):
        y = _bg.upsample1d(a, 2, 12)
        y = _bg.snake(y, al, logscale) if kind == "snake" else _bg.snake_beta(y, al, be, logscale)
        return _bg.downsample1d(y, 2, 12)

    def conv(a, w, b, dil):
        pad = dil * (k - 1) // 2
        return (
            jax.lax.conv_general_dilated(
                a, w.astype(a.dtype), (1,), [(pad, pad)], rhs_dilation=(dil,),
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
            + b.astype(a.dtype)
        )

    y = act(x, alpha1, beta1)
    y = conv(y, w1, b1, d)
    y = act(y, alpha2, beta2)
    y = conv(y, w2, b2, 1)
    return x + y


@functools.partial(
    jax.jit,
    static_argnames=("k", "d", "kind", "logscale", "t_tile", "interpret", "exact_edges"),
)
def fused_amp_pair(
    x: jnp.ndarray,  # [B, T, C], C ≤ 128
    w1: jnp.ndarray,  # [k, C, C] (dilated conv)
    b1: jnp.ndarray,
    w2: jnp.ndarray,  # [k, C, C] (d=1 conv)
    b2: jnp.ndarray,
    alpha1: jnp.ndarray,
    beta1: jnp.ndarray,
    alpha2: jnp.ndarray,
    beta2: jnp.ndarray,
    k: int,
    d: int,
    kind: str = "snakebeta",
    logscale: bool = True,
    t_tile: int = 1024,
    interpret: bool = False,
    exact_edges: bool = True,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = interpret or jax.default_backend() != "tpu"

    b, t, c = x.shape
    c_pad = _round_up(c, LANE)
    assert c_pad <= 384, c  # VMEM budget: weights 2·k·C² + activation tiles
    dtype = x.dtype
    if c_pad > LANE:
        t_tile = min(t_tile, 512)  # keep activation tiles within VMEM

    kernel, halo = _make_kernel(t_tile, k, d, _phase_taps(), c_pad)

    # effective act params (exp folded for logscale), padded to 128 lanes
    def eff(al, be):
        if logscale:
            a_e = jnp.exp(al)
            b_e = jnp.exp(be) if kind == "snakebeta" else a_e
        else:
            a_e = al
            b_e = be if kind == "snakebeta" else al
        return a_e, 1.0 / (b_e + 1e-9)

    a1, ib1 = eff(alpha1, beta1)
    a2, ib2 = eff(alpha2, beta2)
    act_rows = jnp.stack(
        [
            jnp.pad(v.astype(jnp.float32), (0, c_pad - c), constant_values=1.0)
            for v in (a1, ib1, a2, ib2)
        ]
    )  # [4, c_pad]

    # weights follow the input dtype: bf16 halves the VMEM footprint on the
    # production path (matmuls still accumulate f32); f32 inputs keep exact
    # f32 weights (parity/tests)
    w_dtype = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32

    def pad_w(w):
        return jnp.pad(w.astype(w_dtype), [(0, 0), (0, c_pad - c), (0, c_pad - c)])

    def pad_b(bb):
        return jnp.pad(bb.astype(jnp.float32), (0, c_pad - c))[None, :]  # [1, c_pad]

    t_pad = -(-t // t_tile) * t_tile
    xp = jnp.pad(x, [(0, 0), (halo, halo + t_pad - t), (0, c_pad - c)])

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c_pad), dtype),
        grid=(b, t_pad // t_tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x (manual halo DMA)
            pl.BlockSpec((k, c_pad, c_pad), lambda bi, ti: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_pad), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c_pad, c_pad), lambda bi, ti: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_pad), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, c_pad), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t_tile, c_pad), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, pad_w(w1), pad_b(b1), pad_w(w2), pad_b(b2), act_rows)
    out = out[:, :t, :c]

    # exact boundary patch: the outer H rows see zero/edge padding that
    # differs from the composed path's global semantics
    if not exact_edges:
        return out
    patch = min(halo, t)
    span = min(4 * halo, t)
    head = _xla_pair(
        x[:, :span], w1, b1, w2, b2, alpha1, beta1, alpha2, beta2, k, d, kind, logscale
    )[:, :patch].astype(dtype)
    tail = _xla_pair(
        x[:, -span:], w1, b1, w2, b2, alpha1, beta1, alpha2, beta2, k, d, kind, logscale
    )[:, -patch:].astype(dtype)
    out = out.at[:, :patch, :].set(head).at[:, -patch:, :].set(tail)
    return out
