"""Fused BigVGAN AMP *stage* — Pallas TPU mega-kernel.

One generator upsampling stage averages three parallel AMPBlock1 stacks
(/root/reference/modules/bigvgan.py:563-575,609-615); each block is three
sequential act→conv→act→conv→add pairs (bigvgan.py:424-433). Composed from
per-pair kernels (ops/pallas/amp_pair.py) that is 9 pallas calls + 18 tiny
XLA boundary patches per stage, each round-tripping the [T, C] activation
through HBM. At the late stages (C = 24…96, T up to 245k) the arithmetic
is ~zero — the measured 26-81 ms per stage is per-op overhead and lane
padding (BENCH_NOTES.md stage bisect).

This kernel runs the ENTIRE stage in one VMEM pass per time-tile:

* 18 convolutions as k shifted [rows,128]×[128,128] MXU matmuls,
* 18 anti-aliased snake sandwiches inline (polyphase decomposition from
  ops/pallas/snake.py — the 2×-rate signal never exists in memory),
* 9 residual adds and the 3-block mean fused at the end.

The input tile is read ONCE from HBM and the stage output written ONCE —
the HBM-traffic floor for the stage.

Halo bookkeeping: a pair with kernel k, dilation d consumes
h = 16 + (d+1)(k−1)/2 rows per side (two act sandwiches at 8 each + the
two convs); a block consumes the sum over its pairs (≤ 108 for k=11,
d=(1,3,5)). Tiles DMA a ±HALO (=112, 16-row aligned) window so interior
rows see their true neighbours; the outermost HALO output rows are patched
by the caller with the exact XLA composition (global edge semantics).

Act ratios 2/2 with kernel 12 (the production configuration); EVERY
generator stage (C = 24…768) runs through this one kernel, with three
width regimes:

* **Phase packing, C ≤ 64**: a [T, C→128] layout would leave 81%/62% of
  every VPU lane idle — and the snake sandwiches are pure VPU work
  (24-tap FIRs + 2 sin² per upsampled sample). ``g = 128/cw`` consecutive
  time-steps fold into the lane dimension (cw = C rounded up to 32/64):
  lanes hold (phase p, channel c) at p·cw + c, i.e. the packed [T/g, 128]
  array is just [T, cw] flat. Time shifts become row shifts plus
  cw-aligned lane rotations (``tshift``), and each conv tap's [cw, cw]
  matmul becomes one [128, 128] block-diagonal matmul (kron(I_g, W)) —
  identical arithmetic, full lane occupancy. All intermediates keep a
  fixed row count; content shrinks leftward as halos are consumed and
  zero rows back-fill from the right, exactly mirroring an explicitly
  shrinking-array formulation.
* **Wide arrays, 128 < C ≤ 384**: g = 1, arrays widen to the next
  lane-tile multiple — no lane rolls anywhere, tshift is a row slice.
* **Streamed weights, C = 768**: the full stage weight set (149 MB bf16)
  cannot ride VMEM; it stays in HBM and the kernel DMAs one conv's taps
  at a time through a scratch buffer (~13 MB ≈ 16 µs at HBM bandwidth,
  ahead of convs that compute for hundreds of µs).

sin² is evaluated by a range-reduced even polynomial (~12 VPU ops vs ~50
for the transcendental lowering — the snake sandwiches are the VPU floor).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from svc_inference_pipeline_tpu.ops.pallas.amp_pair import _pair_halo, _xla_pair
from svc_inference_pipeline_tpu.ops.pallas.snake import _phase_taps

LANE = 128
ACT_HALO = 8

# perf-bisect hooks (perf_stage5.py): force a packing factor / stub out the
# act or conv work to attribute kernel time. Never set in production.
_DEBUG = {"force_g": None, "no_act": False, "no_conv": False,
          "serial_stream": False, "no_mxu_fir": False}


def _fir_mxu_mats(g: int, cw: int, w_lanes: int, taps):
    """Banded lane-mixing matrices that evaluate the polyphase FIRs on the
    MXU for packed layouts (g > 1).

    In the packed frame (row q, lane p·cw+c ↔ time q·g+p, channel c) a
    time-FIR is a row-shift plus a lane-to-lane linear map — i.e. a sum of
    ``shift_rows(a, r) @ B_r`` matmuls with channel-diagonal banded B_r.
    The up matrices produce [even | odd] (2·w_lanes dst lanes, with the 2×
    polyphase gain folded in); the down matrices consume [even' | odd'].
    Index math mirrors ``act1d``'s shift arithmetic exactly:

        even[t] = Σ_m a[t+m+2]·eu[m],  odd[t] = Σ_m a[t+m+3]·ou[m]
        out[t]  = Σ_m odd'[t+m]·do[m] + Σ_m even'[t+m+1]·de[m]
    """
    eu, ou, de, do = taps
    eu = [2.0 * t for t in eu]
    ou = [2.0 * t for t in ou]
    r_up = ((g - 1) + 8) // g + 1
    r_dn = ((g - 1) + 6) // g + 1
    up = np.zeros((r_up, w_lanes, 2 * w_lanes), np.float32)
    dn = np.zeros((r_dn, 2 * w_lanes, w_lanes), np.float32)
    eye = np.eye(cw, dtype=np.float32)

    def blk(mat, r, ps, pd, dst_off, val):
        mat[r, ps * cw : (ps + 1) * cw, dst_off + pd * cw : dst_off + (pd + 1) * cw] += eye * val

    for pd in range(g):
        for m in range(6):
            r, ps = divmod(pd + m + 2, g)
            blk(up, r, ps, pd, 0, eu[m])  # even ← a[t+m+2]
            r, ps = divmod(pd + m + 3, g)
            blk(up, r, ps, pd, w_lanes, ou[m])  # odd ← a[t+m+3]
            r, ps = divmod(pd + m, g)
            dn[r, w_lanes + ps * cw : w_lanes + (ps + 1) * cw,
               pd * cw : (pd + 1) * cw] += eye * do[m]  # out ← odd'[t+m]
            r, ps = divmod(pd + m + 1, g)
            blk(dn, r, ps, pd, 0, de[m])  # out ← even'[t+m+1]
    return up, dn


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _block_halo(k: int, dils: Sequence[int]) -> int:
    return sum(_pair_halo(k, d) for d in dils)


_SIN2_COEFFS: dict = {}


def _sin2_coeffs(degree: int = 6):
    """cos(2πy) ≈ Σ c_k (y²)^k on y ∈ [−½, ½]. Compile-time constants for
    the in-kernel sin² polynomial. Degree 6 ≈ 1e-8 max err (f32 paths);
    degree 4 ≈ 1.1e-4 — far under the 2⁻⁸ ulp of a bf16 signal, 2 fewer
    FMAs on the kernel's VPU floor (bf16 paths)."""
    if degree not in _SIN2_COEFFS:
        y = np.linspace(-0.5, 0.5, 4001)
        c = np.polyfit(y * y, np.cos(2 * np.pi * y), degree)
        _SIN2_COEFFS[degree] = [float(v) for v in c]  # highest power first
    return _SIN2_COEFFS[degree]


def _make_kernel(t_tile: int, ks, dils_per_block, taps, halo: int, g: int = 1,
                 w_lanes: int = LANE, streamed: bool = False, w_dtype=None,
                 lowprec: bool = False, mxu_fir: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    even_up, odd_up, down_even, down_odd = taps
    # the 2× polyphase gain is folded into the up taps (exact: scaling a
    # tap by 2.0 keeps each product's rounding bit-identical)
    even_up = [2.0 * t for t in even_up]
    odd_up = [2.0 * t for t in odd_up]
    n_blocks = len(ks)
    cw = w_lanes // g  # channels per phase group
    r_total = (t_tile + 2 * halo) // g  # fixed row count of every tensor
    sin2_c = _sin2_coeffs(4 if lowprec else 6)
    inv_pi = float(1.0 / np.pi)

    def sin2(u):
        """sin²(u) = ½(1 − cos(2u)) via range-reduced even polynomial —
        ~12 VPU ops vs ~50 for the transcendental sin lowering; the snake
        sandwiches are the kernel's VPU floor (36 sins/sample). Reduction
        error grows ~|u|·ε; at production activation scales it stays well
        under the bf16 storage noise of the surrounding signal."""
        r = u * inv_pi
        y = r - jnp.floor(r + 0.5)
        t = y * y
        c = sin2_c[0]
        for coef in sin2_c[1:]:
            c = c * t + coef
        return 0.5 - 0.5 * c

    def tshift(a, s: int):
        """Shift content ``s`` time-steps toward row 0 (packed layout);
        zero rows back-fill from the right so the shape stays [r_total, 128].
        Equivalent to the unpacked ``a[s : s + n]`` left-anchored slice.

        The phase part is a lane rotation + row-pair select (Mosaic's
        tpu.concatenate rejects lane-offset operands, so no lane concat)."""
        if s == 0:
            return a
        return make_shifter(a, s)(s)

    def make_shifter(a, max_s: int):
        """Batch-shift factory: ONE zero-row concat (and, packed, one lane
        roll per distinct phase) shared by every ``shift(s)``, s ≤ max_s.

        The FIR taps and conv taps each need 6–12 shifts of the SAME
        array; the old per-shift tshift re-materialised the zero-padded
        concat (and a fresh roll) for every tap, which the stage bisect
        measured as the dominant act cost (BENCH_NOTES round 4)."""
        r1max = max_s // g
        ap = jnp.concatenate(
            [a, jnp.zeros((r1max + 1, a.shape[1]), a.dtype)], axis=0
        )
        rolled = {}  # phase p → lane-rotated padded buffer (trace-time memo)

        def shift(s: int):
            if s == 0:
                return a
            r1, p = divmod(s, g)
            if p == 0:
                return ap[r1 : r1 + r_total]
            if p not in rolled:
                # lane l ← lane l + p·cw (mod 128)
                rolled[p] = pltpu.roll(ap, w_lanes - p * cw, 1)
            rp = rolled[p]
            lane = jax.lax.broadcasted_iota(jnp.int32, (r_total, w_lanes), 1)
            return jnp.where(
                lane < w_lanes - p * cw,
                rp[r1 : r1 + r_total],
                rp[r1 + 1 : r1 + 1 + r_total],
            )

        return shift

    def act1d_mxu(a, alpha, inv_beta, up_ref, dn_ref):
        """act1d with the polyphase FIRs as banded-matrix MXU matmuls
        (packed layouts): row-shift slices + [128,256]/[256,128] dots
        replace ~24 lane-rolled VPU tap chains per act; only the snake
        (sin² + scale) stays on the VPU. bf16 operands — gated to bf16
        pipelines where inter-stage storage already rounds at 2⁻⁸."""
        if _DEBUG["no_act"]:
            return tshift(a, 16)
        sh = make_shifter(a.astype(w_dtype), (up_ref.shape[0] - 1) * g)
        acc = jnp.dot(sh(0), up_ref[0], preferred_element_type=jnp.float32)
        for r in range(1, up_ref.shape[0]):
            acc = acc + jnp.dot(sh(r * g), up_ref[r],
                                preferred_element_type=jnp.float32)
        even = acc[:, :w_lanes]
        odd = acc[:, w_lanes:]
        even = even + inv_beta * sin2(even * alpha)
        odd = odd + inv_beta * sin2(odd * alpha)
        eo = jnp.concatenate([even, odd], axis=1).astype(w_dtype)
        sh2 = make_shifter(eo, (dn_ref.shape[0] - 1) * g)
        out = jnp.dot(sh2(0), dn_ref[0], preferred_element_type=jnp.float32)
        for r in range(1, dn_ref.shape[0]):
            out = out + jnp.dot(sh2(r * g), dn_ref[r],
                                preferred_element_type=jnp.float32)
        return out

    def act1d(a, alpha, inv_beta):
        """Fused up2→snake→down2, f32; output time 0 ↔ input time 8."""
        if _DEBUG["no_act"]:
            return tshift(a, 16)
        sh_a = make_shifter(a, 8)
        even = sh_a(2) * even_up[0]
        odd = sh_a(3) * odd_up[0]
        for m in range(1, 6):
            even = even + sh_a(m + 2) * even_up[m]
            odd = odd + sh_a(m + 3) * odd_up[m]
        even = even + inv_beta * sin2(even * alpha)
        odd = odd + inv_beta * sin2(odd * alpha)
        sh_even = make_shifter(even, 6)
        sh_odd = make_shifter(odd, 5)
        out = odd * down_odd[0] + sh_even(1) * down_even[0]
        for m in range(1, 6):
            out = out + sh_odd(m) * down_odd[m]
            out = out + sh_even(m + 1) * down_even[m]
        return out

    def conv(a, taps, b_ref, idx, k, dil):
        """k tap-shifted [W,W] matmuls (bf16 in, f32 acc); ``taps`` is the
        list of the conv's k weight matrices (VMEM-resident slices, or
        reads of the streamed scratch buffer)."""
        if _DEBUG["no_conv"]:
            return tshift(a, dil * (k - 1)) + b_ref[idx]
        # shifts happen in f32 (Mosaic only rotates 32-bit data); each tap
        # operand casts to the weight dtype after its shift
        sh_a = make_shifter(a, (k - 1) * dil)
        acc = jnp.dot(
            a.astype(taps[0].dtype), taps[0], preferred_element_type=jnp.float32
        )
        for m in range(1, k):
            acc = acc + jnp.dot(
                sh_a(m * dil).astype(taps[m].dtype),
                taps[m],
                preferred_element_type=jnp.float32,
            )
        return acc + b_ref[idx]

    def kernel(x_hbm, *refs):
        # refs: (w0, b0, act0, w1, b1, act1, w2, b2, act2,
        #        [fir_up, fir_dn,] out_ref)
        out_ref = refs[-1]
        blocks = [refs[3 * i : 3 * i + 3] for i in range(n_blocks)]
        if mxu_fir:
            fir_up, fir_dn = refs[3 * n_blocks], refs[3 * n_blocks + 1]
            act = lambda a, al, ib: act1d_mxu(a, al, ib, fir_up, fir_dn)
        else:
            act = act1d
        bi = pl.program_id(0)
        ti = pl.program_id(1)

        def body(tile_ref, sem, wbuf=None, wsem=None):
            dma = pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(ti * (t_tile // g), r_total), :],
                tile_ref,
                sem,
            )
            dma.start()
            dma.wait()
            base = tile_ref[:].astype(jnp.float32)  # [r_total, 128]

            # streamed regime: the stage's 18 conv fetches double-buffer —
            # conv n+1's taps DMA from HBM while conv n (and the act
            # sandwich between them) computes, so the only exposed wait is
            # the first fetch of the tile. A serial fetch→wait per conv
            # cost ~3 ms/stage at C=768 (198 waits across the time tiles).
            if streamed and _DEBUG["serial_stream"]:  # A/B hook: old serial fetches
                def get_taps(w_ref, idx, k):
                    fetch = pltpu.make_async_copy(
                        w_ref.at[pl.ds(idx * k, k)], wbuf.at[0, pl.ds(0, k)],
                        wsem.at[0],
                    )
                    fetch.start()
                    fetch.wait()
                    return [wbuf[0, m] for m in range(k)]
            elif streamed:
                # static (w_ref, first-tap index, k) sequence — must match
                # the INTERLEAVED conv issue order below (pair-major across
                # blocks), since get_taps consumes it by call order
                sched = []
                for j in range(len(dils_per_block[0])):
                    for half in (0, 1):
                        for blk, (w_ref, _, _) in enumerate(blocks):
                            sched.append((w_ref, (2 * j + half) * ks[blk], ks[blk]))
                fetches = {}

                def start_fetch(n):
                    w_ref, first, k = sched[n]
                    fetches[n] = pltpu.make_async_copy(
                        w_ref.at[pl.ds(first, k)],
                        wbuf.at[n % 2, pl.ds(0, k)],
                        wsem.at[n % 2],
                    )
                    fetches[n].start()

                start_fetch(0)
                cursor = [0]

                def get_taps(w_ref, idx, k):
                    n = cursor[0]
                    cursor[0] += 1
                    fetches.pop(n).wait()
                    if n + 1 < len(sched):
                        start_fetch(n + 1)
                    return [wbuf[n % 2, m] for m in range(k)]
            else:
                def get_taps(w_ref, idx, k):
                    return [w_ref[idx * k + m] for m in range(k)]

            # the three AMP blocks are INDEPENDENT until the final mean —
            # interleave their op chains pair-major so the scheduler can
            # run one block's VPU act sandwiches under another block's MXU
            # conv matmuls (block-major issue serialises VPU-then-MXU
            # within each pair: both units take turns idling)
            a_blk = [base] * n_blocks
            n_pairs = len(dils_per_block[0])
            assert all(len(dp) == n_pairs for dp in dils_per_block)
            for j in range(n_pairs):
                t1 = [
                    act(a_blk[blk], blocks[blk][2][4 * j], blocks[blk][2][4 * j + 1])
                    for blk in range(n_blocks)
                ]
                t2 = [
                    conv(
                        t1[blk],
                        get_taps(blocks[blk][0], 2 * j, ks[blk]),
                        blocks[blk][1], 2 * j, ks[blk], dils_per_block[blk][j],
                    )
                    for blk in range(n_blocks)
                ]
                t3 = [
                    act(t2[blk], blocks[blk][2][4 * j + 2], blocks[blk][2][4 * j + 3])
                    for blk in range(n_blocks)
                ]
                t4 = [
                    conv(
                        t3[blk],
                        get_taps(blocks[blk][0], 2 * j + 1, ks[blk]),
                        blocks[blk][1], 2 * j + 1, ks[blk], 1,
                    )
                    for blk in range(n_blocks)
                ]
                a_blk = [
                    tshift(a_blk[blk], _pair_halo(ks[blk], dils_per_block[blk][j])) + t4[blk]
                    for blk in range(n_blocks)
                ]
            acc = None
            for blk in range(n_blocks):
                surplus = halo - _block_halo(ks[blk], dils_per_block[blk])
                out_b = tshift(a_blk[blk], surplus)[: t_tile // g]
                acc = out_b if acc is None else acc + out_b
            out_ref[0] = (acc * (1.0 / n_blocks)).astype(out_ref.dtype)

        scopes = [
            pltpu.VMEM((r_total, w_lanes), x_hbm.dtype),
            pltpu.SemaphoreType.DMA,
        ]
        if streamed:
            scopes += [
                pltpu.VMEM((2, max(ks), w_lanes, w_lanes), w_dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        pl.run_scoped(body, *scopes)

    return kernel


def _xla_stage(x, block_params, ks, dils_per_block, kind, logscale):
    """The exact composed path (global edge semantics) — boundary oracle.

    ``block_params[i]`` is a tuple of per-pair parameter tuples
    (w1, b1, w2, b2, alpha1, beta1, alpha2, beta2)."""
    acc = None
    for blk, pairs in enumerate(block_params):
        a = x
        for j, pair in enumerate(pairs):
            w1, b1, w2, b2, al1, be1, al2, be2 = pair
            a = _xla_pair(
                a, w1, b1, w2, b2, al1, be1, al2, be2,
                ks[blk], dils_per_block[blk][j], kind, logscale,
            )
        acc = a if acc is None else acc + a
    return acc / len(block_params)


@functools.partial(
    jax.jit,
    static_argnames=("ks", "dils_per_block", "kind", "logscale", "t_tile",
                     "interpret", "exact_edges"),
)
def fused_amp_stage(
    x: jnp.ndarray,  # [B, T, C], C ≤ 128
    block_params,  # tuple over blocks of tuples over pairs of param tuples
    ks: Tuple[int, ...],
    dils_per_block: Tuple[Tuple[int, ...], ...],
    kind: str = "snakebeta",
    logscale: bool = True,
    t_tile: int = 8192,
    interpret: bool = False,
    exact_edges: bool = True,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = interpret or jax.default_backend() != "tpu"

    b, t, c = x.shape
    assert c <= 6 * LANE, c
    dtype = x.dtype
    n_blocks = len(ks)

    # phase packing: fold g consecutive time-steps into the 128 lanes when
    # the channel count is narrow; for C > 128 the arrays simply widen to
    # the next lane-tile multiple (g = 1 → no lane rolls anywhere)
    g = 4 if c <= 32 else (2 if c <= 64 else 1)
    if _DEBUG["force_g"] is not None:
        g = _DEBUG["force_g"]
        assert c <= LANE // g
    w_lanes = LANE if g > 1 else _round_up(max(c, LANE), LANE)
    cw = w_lanes // g  # channel slots per phase (g=1: the full width)

    halo = _round_up(max(_block_halo(k, d) for k, d in zip(ks, dils_per_block)), 16)
    # wider arrays (C > 128) scale the tile cap down to hold VMEM
    # footprint; T then splits into EQUAL tiles under that cap — a fixed
    # big tile would round t_pad up to a tile multiple and waste up to
    # ~2x compute on clips that land just past a multiple (short/serving
    # lengths especially)
    t_cap = max(t_tile * LANE // w_lanes, max(16, 8 * g))
    n_tiles = max(1, -(-t // t_cap))
    t_tile = _round_up(-(-t // n_tiles), max(16, 8 * g))

    w_dtype = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    # weight residency: the full stage's weights ride VMEM when they fit;
    # wide stages (C = 768: 149 MB even in bf16) keep them in HBM and the
    # kernel streams one conv at a time through a scratch buffer
    w_bytes = sum(
        6 * k * w_lanes * w_lanes * (2 if w_dtype == jnp.bfloat16 else 4)
        for k in ks
    )
    streamed = w_bytes > 48 * 1024 * 1024

    # packed bf16 layouts route the act FIRs through the MXU (banded
    # matmuls, _fir_mxu_mats) — only pays when g·(up+dn matmul count) is
    # small, i.e. g = 4 (3+3 dots replace ~24 lane-rolled VPU tap chains)
    mxu_fir = bool(
        g >= 4 and dtype == jnp.bfloat16 and not _DEBUG["no_mxu_fir"]
    )
    kernel = _make_kernel(t_tile, ks, dils_per_block, _phase_taps(), halo, g,
                          w_lanes, streamed, w_dtype,
                          lowprec=dtype == jnp.bfloat16, mxu_fir=mxu_fir)

    # effective act params (exp folded for logscale): rows per pair j are
    # (alpha1, 1/beta1, alpha2, 1/beta2) at 4j..4j+3, padded to 128 lanes
    def eff(al, be):
        if logscale:
            a_e = jnp.exp(al)
            b_e = jnp.exp(be) if kind == "snakebeta" else a_e
        else:
            a_e = al
            b_e = be if kind == "snakebeta" else al
        return a_e, 1.0 / (b_e + 1e-9)

    # packed per-channel vectors: pad to cw, then tile over the g phases
    def pack_vec(v, fill):
        return jnp.tile(jnp.pad(v, (0, cw - c), constant_values=fill), g)

    eye_g = jnp.eye(g, dtype=w_dtype)

    operands = []
    specs = []
    for blk, pairs in enumerate(block_params):
        k = ks[blk]
        ws, bs, acts = [], [], []
        for (w1, b1, w2, b2, al1, be1, al2, be2) in pairs:
            ws += [w1, w2]
            bs += [b1, b2]
            a1, ib1 = eff(al1, be1)
            a2, ib2 = eff(al2, be2)
            acts += [a1, ib1, a2, ib2]
        w = jnp.concatenate([w_.astype(w_dtype) for w_ in ws], axis=0)  # [6k, C, C]
        w = jnp.pad(w, [(0, 0), (0, cw - c), (0, cw - c)])
        if g > 1:  # block-diagonal: each phase applies the same [cw, cw] W
            w = jax.vmap(lambda m: jnp.kron(eye_g, m))(w)  # [6k, 128, 128]
        bias = jnp.stack([pack_vec(b_.astype(jnp.float32), 0.0) for b_ in bs])
        act = jnp.stack([pack_vec(v.astype(jnp.float32), 1.0) for v in acts])
        operands += [w, bias, act]
        n_pairs = len(pairs)
        specs += [
            pl.BlockSpec(memory_space=pl.ANY) if streamed else
            pl.BlockSpec((2 * n_pairs * k, w_lanes, w_lanes), lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * n_pairs, w_lanes), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * n_pairs, w_lanes), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
        ]

    if mxu_fir:
        fir_up, fir_dn = _fir_mxu_mats(g, cw, w_lanes, _phase_taps())
        operands += [jnp.asarray(fir_up, w_dtype), jnp.asarray(fir_dn, w_dtype)]
        specs += [
            pl.BlockSpec(fir_up.shape, lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(fir_dn.shape, lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    t_pad = _round_up(t, t_tile)
    xp = jnp.pad(x, [(0, 0), (halo, halo + t_pad - t), (0, cw - c)])
    # pack: [B, T', cw] → [B, T'/g, g·cw=128]; lane p·cw + ch ↔ time-phase p
    xp = xp.reshape(b, (t_pad + 2 * halo) // g, w_lanes)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t_pad // g, w_lanes), dtype),
        grid=(b, t_pad // t_tile),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + specs,
        out_specs=pl.BlockSpec(
            (1, t_tile // g, w_lanes), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, *operands)
    out = out.reshape(b, t_pad, cw)[:, :t, :c]

    if not exact_edges:
        return out
    # exact boundary patch: output row r depends on inputs [r−halo, r+halo];
    # a span of 4·halo rows makes the outer `patch` rows globally exact.
    # Head and tail windows run through ONE batched composition (batch 2B)
    # — the ~100 tiny XLA ops per composition are dispatch-overhead-bound,
    # so halving the call count halves the patch cost.
    patch = min(halo, t)
    span = min(4 * halo, t)
    edges = jnp.concatenate([x[:, :span], x[:, -span:]], axis=0)  # [2B, span, C]
    pe = _xla_stage(edges, block_params, ks, dils_per_block, kind, logscale).astype(dtype)
    head = pe[:b, :patch]
    tail = pe[b:, -patch:]
    return out.at[:, :patch, :].set(head).at[:, -patch:, :].set(tail)
