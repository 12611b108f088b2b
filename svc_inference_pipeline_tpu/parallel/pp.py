"""Pipeline parallelism (GPipe) for the DiffSVC denoiser.

The reference is single-device (SURVEY §2.9); this module adds the fourth
scaling axis beside data/tensor/sequence parallelism: the 20 residual
layers (modules/diffsvc.py:262-273) are split into S contiguous stages
over a ``pipe`` mesh axis, and microbatches flow through the stages with
``lax.ppermute`` ring shifts — the classic JAX pipeline pattern (one
program on every device; a stage computes microbatch ``t − stage_id`` at
global step ``t``; bubble = (S−1)/(n_micro+S−1)).

Differentiable end to end: ppermute has a well-defined transpose, so
``jax.grad`` through :func:`pipeline_denoise` yields the reverse pipeline
automatically — used by the PP training step test.

Layout: per-layer params are stacked [L, …] then reshaped [S, per, …] and
sharded over ``pipe`` (dim 0); non-layer params (mel preprocess, skip/out
projections) replicate — stage 0 applies the preprocess, the last stage
the output head. The dilated conv's dilation 2^(i mod 4) depends on the
ABSOLUTE layer index, which is dynamic inside the stage; a 4-way
``lax.switch`` over static-dilation branches keeps the convs XLA-static.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PIPE_AXIS = "pipe"


# ---------------------------------------------------------------------------
# parameter restructuring
# ---------------------------------------------------------------------------


def stack_layer_params(params: Dict[str, Any], n_layers: int, n_stages: int):
    """residual_i dicts → pytree of [S, per, …] arrays (+ shared rest)."""
    assert n_layers % n_stages == 0, (n_layers, n_stages)
    layers = [params[f"residual_{i}"] for i in range(n_layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    per = n_layers // n_stages
    stacked = jax.tree_util.tree_map(
        lambda x: x.reshape((n_stages, per) + x.shape[1:]), stacked
    )
    shared = {k: v for k, v in params.items() if not k.startswith("residual_")}
    return stacked, shared


def shard_stage_params(stacked, mesh: Mesh, axis: str = PIPE_AXIS):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
        ),
        stacked,
    )


# ---------------------------------------------------------------------------
# per-layer compute (mirrors models/diffsvc_fast.denoise_step, f32)
# ---------------------------------------------------------------------------


def _dense(p, x):
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _dilated_conv_static(y, w, b, d: int):
    t_len = y.shape[1]
    yp = jnp.pad(y, [(0, 0), (d, d), (0, 0)])
    out = (
        yp[:, :t_len, :] @ w[0]
        + yp[:, d : d + t_len, :] @ w[1]
        + yp[:, 2 * d : 2 * d + t_len, :] @ w[2]
    )
    return out + b


def _layer(p_j, cond_proj_j, step_row_j, h, skip, abs_idx, cycle: int):
    """One residual layer; ``abs_idx`` (dynamic) picks the dilation branch."""
    y = h + step_row_j
    w = p_j["dilated_conv"]["kernel"]
    b = p_j["dilated_conv"]["bias"]
    y = jax.lax.switch(
        abs_idx % cycle,
        [partial(_dilated_conv_static, d=2**k) for k in range(cycle)],
        y, w, b,
    )
    y = y + cond_proj_j
    gate, filt = jnp.split(y, 2, axis=-1)
    y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
    y = _dense(p_j["output_projection"], y)
    residual, skip_out = jnp.split(y, 2, axis=-1)
    h = (h + residual) * np.float32(1.0 / math.sqrt(2.0))
    return h, skip + skip_out


# ---------------------------------------------------------------------------
# the pipeline
# ---------------------------------------------------------------------------


def pipeline_denoise(
    stage_params,  # pytree of [S, per, …], sharded over `pipe`
    shared,  # replicated non-layer params
    cond_projs,  # [L, n_micro, Bm, T, 2C] (layer-major, microbatched)
    step_rows,  # [L, n_micro, C]
    x_mb,  # [n_micro, Bm, T, M]
    mesh: Mesh,
    cfg,
    axis: str = PIPE_AXIS,
):
    """ε-prediction for all microbatches via the S-stage pipeline."""
    S = dict(mesh.shape)[axis]
    L = cfg.residual_layer_num
    per = L // S
    cycle = cfg.dilation_cycle_length
    n_micro = x_mb.shape[0]
    c = cfg.residual_channels

    # regroup layer-major conditioning to [S, per, …] so it shards with pipe
    cp = cond_projs.reshape((S, per) + cond_projs.shape[1:])
    sr = step_rows.reshape((S, per) + step_rows.shape[1:])

    import functools

    try:
        from jax import shard_map as _sm

        shard_map = functools.partial(_sm, check_vma=False)
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sm_old

        shard_map = functools.partial(_sm_old, check_rep=False)

    spec_stage = P(axis)

    def body(stage_p, cp_s, sr_s, x_all, shared_p):
        # each operand arrives with a leading length-1 stage dim — drop it
        stage_p = jax.tree_util.tree_map(lambda v: v[0], stage_p)
        cp_s, sr_s = cp_s[0], sr_s[0]
        sid = jax.lax.axis_index(axis)
        bm, t_len = x_all.shape[1], x_all.shape[2]

        h_c = jnp.zeros((bm, t_len, c), jnp.float32)
        skip_c = jnp.zeros((bm, t_len, c), jnp.float32)
        out_buf = jnp.zeros((n_micro, bm, t_len, cfg.n_mel), jnp.float32)

        def step(t, carry):
            h_c, skip_c, out_buf = carry
            mb = t - sid  # microbatch this stage works on now
            active = (mb >= 0) & (mb < n_micro)
            mb_c = jnp.clip(mb, 0, n_micro - 1)

            # stage 0 ingests a fresh microbatch instead of the ring input
            x_t = jax.lax.dynamic_index_in_dim(x_all, mb_c, 0, keepdims=False)
            h0 = jax.nn.relu(_dense(shared_p["mel_preprocess"], x_t))
            h = jnp.where(sid == 0, h0, h_c)
            skip = jnp.where(sid == 0, jnp.zeros_like(skip_c), skip_c)

            for j in range(per):
                p_j = jax.tree_util.tree_map(lambda v: v[j], stage_p)
                cpj = jax.lax.dynamic_index_in_dim(cp_s[j], mb_c, 0, keepdims=False)
                srj = jax.lax.dynamic_index_in_dim(sr_s[j], mb_c, 0, keepdims=False)
                h, skip = _layer(p_j, cpj, srj, h, skip, sid * per + j, cycle)

            # last stage: apply the output head, store the finished microbatch
            out = skip * np.float32(1.0 / math.sqrt(L))
            out = jax.nn.relu(_dense(shared_p["skip_projection"], out))
            out = _dense(shared_p["output_projection"], out)
            write = active & (sid == S - 1)
            out_buf = jax.lax.dynamic_update_index_in_dim(
                out_buf,
                jnp.where(write, out, jax.lax.dynamic_index_in_dim(out_buf, mb_c, 0, False)),
                mb_c,
                0,
            )

            # ring-shift the carry to the next stage
            perm = [(i, (i + 1) % S) for i in range(S)]
            h_next = jax.lax.ppermute(h, axis, perm)
            skip_next = jax.lax.ppermute(skip, axis, perm)
            return h_next, skip_next, out_buf

        h_c, skip_c, out_buf = jax.lax.fori_loop(
            0, n_micro + S - 1, step, (h_c, skip_c, out_buf)
        )
        return out_buf[None]  # [1, n_micro, Bm, T, M] per stage

    out = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec_stage, spec_stage, spec_stage, P(), P()),
        out_specs=spec_stage,
    )(stage_params, cp, sr, x_mb, shared)
    return out[-1]  # the last stage holds the real outputs


def make_pp_denoise_fn(params, cond, num_steps: int, cfg, mesh,
                       axis: str = PIPE_AXIS, n_micro: int = None):
    """Sampler-compatible denoise_fn whose every ε-prediction runs through
    the S-stage GPipe pipeline — the PP analogue of
    ``models.diffsvc_fast.make_fast_denoise_fn`` (same contract: the
    returned fn takes ``(x, cond_unused, t [B,1])`` with one shared step
    per batch and closes over hoisted conditioning).

    Used by ``SVCPipeline`` when ``cfg.parallel.pipeline_stages > 1``: the
    whole sampling scan then drives the pipeline, one full S-stage sweep
    per reverse step.
    """
    from svc_inference_pipeline_tpu.models.diffsvc_fast import precompute

    S = dict(mesh.shape)[axis]
    L = cfg.residual_layer_num
    b = cond.shape[0]
    n_micro = n_micro or b
    assert b % n_micro == 0, (b, n_micro)
    bm = b // n_micro

    # hoisted once (f32 — the pipeline stages compute in f32)
    pre = precompute(params, cond, num_steps, cfg, jnp.float32)
    cond_projs = pre.cond_projs.reshape(L, n_micro, bm, cond.shape[1], -1)
    # shard_map partitions the stacked [S, …] params over `axis` per its
    # in_specs — no explicit device_put (this traces inside the core jit)
    stacked, shared = stack_layer_params(params, L, S)

    def fn(x, _cond_unused, t):
        # one shared reverse step for the whole batch (every sampler here
        # and the reference, diffsvcrepo_inference.py:228,235)
        t_idx = jnp.broadcast_to(jnp.asarray(t).reshape(-1)[0], (n_micro,))
        step_rows = pre.step_rows[t_idx].transpose(1, 0, 2)  # [L, n_micro, C]
        x_mb = x.astype(jnp.float32).reshape(n_micro, bm, x.shape[1], x.shape[2])
        out = pipeline_denoise(
            stacked, shared, cond_projs, step_rows, x_mb, mesh, cfg, axis=axis
        )
        return out.reshape(b, x.shape[1], x.shape[2])

    return fn


def pp_denoise_fn(params, cond, t_steps, x, mesh, cfg, num_steps: int,
                  n_micro: int = None):
    """Convenience: full-batch ε via PP.

    ``x`` [B, T, M]; ``t_steps`` [B] int (one shared step per microbatch —
    the sampler/training contract here). ``num_steps`` sizes the hoisted
    step table (static).
    """
    from svc_inference_pipeline_tpu.models.diffsvc_fast import precompute

    S = dict(mesh.shape)[PIPE_AXIS]
    b = x.shape[0]
    n_micro = n_micro or b
    assert b % n_micro == 0
    bm = b // n_micro
    L = cfg.residual_layer_num

    pre = precompute(params, cond, num_steps, cfg, jnp.float32)
    # layer-major microbatched conditioning
    cond_projs = pre.cond_projs.reshape(L, n_micro, bm, cond.shape[1], -1)
    t_idx = jnp.asarray(t_steps).reshape(n_micro, bm)[:, 0]
    step_rows = pre.step_rows[t_idx].transpose(1, 0, 2)  # [L, n_micro, C]

    stacked, shared = stack_layer_params(params, L, S)
    x_mb = x.reshape(n_micro, bm, x.shape[1], x.shape[2])
    out = pipeline_denoise(stacked, shared, cond_projs, step_rows, x_mb, mesh, cfg)
    return out.reshape(b, x.shape[1], x.shape[2])
