"""Sequence-parallel Whisper encoding over a device mesh.

No reference counterpart — the reference handles long audio by silent
truncation (SURVEY §5 long-context). Chunked windows (pipeline/content.py)
remove the 30 s limit on one chip; this module additionally shards ONE
window's encoder pass over devices along the TIME axis:

* queries stay local to each time shard,
* keys/values are all-gathered over the sequence axis per layer
  (psum-style SPMD collectives over ICI, inserted explicitly inside
  ``shard_map``),
* LayerNorm/MLP are pointwise over time → fully local.

Activation memory per device drops by the shard factor and attention/MLP
FLOPs distribute across the mesh — the standard all-gather-KV flavour of
sequence parallelism (DeepSpeed-Ulysses/Megatron-SP family).

Operates on the converted parameter pytree (same layout as
models/whisper.py, so checkpoints are shared).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from svc_inference_pipeline_tpu.models.whisper import WhisperDims, sinusoids


def _dense(p, x):
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _layer_norm(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(x.dtype)


def _stem(params: Any, dims: WhisperDims, mel: jnp.ndarray) -> jnp.ndarray:
    """conv1/conv2 + positional embedding (replicated — ~0.5% of FLOPs)."""
    x = mel.transpose(0, 2, 1)
    for name, stride in (("conv1", 1), ("conv2", 2)):
        p = params[name]
        x = jax.lax.conv_general_dilated(
            x,
            p["kernel"].astype(x.dtype),
            window_strides=(stride,),
            padding=[(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + p["bias"].astype(x.dtype)
        x = jax.nn.gelu(x, approximate=False)
    return x + jnp.asarray(sinusoids(dims.n_audio_ctx, dims.n_audio_state)).astype(x.dtype)


def _block_sp(p: Any, x: jnp.ndarray, n_head: int, axis: str) -> jnp.ndarray:
    """One encoder block with time-sharded x: local Q, all-gathered K/V."""
    h = _layer_norm(p["attn_ln"], x)
    q = _dense(p["attn"]["query"], h)
    k_local = _dense(p["attn"]["key"], h)
    v_local = _dense(p["attn"]["value"], h)
    k = jax.lax.all_gather(k_local, axis, axis=1, tiled=True)  # [B, T, D]
    v = jax.lax.all_gather(v_local, axis, axis=1, tiled=True)

    b, tq, d = q.shape
    tk = k.shape[1]
    hd = d // n_head
    scale = hd**-0.25
    qh = q.reshape(b, tq, n_head, hd).transpose(0, 2, 1, 3) * scale
    kh = k.reshape(b, tk, n_head, hd).transpose(0, 2, 3, 1) * scale
    vh = v.reshape(b, tk, n_head, hd).transpose(0, 2, 1, 3)
    w = jax.nn.softmax(jnp.einsum("bhqd,bhdk->bhqk", qh, kh).astype(jnp.float32), axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", w.astype(vh.dtype), vh)
    o = o.transpose(0, 2, 1, 3).reshape(b, tq, d)
    x = x + _dense(p["attn"]["out"], o)

    h = _layer_norm(p["mlp_ln"], x)
    h = jax.nn.gelu(_dense(p["mlp_0"], h), approximate=False)
    return x + _dense(p["mlp_2"], h)


def encode_sequence_parallel(
    params: Any,
    dims: WhisperDims,
    mel: jnp.ndarray,  # [B, n_mels, 3000]
    mesh: Mesh,
    seq_axis: str = "model",
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Sequence-parallel ``embed_audio`` → [B, 1500, D].

    ``dims.n_audio_ctx`` must divide evenly by the mesh's ``seq_axis`` size.
    Numerically identical to the single-device encoder (parity-tested).
    """
    n_shards = mesh.shape[seq_axis]
    assert dims.n_audio_ctx % n_shards == 0, (dims.n_audio_ctx, n_shards)

    x = _stem(params, dims, mel.astype(compute_dtype))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(None, seq_axis, None),
        out_specs=P(None, seq_axis, None),
    )
    def run_blocks(x_local):
        for i in range(dims.n_audio_layer):
            x_local = _block_sp(params[f"block_{i}"], x_local, dims.n_audio_head, seq_axis)
        return _layer_norm(params["ln_post"], x_local)

    return run_blocks(x).astype(jnp.float32)
