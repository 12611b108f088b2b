"""Sharding rules: parameter tensor parallelism + batch data parallelism.

Rules are (path-regex → PartitionSpec) lists applied over the param pytree.
Unmatched params replicate. XLA GSPMD propagates the annotations through
the computation and inserts the ICI collectives (all-gather on the gather
side of sharded matmuls, reduce-scatter/all-reduce on contractions) — the
framework never writes a collective by hand on this path.

Tensor-parallel layout choices (the "megatron pattern" adapted to this
model family):

* DiffSVC residual blocks — the dilated conv C→2C and the conditioner /
  step projections shard their OUTPUT channels; the following 1×1
  output_projection shards its INPUT channels, so each block is
  column-parallel → row-parallel with one psum per block at the residual
  join.
* Whisper attention — QKV projections shard heads (output dim); the out
  projection shards its input; MLP is column→row. One psum per sub-block.
* BigVGAN — channel sharding of every conv; channels halve per stage so
  the shards stay balanced.
"""

from __future__ import annotations

import re
from typing import Any, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Rules = Sequence[Tuple[str, P]]

# model axis name used in the specs below
M = "model"
D = "data"

MAPPER_TP_RULES: Rules = (
    # residual blocks: column-parallel in, row-parallel out
    (r".*residual_\d+/dilated_conv/kernel", P(None, None, M)),
    (r".*residual_\d+/dilated_conv/bias", P(M)),
    (r".*residual_\d+/conditioner_projection/kernel", P(None, M)),
    (r".*residual_\d+/conditioner_projection/bias", P(M)),
    (r".*residual_\d+/diffusion_projection/kernel", P(None, M)),
    (r".*residual_\d+/diffusion_projection/bias", P(M)),
    (r".*residual_\d+/output_projection/kernel", P(M, None)),
    # condition encoder: embedding tables shard over the vocab axis
    (r".*(melody|loudness|singer)/embedding", P(M, None)),
    (r".*content_\w+/kernel", P(None, M)),
)

VOCODER_TP_RULES: Rules = (
    (r".*conv_pre/conv/kernel", P(None, None, M)),
    (r".*conv_pre/conv/bias", P(M)),
    (r".*up_\d+/kernel", P(None, M, None)),
    (r".*up_\d+/bias", P(M)),
    (r".*resblock_\d+_\d+/conv\d?_\d+/conv/kernel", P(None, M, None)),
    (r".*resblock_\d+_\d+/act\d?_\d+/(alpha|beta)", P(M)),
)

WHISPER_TP_RULES: Rules = (
    (r".*block_\d+/attn/(query|key|value)/kernel", P(None, M)),
    (r".*block_\d+/attn/(query|value)/bias", P(M)),
    (r".*block_\d+/attn/out/kernel", P(M, None)),
    (r".*block_\d+/mlp_0/kernel", P(None, M)),
    (r".*block_\d+/mlp_0/bias", P(M)),
    (r".*block_\d+/mlp_2/kernel", P(M, None)),
    # scanned layout (scan_layers=True): leading layer axis stays unsharded
    (r".*blocks/block/attn/(query|key|value)/kernel", P(None, None, M)),
    (r".*blocks/block/attn/(query|value)/bias", P(None, M)),
    (r".*blocks/block/attn/out/kernel", P(None, M, None)),
    (r".*blocks/block/mlp_0/kernel", P(None, None, M)),
    (r".*blocks/block/mlp_0/bias", P(None, M)),
    (r".*blocks/block/mlp_2/kernel", P(None, M, None)),
)


def _spec_for(path: str, rules: Rules) -> P:
    for pattern, spec in rules:
        if re.fullmatch(pattern, path):
            return spec
    return P()  # replicate


def param_specs(params: Any, rules: Rules) -> Any:
    """PartitionSpec pytree matching ``params`` under ``rules``."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(str(getattr(k, "key", k)) for k in kp)

    specs = {path_str(kp): _spec_for(path_str(kp), rules) for kp, _ in flat}

    def rebuild(kp, _leaf):
        return specs[path_str(kp)]

    return jax.tree_util.tree_map_with_path(rebuild, params)


def shard_params(params: Any, mesh: Mesh, rules: Rules) -> Any:
    """device_put params with NamedShardings derived from ``rules``."""
    specs = param_specs(params, rules)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_sharding(mesh: Mesh, ndim: int, axis: str = D) -> NamedSharding:
    """Shard dim 0 (batch) over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
