"""Device helpers for the axon/TPU environment."""

from __future__ import annotations

import jax


def host_cpu() -> jax.Device:
    """The local host CPU device (exists alongside the TPU backend)."""
    return jax.devices("cpu")[0]


def accelerator() -> jax.Device:
    """The default (first) device of the default backend."""
    return jax.devices()[0]


def fast_random_params(init_fn, seed: int = 0, scale: float = 0.02):
    """Shape-only random init: jax.eval_shape the init, fill with numpy.

    Running a real ``Module.init`` executes the forward pass — minutes for a
    Whisper-medium on host CPU and a wasted remote compile on the TPU. For
    smoke/bench runs only the shapes matter.
    """
    import numpy as np

    shapes = jax.eval_shape(init_fn)
    rng = np.random.default_rng(seed)

    def fill(leaf):
        if len(leaf.shape) <= 1:  # biases/scales: zero (scales fixed below)
            return np.zeros(leaf.shape, dtype=leaf.dtype)
        # LeCun-style: keeps activations O(1) through deep stacks.
        # Draw float32 directly — the float64 default doubles the gen time
        # and peak memory at whisper-medium scale (~430M params/model set)
        fan_in = int(np.prod(leaf.shape[:-1]))
        std = np.float32(1.0 / np.sqrt(max(fan_in, 1)))
        out = rng.standard_normal(leaf.shape, dtype=np.float32) * std
        return out if leaf.dtype == np.float32 else out.astype(leaf.dtype)

    params = jax.tree_util.tree_map(fill, shapes)

    # LayerNorm/GroupNorm scales must be ~1, not 0
    def fix_scales(path, leaf):
        name = str(getattr(path[-1], "key", "")) if path else ""
        if name in ("scale",):
            return np.ones(leaf.shape, dtype=leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(fix_scales, params)
