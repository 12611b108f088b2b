"""Device mesh construction.

The reference is single-process single-device — its only multi-device
fossil is stripping DDP prefixes from checkpoints (utils/load_models.py:
33-41, SURVEY §2.9). Here multi-chip scaling is a first-class
``jax.sharding.Mesh`` over ICI with named axes:

* ``data``  — batch/utterance data parallelism,
* ``model`` — tensor parallelism (channel/head sharding).

Collectives are inserted by XLA GSPMD from sharding annotations — no
NCCL/MPI analogue exists or is needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """Build a 2-D (data × model) mesh.

    ``data=-1`` consumes all remaining devices. Device order follows
    ``jax.devices()`` — on TPU slices that enumeration is ICI-contiguous, so
    the model axis (heavier traffic: per-layer all-reduces) lands on
    adjacent chips and the data axis (one gradient/batch all-reduce) spans
    the longer paths.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    need = data * model
    assert need <= n, f"mesh {data}x{model} needs {need} devices, have {n}"
    arr = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(arr, axis_names=tuple(axis_names))


def mesh_from_config(cfg) -> Mesh:
    p = cfg.parallel
    return make_mesh(
        data=p.get("data_parallel_size", -1),
        model=p.get("model_parallel_size", 1),
        axis_names=(p.get("data_axis", DATA_AXIS), p.get("model_axis", MODEL_AXIS)),
    )
