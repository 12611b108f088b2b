"""Multi-host (multi-process) initialisation for pod-scale meshes.

Single-host multi-chip needs nothing beyond ``make_mesh`` — but a TPU
pod slice runs one process per host, and those processes must rendezvous
before ``jax.devices()`` can see the full slice. The reference has no
distributed story at all (single-process, single-GPU; SURVEY §2.9);
this module wraps ``jax.distributed.initialize`` with the conventions
the rest of the package assumes:

* On Cloud TPU the coordinator/process-count/process-id are discovered
  from the TPU metadata automatically — ``initialize()`` with no
  arguments is correct, and that is the default here.
* Elsewhere (CPU/GPU fleets, tests) the standard env vars are honoured:
  ``SVC_COORDINATOR`` (host:port), ``SVC_NUM_PROCESSES``,
  ``SVC_PROCESS_ID``.
* ``make_mesh`` then builds the global mesh over ``jax.devices()``
  (which spans every host after initialisation); GSPMD/shard_map route
  the inter-host collectives over ICI/DCN exactly as intra-host ones —
  no code in this package distinguishes the two.

Typical pod entrypoint:

    from svc_inference_pipeline_tpu.parallel import distributed, mesh
    distributed.ensure_initialized()
    m = mesh.make_mesh(data=-1, model=4)     # spans the whole slice
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_INITIALIZED = False


def is_distributed_env() -> bool:
    """True when multi-process coordination is configured or implied."""
    if os.environ.get("SVC_COORDINATOR"):
        return True
    if int(os.environ.get("SVC_NUM_PROCESSES", "1") or "1") > 1:
        return True
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "").strip()
    return bool(hosts and len(hosts.split(",")) > 1)


def ensure_initialized(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Idempotently initialise jax.distributed; returns True when a
    multi-process runtime was set up, False for the single-process no-op.

    Explicit arguments win over env vars; with neither, Cloud TPU
    auto-discovery is attempted only when the environment implies a
    multi-host slice (never breaks single-host runs).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True

    coordinator = coordinator or os.environ.get("SVC_COORDINATOR")
    if num_processes is None and os.environ.get("SVC_NUM_PROCESSES"):
        num_processes = int(os.environ["SVC_NUM_PROCESSES"])
    if process_id is None and os.environ.get("SVC_PROCESS_ID"):
        process_id = int(os.environ["SVC_PROCESS_ID"])

    if coordinator:
        # topology auto-detection exists only on Cloud TPU/Slurm/OMPI; the
        # generic fleet case this path serves needs the full triple — fail
        # with a clear message instead of a RuntimeError deep inside JAX
        if num_processes is None or process_id is None:
            raise ValueError(
                "ensure_initialized: a coordinator address needs the process "
                "topology too — set SVC_NUM_PROCESSES and SVC_PROCESS_ID (or "
                "pass num_processes/process_id)"
            )
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        _INITIALIZED = True
        return True

    if num_processes is not None and num_processes > 1:
        # a launcher exported a multi-process topology but no coordinator:
        # proceeding would silently run N independent copies of the job
        raise ValueError(
            "ensure_initialized: SVC_NUM_PROCESSES > 1 but no SVC_COORDINATOR "
            "— refusing to run as independent single-process copies"
        )

    if is_distributed_env():
        # Cloud TPU metadata discovery (coordinator etc. auto-resolved)
        jax.distributed.initialize()
        _INITIALIZED = True
        return True

    return False  # single process — nothing to do


def process_info() -> dict:
    """Process/host topology for logs and metrics."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
