"""Actual multi-process jax.distributed rendezvous (VERDICT r3 #5).

Spawns TWO real OS processes that ``distributed.ensure_initialized()``
into one 2-process jax.distributed job (coordinator on localhost), build
the global mesh over all 4 devices (2 local per process), and check a
cross-process ``psum``. This exercises the initialize path end to end —
the other tests only cover env detection/validation.
"""

import os
import socket
import subprocess
import sys

# not marked slow: the workers rendezvous in ~15 s on the 1-CPU CI host

_WORKER = r"""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")  # axon boot hook override

from svc_inference_pipeline_tpu.parallel import distributed

assert distributed.is_distributed_env()
assert distributed.ensure_initialized()
info = distributed.process_info()
assert info["process_count"] == 2, info
assert info["global_devices"] == 4, info  # 2 local x 2 processes

import jax.numpy as jnp
from functools import partial
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map as _sm
    shard_map = partial(_sm, check_vma=False)
except ImportError:
    from jax.experimental.shard_map import shard_map as _sm
    shard_map = partial(_sm, check_rep=False)

devs = np.asarray(jax.devices())
mesh = Mesh(devs, ("data",))
n = len(devs)

@jax.jit
@partial(shard_map, mesh=mesh, in_specs=P("data"), out_specs=P())
def total(x):
    return jax.lax.psum(jnp.sum(x), "data")

sharding = NamedSharding(mesh, P("data"))
host = np.arange(n * 3, dtype=np.float32)  # 3 elements per device shard
garr = jax.make_array_from_callback((n * 3,), sharding, lambda idx: host[idx])
out = total(garr)
expected = float(host.sum())
assert float(out) == expected, (float(out), expected)
print("MULTIHOST_OK", jax.process_index(), flush=True)
"""


def test_two_process_rendezvous_and_psum():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            SVC_COORDINATOR=f"127.0.0.1:{port}",
            SVC_NUM_PROCESSES="2",
            SVC_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                cwd=repo,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MULTIHOST_OK {pid}" in out, out
