"""Fault injection + gang-restart elastic recovery (training/elastic.py).

The reference has no failure handling beyond exit()/empty-return
(SURVEY §5). These tests drive the supervisor with real OS processes:
a worker killed mid-run (or hung, caught via stale heartbeat) causes a
gang teardown + relaunch, and training resumes from the latest
checkpoint to the configured step count.
"""

import os
import subprocess
import sys
import textwrap

import pytest

from svc_inference_pipeline_tpu.training.elastic import (
    ElasticFailure,
    FaultInjector,
    InjectedFault,
    _reset_injector_for_tests,
    fault_hook,
    run_elastic,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------- injector

def test_fault_spec_parsing():
    faults = FaultInjector.parse("die@5:a0, nan@3:p1, hang@7:p0:a2")
    assert [(f.action, f.step, f.process_id, f.attempt) for f in faults] == [
        ("die", 5, None, 0), ("nan", 3, 1, None), ("hang", 7, 0, 2)]
    with pytest.raises(ValueError):
        FaultInjector.parse("explode@5")
    with pytest.raises(ValueError):
        FaultInjector.parse("die@x")
    with pytest.raises(ValueError):
        FaultInjector.parse("die@5:z9")


def test_fault_scoping(monkeypatch):
    inj = FaultInjector(FaultInjector.parse("exc@4:p1:a1"))
    monkeypatch.setenv("SVC_PROCESS_ID", "1")
    monkeypatch.setenv("SVC_ELASTIC_ATTEMPT", "0")
    assert inj.action_for(4) is None          # wrong attempt
    monkeypatch.setenv("SVC_ELASTIC_ATTEMPT", "1")
    assert inj.action_for(4) == "exc"
    assert inj.action_for(3) is None          # wrong step
    monkeypatch.setenv("SVC_PROCESS_ID", "0")
    assert inj.action_for(4) is None          # wrong process
    monkeypatch.setenv("SVC_PROCESS_ID", "1")
    with pytest.raises(InjectedFault):
        inj.fire(4)


def test_fault_hook_unset_is_noop(monkeypatch):
    monkeypatch.delenv("SVC_FAULT_INJECT", raising=False)
    _reset_injector_for_tests()
    assert fault_hook(0) is None
    _reset_injector_for_tests()


# ------------------------------------------------------- stub-worker gangs

# A dependency-free worker: checkpointed step counter in a file, fault
# hook + heartbeat each step. Fast (no jax import) — tests pure
# supervisor semantics.
_STUB = textwrap.dedent("""
    import os, sys, time
    sys.path.insert(0, {repo!r})
    from svc_inference_pipeline_tpu.training.elastic import fault_hook, heartbeat
    state = sys.argv[1] + ".w" + os.environ.get("SVC_PROCESS_ID", "0")
    start = int(open(state).read()) if os.path.exists(state) else 0
    for step in range(start, 8):
        fault_hook(step)
        heartbeat(step)
        with open(state, "w") as f:
            f.write(str(step + 1))
        time.sleep(0.05)
""").format(repo=REPO)


def _stub_argv(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_STUB)
    return [sys.executable, str(script), str(tmp_path / "state")]


def test_supervisor_clean_completion(tmp_path):
    res = run_elastic(_stub_argv(tmp_path), num_workers=1, max_restarts=1)
    assert res.restarts == 0
    assert (tmp_path / "state.w0").read_text() == "8"


def test_supervisor_restarts_crashed_gang(tmp_path):
    # worker 1 of 2 dies at step 5 on attempt 0 only; the supervisor must
    # tear down the healthy worker 0 too, relaunch, and both must resume
    # from their file checkpoints and finish
    res = run_elastic(
        _stub_argv(tmp_path), num_workers=2, max_restarts=2,
        extra_env={"SVC_FAULT_INJECT": "die@5:p1:a0"},
        poll_interval=0.05,
    )
    assert res.restarts == 1
    assert res.attempts[0]["failure"] is not None
    assert 13 in res.attempts[0]["exit_codes"]
    assert res.attempts[1]["failure"] is None
    assert (tmp_path / "state.w0").read_text() == "8"
    assert (tmp_path / "state.w1").read_text() == "8"


def test_supervisor_detects_hang_via_heartbeat(tmp_path):
    res = run_elastic(
        _stub_argv(tmp_path), num_workers=1, max_restarts=1,
        heartbeat_timeout=1.5, heartbeat_dir=str(tmp_path / "hb"),
        extra_env={"SVC_FAULT_INJECT": "hang@4:a0"},
        poll_interval=0.05, grace_period=1.0,
    )
    assert res.restarts == 1
    assert "heartbeat stale" in res.attempts[0]["failure"]
    assert (tmp_path / "state.w0").read_text() == "8"


def test_supervisor_startup_grace(tmp_path):
    # hang BEFORE the first beat: invisible to the staleness clock (which
    # starts at the first beat — pre-step-0 compile can take minutes),
    # caught by startup_grace instead
    res = run_elastic(
        _stub_argv(tmp_path), num_workers=1, max_restarts=1,
        # generous: the stub still pays the package import (~seconds on a
        # contended CI host) before its first beat
        heartbeat_timeout=30.0, startup_grace=10.0,
        heartbeat_dir=str(tmp_path / "hb"),
        extra_env={"SVC_FAULT_INJECT": "hang@0:a0"},
        poll_interval=0.05, grace_period=1.0,
    )
    assert res.restarts == 1
    assert "no first heartbeat" in res.attempts[0]["failure"]
    assert (tmp_path / "state.w0").read_text() == "8"


def test_supervisor_restart_budget_exhausted(tmp_path):
    with pytest.raises(ElasticFailure) as ei:
        run_elastic(
            _stub_argv(tmp_path), num_workers=1, max_restarts=1,
            extra_env={"SVC_FAULT_INJECT": "die@5"},  # every attempt
            poll_interval=0.05,
        )
    assert len(ei.value.result.attempts) == 2
    assert all(a["failure"] for a in ei.value.result.attempts)


# ------------------------------------------- real training-loop integration

# One-worker gang running the real train_diffusion on the tiny config:
# dies at step 5 (attempt 0), restarts, resumes from the step-4 Orbax
# checkpoint, completes 8 steps.
_TRAIN_WORKER = textwrap.dedent("""
    import sys
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")  # axon boot hook override

    from svc_inference_pipeline_tpu.config import DEFAULT_CONFIG, HParams, load_config
    from svc_inference_pipeline_tpu.training.loop import train_diffusion

    d = load_config(DEFAULT_CONFIG).to_dict()
    d["mapper"]["residual_layer_num"] = 2
    d["mapper"]["noise_schedule_factors"] = [0.0001, 0.02, 10]
    d["mapper"]["input_content_dim"] = {{"whisper": 16}}
    d["mapper"]["content_feature"] = ["whisper"]
    cfg = HParams(**d)

    rng = np.random.default_rng(0)
    loader = [{{
        "mel": rng.standard_normal((2, 32, 100)).astype(np.float32) * 0.1,
        "content_whisper": rng.standard_normal((2, 32, 16)).astype(np.float32),
        "melody": np.abs(rng.uniform(0, 500, (2, 32))).astype(np.float32),
        "loudness": np.abs(rng.uniform(0, 1, (2, 32))).astype(np.float32),
        "singer": np.zeros((2, 1), dtype=np.int32),
    }} for _ in range(4)]

    state = train_diffusion(cfg, loader, num_steps=8,
                            checkpoint_dir=sys.argv[1], checkpoint_every=2)
    assert int(state.step) == 8, int(state.step)
""").format(repo=REPO)


def test_elastic_training_resumes_from_checkpoint(tmp_path):
    script = tmp_path / "train_worker.py"
    script.write_text(_TRAIN_WORKER)
    ckpt_dir = tmp_path / "ckpts"
    res = run_elastic(
        [sys.executable, str(script), str(ckpt_dir)],
        num_workers=1, max_restarts=1,
        extra_env={"SVC_FAULT_INJECT": "die@5:a0"},
        log_dir=str(tmp_path / "logs"),
    )
    assert res.restarts == 1
    assert 13 in res.attempts[0]["exit_codes"]
    assert res.attempts[1]["exit_codes"] == [0]
    assert os.path.isdir(ckpt_dir / "latest")
    # the resumed attempt's log shows the checkpoint restore
    log1 = (tmp_path / "logs" / "worker0_a1.log").read_text()
    assert "resumed from step" in log1


# ------------------------------------- real jax.distributed gang recovery

# The claim the gang-restart design rests on: a dead worker WEDGES the
# survivors inside their next collective (no shrink), so recovery must
# reap the whole gang and relaunch it. Two real processes rendezvous via
# jax.distributed, psum once per step, and checkpoint through process 0;
# worker 1 is killed at step 5 on attempt 0, leaving worker 0 blocked in
# the step-5 psum — the supervisor must SIGTERM/SIGKILL it, relaunch on a
# fresh coordinator port, and both workers must resume at step 5 and
# finish in lockstep.
_DIST_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")  # axon boot hook override

    from svc_inference_pipeline_tpu.parallel import distributed
    from svc_inference_pipeline_tpu.training.elastic import fault_hook, heartbeat

    assert distributed.ensure_initialized()
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
    ckpt = sys.argv[1]  # process-0-owned global checkpoint (step counter)
    start = int(open(ckpt).read()) if os.path.exists(ckpt) else 0
    pid = jax.process_index()
    for step in range(start, 8):
        fault_hook(step)
        heartbeat(step)
        host = np.full((n * 2,), float(step + 1), dtype=np.float32)
        garr = jax.make_array_from_callback((n * 2,), sharding, lambda idx: host[idx])
        got = float(total(garr))          # cross-process collective
        assert got == (step + 1) * n * 2, (got, step)
        if pid == 0:
            with open(ckpt, "w") as f:
                f.write(str(step + 1))
    print("DIST_ELASTIC_OK", pid, flush=True)
""").format(repo=REPO)


def test_elastic_recovers_real_distributed_gang(tmp_path):
    script = tmp_path / "dist_worker.py"
    script.write_text(_DIST_WORKER)
    res = run_elastic(
        [sys.executable, str(script), str(tmp_path / "ckpt")],
        num_workers=2, max_restarts=1,
        extra_env={"SVC_FAULT_INJECT": "die@5:p1:a0",
                   "XLA_FLAGS": "--xla_force_host_platform_device_count=2"},
        log_dir=str(tmp_path / "logs"), grace_period=10.0,
    )
    assert res.restarts == 1
    assert 13 in res.attempts[0]["exit_codes"]          # the injected kill
    assert res.attempts[1]["exit_codes"] == [0, 0]
    assert (tmp_path / "ckpt").read_text() == "8"
    for wid in range(2):
        log1 = (tmp_path / "logs" / f"worker{wid}_a1.log").read_text()
        assert f"DIST_ELASTIC_OK {wid}" in log1
