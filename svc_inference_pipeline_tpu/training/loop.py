"""Training orchestration: checkpoint/resume, fault tolerance, logging.

None of this exists in the reference (load-only checkpoints, no optimiser,
no failure handling beyond exit() — SURVEY §5). Mechanisms here:

* periodic Orbax checkpoints of the full train state + deterministic
  resume (step counter and PRNG folded from the step),
* non-finite-loss guard: a step producing NaN/Inf loss is SKIPPED (the
  previous state is kept) and counted; training aborts if too many
  consecutive steps misbehave — cheap elastic recovery for a single host,
* metrics via utils.observability.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from svc_inference_pipeline_tpu.checkpoints.native_io import load_checkpoint, save_checkpoint
from svc_inference_pipeline_tpu.utils.observability import Metrics, get_logger


def train_diffusion(
    cfg,
    loader: Iterable,
    num_steps: int,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 1000,
    mesh=None,
    seed: int = 0,
    max_bad_steps: int = 25,
) -> "DiffusionTrainState":
    """Run the diffusion objective over ``loader`` for ``num_steps``."""
    from svc_inference_pipeline_tpu.training.diffusion import (
        DiffusionTrainState,
        init_diffusion_train_state,
        make_diffusion_train_step,
    )

    log = get_logger("svc_tpu.train")
    metrics = Metrics.default()

    key = jax.random.PRNGKey(seed)
    state, optimizer = init_diffusion_train_state(cfg, key)
    step_fn = make_diffusion_train_step(cfg, optimizer, mesh=mesh)

    start_step = 0
    if checkpoint_dir and os.path.isdir(os.path.join(checkpoint_dir, "latest")):
        path = os.path.join(checkpoint_dir, "latest")
        try:
            state = load_checkpoint(path, target=state)
        except Exception:
            # pre-EMA checkpoint (no ema_params on disk): restore against
            # the legacy layout and seed the EMA from the restored params
            legacy = DiffusionTrainState(
                step=state.step,
                enc_params=state.enc_params,
                den_params=state.den_params,
                opt_state=state.opt_state,
                ema_params=None,
            )
            restored = load_checkpoint(path, target=legacy)
            state = restored.replace(
                ema_params={"enc": restored.enc_params, "den": restored.den_params}
            )
            log.info("migrated pre-EMA checkpoint: EMA seeded from params")
        start_step = int(state.step)
        log.info("resumed from step %d", start_step)

    if mesh is not None:
        state = step_fn.shard_state(state)

    from svc_inference_pipeline_tpu.training.elastic import fault_hook, heartbeat

    bad_streak = 0
    it = iter(loader)
    for step in range(start_step, num_steps):
        # env-driven fault injection (SVC_FAULT_INJECT) + supervisor
        # heartbeat (SVC_HEARTBEAT_DIR) — both no-ops in production runs
        injected = fault_hook(step)
        heartbeat(step)

        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)

        arrays = {k: jnp.asarray(v) for k, v in batch.items() if k != "wave"}
        if injected == "nan":
            arrays = {k: jnp.full_like(v, jnp.nan) if k == "mel" else v
                      for k, v in arrays.items()}
        if mesh is not None:
            arrays = step_fn.batch_shard(arrays)

        step_key = jax.random.fold_in(key, step)
        new_state, loss = step_fn(state, arrays, step_key)
        loss_val = float(loss)

        if not np.isfinite(loss_val):
            bad_streak += 1
            metrics.incr("train/skipped_nonfinite")
            log.warning("non-finite loss at step %d — skipping update (%d in a row)",
                        step, bad_streak)
            if bad_streak > max_bad_steps:
                raise RuntimeError(
                    f"{bad_streak} consecutive non-finite losses — aborting"
                )
            continue

        bad_streak = 0
        state = new_state
        metrics.observe("train/loss", loss_val)
        if step % 100 == 0:
            log.info("step %d loss %.4f", step, loss_val)

        if checkpoint_dir and (step + 1) % checkpoint_every == 0:
            path = os.path.join(checkpoint_dir, "latest")
            save_checkpoint(path, jax.device_get(state))
            log.info("checkpointed step %d → %s", step + 1, path)

    return state
