"""Training loop: data pipeline, NaN guard, checkpoint/resume."""

import os

import numpy as np
import pytest

from svc_inference_pipeline_tpu.config import HParams


@pytest.fixture(scope="module")
def small_cfg(cfg):
    d = cfg.to_dict()
    d["mapper"]["residual_layer_num"] = 2
    d["mapper"]["noise_schedule_factors"] = [0.0001, 0.02, 10]
    d["mapper"]["input_content_dim"] = {"whisper": 16}
    d["mapper"]["content_feature"] = ["whisper"]
    return HParams(**d)


def _fake_loader(n_batches=4, b=2, t=32, content_dim=16):
    rng = np.random.default_rng(0)
    for _ in range(n_batches):
        yield {
            "mel": rng.standard_normal((b, t, 100)).astype(np.float32) * 0.1,
            "content_whisper": rng.standard_normal((b, t, content_dim)).astype(np.float32),
            "melody": np.abs(rng.uniform(0, 500, (b, t))).astype(np.float32),
            "loudness": np.abs(rng.uniform(0, 1, (b, t))).astype(np.float32),
            "singer": np.zeros((b, 1), dtype=np.int32),
        }


def test_train_loop_runs_and_checkpoints(small_cfg, tmp_path):
    from svc_inference_pipeline_tpu.training.loop import train_diffusion

    ckpt_dir = str(tmp_path / "ckpts")
    state = train_diffusion(
        small_cfg,
        list(_fake_loader()),
        num_steps=5,
        checkpoint_dir=ckpt_dir,
        checkpoint_every=3,
    )
    assert int(state.step) == 5
    assert os.path.isdir(os.path.join(ckpt_dir, "latest"))

    # resume continues from the checkpointed step
    state2 = train_diffusion(
        small_cfg,
        list(_fake_loader()),
        num_steps=6,
        checkpoint_dir=ckpt_dir,
        checkpoint_every=100,
    )
    assert int(state2.step) == 6


def test_nan_guard_skips_bad_batches(small_cfg):
    from svc_inference_pipeline_tpu.training.loop import train_diffusion

    batches = list(_fake_loader(n_batches=4))
    batches[1]["mel"][:] = np.nan  # poison one batch
    state = train_diffusion(small_cfg, batches, num_steps=4)
    # step counter only advances on good updates: 4 attempts − 1 skipped
    assert int(state.step) == 3


def test_bucketed_loader(cfg, test_wav, tmp_path):
    from svc_inference_pipeline_tpu.training.data import BucketedLoader, FeatureExtractor

    extractor = FeatureExtractor(cfg, whisper=None, cache_dir=str(tmp_path / "cache"))
    manifest = [(test_wav, "svcc_CDF1"), (test_wav, "svcc_IDM1")]
    loader = BucketedLoader(manifest, cfg, extractor, batch_size=2, buckets=(256, 512))

    batches = list(loader)
    assert len(batches) == 1
    b = batches[0]
    assert b["mel"].shape == (2, 512, 100) or b["mel"].shape[1] in (256, 512)
    assert b["wave"].shape[1] == b["mel"].shape[1] * cfg.hop_length
    assert b["singer"].tolist() == [[1], [4]]
    # feature cache hit on second pass
    batches2 = list(loader)
    np.testing.assert_allclose(batches2[0]["loudness"].sum(), b["loudness"].sum(), rtol=0.2)


def test_ema_shadow_weights(small_cfg):
    """One train step updates the EMA exactly as d·init + (1−d)·new with
    the warmup decay d = min(0.999, (1+step)/(10+step))."""
    import jax
    import jax.numpy as jnp

    from svc_inference_pipeline_tpu.training.diffusion import (
        init_diffusion_train_state,
        make_diffusion_train_step,
    )

    state, optimizer = init_diffusion_train_state(small_cfg, jax.random.PRNGKey(0))
    step_fn = make_diffusion_train_step(small_cfg, optimizer, ema_decay=0.999)
    batch = next(iter(_fake_loader(1)))
    arrays = {k: jnp.asarray(v) for k, v in batch.items()}

    init_params = {"enc": state.enc_params, "den": state.den_params}
    new_state, loss = step_fn(state, arrays, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    d = min(0.999, 1.0 / 10.0)  # step 0 warmup
    new_params = {"enc": new_state.enc_params, "den": new_state.den_params}
    expect = jax.tree_util.tree_map(
        lambda e, p: e * d + p * (1.0 - d), init_params, new_params
    )
    flat_got = jax.tree_util.tree_leaves(new_state.ema_params)
    flat_exp = jax.tree_util.tree_leaves(expect)
    for g, e in zip(flat_got, flat_exp):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e), rtol=1e-5, atol=1e-7)


def test_resume_from_pre_ema_checkpoint(small_cfg, tmp_path):
    """Checkpoints written before the EMA field existed restore with the
    EMA seeded from the restored params (migration path)."""
    import jax

    from svc_inference_pipeline_tpu.checkpoints.native_io import save_checkpoint
    from svc_inference_pipeline_tpu.training.diffusion import init_diffusion_train_state
    from svc_inference_pipeline_tpu.training.loop import train_diffusion

    state, _ = init_diffusion_train_state(small_cfg, jax.random.PRNGKey(0))
    legacy = state.replace(step=state.step + 3, ema_params=None)
    ckpt_dir = tmp_path / "ckpts"
    save_checkpoint(str(ckpt_dir / "latest"), jax.device_get(legacy))

    out = train_diffusion(
        small_cfg, list(_fake_loader()), num_steps=5, checkpoint_dir=str(ckpt_dir)
    )
    assert int(out.step) == 5
    assert out.ema_params is not None
    leaves = jax.tree_util.tree_leaves(out.ema_params)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)
