"""Discriminators + GAN training step tests (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svc_inference_pipeline_tpu.config import HParams
from svc_inference_pipeline_tpu.models.discriminators import (
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
    PeriodDiscriminator,
)

# >2 min on the 1-CPU CI host (per-file durations audit, BENCH_NOTES.md)
pytestmark = pytest.mark.slow

TINY = HParams(
    fs=24000, n_fft=256, n_mels=20, hop_length=64, win_length=256, fmin=0, fmax=12000,
    vocoder=dict(
        resblock_kernel_sizes=[3],
        upsample_rates=[4, 4, 2, 2],  # ×64 == hop
        input_dim=20,
        upsample_initial_channel=32,
        resblock="1",
        upsample_kernel_sizes=[8, 8, 4, 4],
        resblock_dilation_sizes=[[1, 3, 5]],
        activation="snakebeta",
        snake_logscale=True,
        discriminator_channel_mult=0.125,
        mpd_reshapes=[2, 3],
        use_spectral_norm=False,
        mrd_override=False,
        resolutions=[[128, 32, 128], [64, 16, 64]],
    ),
)


def test_period_discriminator_shapes():
    d = PeriodDiscriminator(period=3, d_mult=1)
    wave = jnp.zeros((2, 100))
    params = d.init(jax.random.PRNGKey(0), wave)["params"]
    out, fmap = d.apply({"params": params}, wave)
    assert out.shape[0] == 2
    assert len(fmap) == 6


def test_mpd_mrd_output_structure():
    # resolutions list must have 3 entries for MRD per reference contract
    cfg = TINY.vocoder.replace(resolutions=[[128, 32, 128], [64, 16, 64], [256, 64, 256]])
    wave = jnp.asarray(np.random.default_rng(0).standard_normal((1, 512)), dtype=jnp.float32)
    mpd = MultiPeriodDiscriminator(cfg)
    p = mpd.init(jax.random.PRNGKey(0), wave, wave)["params"]
    o_r, o_g, f_r, f_g = mpd.apply({"params": p}, wave, wave)
    assert len(o_r) == len(cfg.mpd_reshapes)

    mrd = MultiResolutionDiscriminator(cfg)
    p2 = mrd.init(jax.random.PRNGKey(1), wave, wave)["params"]
    o_r2, o_g2, f_r2, f_g2 = mrd.apply({"params": p2}, wave, wave)
    assert len(o_r2) == 3
    # identical inputs → identical outputs
    for a, b in zip(o_r2, o_g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gan_train_steps_run_and_learn():
    from svc_inference_pipeline_tpu.training.gan import (
        init_gan_train_state,
        make_gan_train_steps,
    )

    key = jax.random.PRNGKey(0)
    state, gopt, dopt = init_gan_train_state(TINY, key)
    disc_step, gen_step = make_gan_train_steps(TINY, gopt, dopt)

    rng = np.random.default_rng(0)
    t_frames = 8
    batch = {
        "mel": jnp.asarray(rng.standard_normal((2, t_frames, 20)), dtype=jnp.float32),
        "wave": jnp.asarray(
            0.1 * rng.standard_normal((2, t_frames * TINY.hop_length)), dtype=jnp.float32
        ),
    }

    state, d_loss = disc_step(state, batch)
    state, g_loss, aux = gen_step(state, batch)
    assert np.isfinite(float(d_loss)) and np.isfinite(float(g_loss))
    assert set(aux) == {"adv", "fm", "mel_l1"}
    assert int(state.step) == 1

    # a few alternating steps should reduce the discriminator loss on a
    # fixed batch (it is learning to separate real from g(z))
    d0 = float(d_loss)
    for _ in range(5):
        state, d_loss = disc_step(state, batch)
    assert float(d_loss) < d0


def test_gan_train_steps_on_mesh():
    """GAN steps shard over a 4-way data-parallel virtual mesh."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs virtual devices")
    from svc_inference_pipeline_tpu.parallel.mesh import make_mesh
    from svc_inference_pipeline_tpu.training.gan import (
        init_gan_train_state,
        make_gan_train_steps,
    )

    mesh = make_mesh(data=4, model=1)
    state, gopt, dopt = init_gan_train_state(TINY, jax.random.PRNGKey(0))
    disc_step, gen_step = make_gan_train_steps(TINY, gopt, dopt, mesh=mesh)
    state = disc_step.shard_state(state)

    rng = np.random.default_rng(1)
    t_frames = 8
    batch = disc_step.batch_shard(
        {
            "mel": jnp.asarray(rng.standard_normal((4, t_frames, 20)), dtype=jnp.float32),
            "wave": jnp.asarray(
                0.1 * rng.standard_normal((4, t_frames * TINY.hop_length)),
                dtype=jnp.float32,
            ),
        }
    )
    with mesh:
        state, d_loss = disc_step(state, batch)
        state, g_loss, aux = gen_step(state, batch)
    assert np.isfinite(float(d_loss)) and np.isfinite(float(g_loss))
