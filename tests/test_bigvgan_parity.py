"""BigVGAN generator parity vs the reference torch implementation.

A reduced-size generator (same structure: AMPBlock1, snakebeta+logscale,
anti-aliased activations, 2 upsample stages) is initialised in torch,
converted, and compared end to end. Filter design and up/down-sampling are
additionally compared at the exact production sizes.
"""

import numpy as np
import pytest
import torch

from svc_inference_pipeline_tpu.config import HParams
from svc_inference_pipeline_tpu.checkpoints.torch_convert import convert_vocoder_state_dict
from svc_inference_pipeline_tpu.models.bigvgan import (
    BigVGANGenerator,
    downsample1d,
    kaiser_sinc_filter1d,
    upsample1d,
    vocoder_output_to_audio,
)

TINY_VOCODER = dict(
    resblock_kernel_sizes=[3, 5],
    upsample_rates=[4, 2],
    input_dim=10,
    upsample_initial_channel=32,
    resblock="1",
    upsample_kernel_sizes=[8, 4],
    resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],
    activation="snakebeta",
    snake_logscale=True,
    discriminator_channel_mult=1,
    mpd_reshapes=[2, 3],
    use_spectral_norm=False,
    mrd_override=False,
    resolutions=[[64, 16, 64]] * 3,
)


@pytest.fixture(scope="module")
def tiny_cfg():
    return HParams(**TINY_VOCODER)


def test_kaiser_filter_matches_torch_reference(reference_modules):
    for cutoff, half_width, k in [(0.25, 0.3, 12), (0.125, 0.15, 24), (0.5, 0.6, 12)]:
        ref = reference_modules.bigvgan.kaiser_sinc_filter1d(cutoff, half_width, k)
        ours = kaiser_sinc_filter1d(cutoff, half_width, k)
        np.testing.assert_allclose(ours, ref.numpy().ravel(), rtol=1e-5, atol=1e-7)


def test_upsample_matches_torch_reference(reference_modules):
    up = reference_modules.bigvgan.UpSample1d(ratio=2)
    x = torch.randn(1, 4, 100)
    with torch.no_grad():
        ref = up(x).numpy()
    ours = np.asarray(upsample1d(x.numpy().transpose(0, 2, 1), 2)).transpose(0, 2, 1)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_downsample_matches_torch_reference(reference_modules):
    down = reference_modules.bigvgan.DownSample1d(ratio=2)
    x = torch.randn(1, 4, 100)
    with torch.no_grad():
        ref = down(x).numpy()
    ours = np.asarray(downsample1d(x.numpy().transpose(0, 2, 1), 2)).transpose(0, 2, 1)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_activation1d_matches_torch_reference(reference_modules):
    bg = reference_modules.bigvgan
    torch.manual_seed(3)
    act = bg.Activation1d(activation=bg.SnakeBeta(6, alpha_logscale=True))
    with torch.no_grad():
        act.act.alpha.data = torch.randn(6) * 0.3
        act.act.beta.data = torch.randn(6) * 0.3
        x = torch.randn(1, 6, 80)
        ref = act(x).numpy()

    from svc_inference_pipeline_tpu.models.bigvgan import Activation1d

    params = {
        "alpha": act.act.alpha.detach().numpy(),
        "beta": act.act.beta.detach().numpy(),
    }
    ours = np.asarray(
        Activation1d(6, "snakebeta", True).apply(
            {"params": params}, x.numpy().transpose(0, 2, 1)
        )
    ).transpose(0, 2, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_generator_parity_tiny(reference_modules, tiny_cfg):
    torch.manual_seed(1)
    ref_gen = reference_modules.bigvgan.Generator(tiny_cfg).eval()

    mel = np.random.default_rng(2).standard_normal((1, 10, 50)).astype(np.float32)
    with torch.no_grad():
        ref_wav = ref_gen(torch.from_numpy(mel)).numpy()  # [1, 1, 50*8]

    params = convert_vocoder_state_dict(ref_gen.state_dict(), tiny_cfg)
    ours = np.asarray(
        BigVGANGenerator(tiny_cfg).apply(
            {"params": params}, mel.transpose(0, 2, 1)
        )
    )
    assert ours.shape == (1, 50 * 8)
    err = np.abs(ours - ref_wav[:, 0, :]).max()
    assert err < 2e-4, f"generator max err {err}"


def test_vocoder_output_postprocessing():
    import jax.numpy as jnp

    hop = 256
    frames = 30
    wave = jnp.ones((1, frames * hop + 100))
    out = np.asarray(vocoder_output_to_audio(wave, frames, hop))
    assert out.shape == (1, frames * hop)
    # 20-frame linear fade-out at the tail
    fade = out[0, -20 * hop :]
    assert fade[0] == pytest.approx(1.0)
    assert fade[-1] == pytest.approx(0.0)
    assert np.all(np.diff(fade) <= 1e-6)


def test_generator_pallas_path_matches_xla(reference_modules, tiny_cfg):
    """use_pallas=True (fused act1d + fused AMP pairs on C≤128 stages) must
    match the plain XLA generator on converted reference weights."""
    torch.manual_seed(4)
    ref_gen = reference_modules.bigvgan.Generator(tiny_cfg).eval()
    params = convert_vocoder_state_dict(ref_gen.state_dict(), tiny_cfg)

    mel = np.random.default_rng(5).standard_normal((1, 10, 40)).astype(np.float32)
    mel_nwc = mel.transpose(0, 2, 1)

    xla_out = np.asarray(
        BigVGANGenerator(tiny_cfg, use_pallas=False).apply({"params": params}, mel_nwc)
    )
    pallas_out = np.asarray(
        BigVGANGenerator(tiny_cfg, use_pallas=True).apply({"params": params}, mel_nwc)
    )
    err = np.abs(pallas_out - xla_out).max()
    assert err < 5e-4, f"pallas generator path diverges: {err}"

    with torch.no_grad():
        ref_wav = ref_gen(torch.from_numpy(mel)).numpy()[:, 0, :]
    assert np.abs(pallas_out - ref_wav).max() < 5e-4
