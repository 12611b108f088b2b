"""Numerical parity: our Flax models vs the reference torch modules.

The reference's own nn.Modules (imported from /root/reference with missing
native deps stubbed) are initialised randomly, their state_dicts converted
through checkpoints/torch_convert, and outputs compared on random inputs.
This validates both the model math and the converter layout mapping.
"""

import numpy as np
import pytest
import torch

from svc_inference_pipeline_tpu.checkpoints.torch_convert import (
    convert_mapper_state_dict,
    convert_vocoder_state_dict,
)
from svc_inference_pipeline_tpu.models.diffsvc import DiffSVCDenoiser
from svc_inference_pipeline_tpu.models.encoder import ConditionEncoder

B, T = 1, 64


@pytest.fixture(scope="module")
def mapper_cfg(cfg):
    return cfg.mapper


@pytest.fixture(scope="module")
def ref_mapper(reference_modules, mapper_cfg):
    torch.manual_seed(0)
    enc = reference_modules.encoder.EncoderFramework(mapper_cfg)
    den = reference_modules.diffsvc.DiffSVC(mapper_cfg)
    model = torch.nn.ModuleList([enc, den]).eval()
    return model


@pytest.fixture(scope="module")
def batch(mapper_cfg):
    rng = np.random.default_rng(0)
    return {
        "content_whisper": rng.standard_normal((B, T, 1024)).astype(np.float32),
        "melody": np.abs(rng.uniform(0, 800, (B, T))).astype(np.float32),
        "loudness": np.abs(rng.uniform(0, 1.4, (B, T))).astype(np.float32),
        "singer": np.array([[1]], dtype=np.int32),
    }


def test_condition_encoder_parity(ref_mapper, mapper_cfg, batch):
    enc_params, _ = convert_mapper_state_dict(ref_mapper.state_dict(), mapper_cfg)

    with torch.no_grad():
        ref_out = ref_mapper[0](
            {
                "content_whisper": torch.from_numpy(batch["content_whisper"]),
                "melody": torch.from_numpy(batch["melody"]),
                "loudness": torch.from_numpy(batch["loudness"]),
                "singer": torch.from_numpy(batch["singer"].astype(np.int64)),
            }
        ).numpy()

    ours = np.asarray(
        ConditionEncoder(mapper_cfg).apply({"params": enc_params}, batch)
    )
    assert ours.shape == ref_out.shape == (B, T, 384)
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)


def test_bucketize_matches_searchsorted():
    import jax.numpy as jnp

    from svc_inference_pipeline_tpu.models.encoder import melody_bins

    bins = melody_bins(256)
    x = np.array([0.0, 1.0, 32.6, 32.71, 440.0, 2093.0, 2093.01, 5000.0], dtype=np.float32)
    t = torch.bucketize(torch.from_numpy(x), torch.from_numpy(bins)).numpy()
    j = np.asarray(jnp.searchsorted(jnp.asarray(bins), jnp.asarray(x), side="left"))
    np.testing.assert_array_equal(t, j)
    assert t[0] == 0 and t[-1] == 255  # unvoiced → 0, above C7 → top bin


def test_melody_bin_semantics():
    from svc_inference_pipeline_tpu.models.encoder import melody_bins

    bins = melody_bins(256)
    assert bins.shape == (255,)
    # documented mapping (encoder.py:41-46): f0_min→1, f0_max→254, above→255
    f0_min, f0_max = 32.70319566257483, 2093.004522404789
    t = torch.bucketize(torch.tensor([f0_min, f0_max, f0_max + 1]), torch.from_numpy(bins))
    assert t[0].item() == 1
    assert t[1].item() == 254
    assert t[2].item() == 255


@pytest.mark.parametrize("t_step", [0, 500, 999])
def test_diffsvc_denoiser_parity(ref_mapper, mapper_cfg, batch, t_step):
    _, den_params = convert_mapper_state_dict(ref_mapper.state_dict(), mapper_cfg)

    rng = np.random.default_rng(1)
    noisy = rng.standard_normal((B, T, 100)).astype(np.float32)
    cond = rng.standard_normal((B, T, 384)).astype(np.float32)

    with torch.no_grad():
        ref_out, _stats = ref_mapper[1](
            torch.from_numpy(noisy),
            torch.from_numpy(cond),
            torch.full((B, 1), t_step, dtype=torch.int64),
        )
    ref_out = ref_out.numpy()

    ours = np.asarray(
        DiffSVCDenoiser(mapper_cfg).apply(
            {"params": den_params},
            noisy,
            cond,
            np.full((B, 1), t_step, dtype=np.int32),
        )
    )
    assert ours.shape == ref_out.shape == (B, T, 100)
    err = np.abs(ours - ref_out).max()
    assert err < 5e-4, f"denoiser max err {err} at t={t_step}"


def test_step_embedding_matches_reference_table(ref_mapper):
    """The closed-form embedding must equal the precomputed table rows."""
    from svc_inference_pipeline_tpu.models.diffsvc import step_embedding

    table = ref_mapper[1].diffusion_embedding.embedding.numpy()  # [1000, 128]
    ts = np.array([0, 1, 17, 999], dtype=np.float32)
    ours = np.asarray(step_embedding(ts, 128))
    np.testing.assert_allclose(ours, table[ts.astype(int)], rtol=2e-3, atol=2e-5)


def test_conv_transpose_matches_torch():
    from svc_inference_pipeline_tpu.models.bigvgan import TorchConvTranspose1d

    torch.manual_seed(0)
    for cin, cout, k, u in [(16, 8, 8, 4), (8, 4, 4, 2)]:
        ref = torch.nn.ConvTranspose1d(cin, cout, k, u, padding=(k - u) // 2)
        x = torch.randn(2, cin, 37)
        with torch.no_grad():
            ref_y = ref(x).numpy()  # [B, Cout, T*u]

        params = {
            "kernel": ref.weight.detach().numpy().transpose(2, 1, 0),
            "bias": ref.bias.detach().numpy(),
        }
        ours = np.asarray(
            TorchConvTranspose1d(cout, k, u).apply(
                {"params": params}, x.numpy().transpose(0, 2, 1)
            )
        ).transpose(0, 2, 1)
        np.testing.assert_allclose(ours, ref_y, rtol=1e-4, atol=1e-5)


def test_weight_norm_folding():
    from svc_inference_pipeline_tpu.checkpoints.torch_convert import fold_weight_norm

    torch.manual_seed(0)
    conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(4, 8, 3))
    sd = {k: v.detach().numpy() for k, v in conv.state_dict().items()}
    folded = fold_weight_norm(sd)
    with torch.no_grad():
        x = torch.randn(1, 4, 16)
        expected = conv(x).numpy()
        plain = torch.nn.Conv1d(4, 8, 3)
        plain.weight.data = torch.from_numpy(folded["weight"])
        plain.bias.data = torch.from_numpy(folded["bias"])
        got = plain(x).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)
