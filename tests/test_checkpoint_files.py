"""File-level checkpoint loading: real torch .pt files → SVCPipeline.

Exercises the production path the reference uses (torch.load with
``state_dict``/``generator_state_dict`` keys, utils/load_models.py:23-79),
including DDP-prefixed keys, plus native npz/orbax round-trips.
"""

import numpy as np
import pytest
import torch

from svc_inference_pipeline_tpu.config import HParams


@pytest.fixture(scope="module")
def small_cfg(cfg):
    d = cfg.to_dict()
    d["mapper"]["residual_layer_num"] = 2
    d["mapper"]["noise_schedule_factors"] = [0.0001, 0.02, 10]
    d["mapper"]["sampler"] = "plms"
    # match the tiny random whisper's 384-wide features (no 769M ckpt in env)
    d["mapper"]["input_content_dim"]["whisper"] = 384
    d["vocoder"]["upsample_initial_channel"] = 128
    return HParams(**d)


@pytest.fixture(scope="module")
def checkpoint_files(small_cfg, tmp_path_factory, reference_modules):
    """Build real torch checkpoints with the reference's own modules."""
    tmp = tmp_path_factory.mktemp("ckpts")
    torch.manual_seed(0)
    enc = reference_modules.encoder.EncoderFramework(small_cfg.mapper)
    den = reference_modules.diffsvc.DiffSVC(small_cfg.mapper)
    mapper = torch.nn.ModuleList([enc, den])
    # DDP-style prefixes must be stripped by the loader
    sd = {f"module.{k}": v for k, v in mapper.state_dict().items()}
    torch.save({"state_dict": sd}, tmp / "mapper.pt")

    gen = reference_modules.bigvgan.Generator(small_cfg.vocoder)
    torch.save({"generator_state_dict": gen.state_dict()}, tmp / "vocoder.pt")
    return str(tmp / "mapper.pt"), str(tmp / "vocoder.pt"), mapper, gen


def test_pipeline_loads_torch_checkpoints(small_cfg, checkpoint_files, test_wav):
    from svc_inference_pipeline_tpu.pipeline.convert import SVCPipeline

    mapper_path, vocoder_path, ref_mapper, ref_gen = checkpoint_files
    cfg = small_cfg.replace(svc_model_path=mapper_path, vocoder_model_path=vocoder_path)

    pipe = SVCPipeline.from_config(cfg, random_weights=False, whisper_size="tiny")
    # whisper falls back to random (no 769M checkpoint in env) but mapper +
    # vocoder must be the converted torch weights: check one tensor exactly
    ref_w = ref_mapper.state_dict()["1.mel_preprocess.projection.weight"].numpy()
    ours = np.asarray(pipe.denoiser_params["mel_preprocess"]["kernel"], dtype=np.float32)
    # denoiser weights are stored bf16 on device (BENCH_NOTES) → bf16 tolerance
    np.testing.assert_allclose(ours, ref_w[:, :, 0].T, atol=4e-3)
    # the condition encoder keeps f32 — exact
    ref_emb = ref_mapper.state_dict()["0.registered_modules_dict.singer.nn.weight"].numpy()
    np.testing.assert_array_equal(
        np.asarray(pipe.cond_params["singer"]["embedding"]), ref_emb
    )

    # the loaded pipeline converts end to end
    import jax

    wave = pipe.convert(test_wav, "svcc_CDF1", key=jax.random.PRNGKey(0))
    assert np.isfinite(wave).all()


def test_native_checkpoint_roundtrip(small_cfg, checkpoint_files, tmp_path):
    """Converted params persist/load through npz and orbax identically."""
    from svc_inference_pipeline_tpu.checkpoints import (
        load_checkpoint,
        load_mapper_params,
        save_checkpoint,
    )

    mapper_path, _, _, _ = checkpoint_files
    enc_params, den_params = load_mapper_params(mapper_path, small_cfg.mapper)

    npz = str(tmp_path / "mapper_native.npz")
    save_checkpoint(npz, {"enc": enc_params, "den": den_params})
    back = load_checkpoint(npz)
    np.testing.assert_array_equal(
        back["den"]["residual_0"]["dilated_conv"]["kernel"],
        np.asarray(den_params["residual_0"]["dilated_conv"]["kernel"]),
    )

    try:
        import orbax.checkpoint  # noqa: F401
    except ImportError:
        pytest.skip("orbax unavailable")
    odir = str(tmp_path / "orbax_ckpt")
    save_checkpoint(odir, {"enc": enc_params, "den": den_params})
    back2 = load_checkpoint(odir)
    np.testing.assert_array_equal(
        back2["den"]["residual_1"]["conditioner_projection"]["kernel"],
        np.asarray(den_params["residual_1"]["conditioner_projection"]["kernel"]),
    )
