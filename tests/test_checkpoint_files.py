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

    # without the explicit opt-in, a production pipeline must REFUSE to run
    # on random whisper weights (silent-garbage guard, ADVICE r4)
    with pytest.raises(FileNotFoundError, match="whisper checkpoint"):
        SVCPipeline.from_config(cfg, random_weights=False, whisper_size="tiny")

    # opted in: the fallback random-inits at the CONFIGURED size (tiny here)
    cfg = cfg.replace(allow_random_whisper=True, whisper_model="tiny")
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


class TestSha256Integrity:
    """Local-file integrity checks matching the reference's post-download
    sha256 rule (/root/reference/utils/whisper_extractor/__init__.py:33-64,
    minus the download — zero-egress env)."""

    def test_file_sha256_matches_hashlib(self, tmp_path):
        import hashlib

        from svc_inference_pipeline_tpu.checkpoints.torch_convert import file_sha256

        p = tmp_path / "blob.bin"
        p.write_bytes(b"svc" * 12345)
        assert file_sha256(str(p)) == hashlib.sha256(b"svc" * 12345).hexdigest()

    def test_verify_sha256_raises_on_mismatch(self, tmp_path):
        from svc_inference_pipeline_tpu.checkpoints.torch_convert import verify_sha256

        p = tmp_path / "ckpt.pt"
        p.write_bytes(b"not the advertised bytes")
        with pytest.raises(RuntimeError, match="SHA256 checksum does not match"):
            verify_sha256(str(p), "0" * 64)

    def test_load_mapper_rejects_bad_digest_before_load(self, tmp_path):
        from svc_inference_pipeline_tpu.checkpoints.torch_convert import (
            load_mapper_params,
        )

        p = tmp_path / "mapper.pt"
        p.write_bytes(b"\x00garbage, never torch.load-ed")
        with pytest.raises(RuntimeError, match="SHA256"):
            load_mapper_params(str(p), None, expected_sha256="f" * 64)

    def test_load_whisper_checks_official_names(self, tmp_path):
        """A file named after an official model is verified against the
        published digest table; verify=False opts out."""
        from svc_inference_pipeline_tpu.checkpoints import torch_convert as tc

        p = tmp_path / "base.pt"
        p.write_bytes(b"wrong contents for the official base model")
        with pytest.raises(RuntimeError, match="SHA256"):
            tc.load_whisper(str(p))

        # explicit digest of the actual bytes passes the check and reaches
        # the loader proper
        good = tc.file_sha256(str(p))
        seen = {}

        def fake_load(path):
            seen["path"] = path
            return {"dims": {"n_mels": 80}, "model_state_dict": {}}

        orig_load, orig_conv = tc._torch_load, tc.convert_whisper_state_dict
        tc._torch_load = fake_load
        tc.convert_whisper_state_dict = lambda sd, encoder_only: {}
        try:
            dims, _ = tc.load_whisper(str(p), expected_sha256=good)
            assert dims == {"n_mels": 80} and seen["path"] == str(p)
            # verify=False also skips the name-table check
            dims2, _ = tc.load_whisper(str(p), verify=False)
            assert dims2 == {"n_mels": 80}
        finally:
            tc._torch_load, tc.convert_whisper_state_dict = orig_load, orig_conv

    def test_unknown_name_skips_table(self, tmp_path):
        """Non-official filenames are not in the digest table: no check."""
        from svc_inference_pipeline_tpu.checkpoints import torch_convert as tc

        p = tmp_path / "custom_finetune.pt"
        p.write_bytes(b"anything")
        orig_load, orig_conv = tc._torch_load, tc.convert_whisper_state_dict
        tc._torch_load = lambda path: {"dims": {}, "model_state_dict": {}}
        tc.convert_whisper_state_dict = lambda sd, encoder_only: {}
        try:
            dims, _ = tc.load_whisper(str(p))
            assert dims == {}
        finally:
            tc._torch_load, tc.convert_whisper_state_dict = orig_load, orig_conv
