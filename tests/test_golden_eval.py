"""`eval --golden` plumbing: trained-checkpoint validation, mock-driven.

The real trained checkpoints are not available in this egress-less env, so
this builds synthetic checkpoints in the reference's EXACT on-disk formats —
mapper ``{"state_dict": {"module.…": …}}`` and vocoder
``{"generator_state_dict": …}`` (utils/load_models.py:30,60), whisper
``{"dims", "model_state_dict"}`` (the official OpenAI layout the reference's
vendored loader consumes, whisper_extractor/__init__.py:96-105) — then runs
the full golden command path: load → convert the reference test clip →
score vs the committed golden WAV on the BASELINE.md axes.
"""

import json
import sys

import numpy as np
import pytest
import torch

from svc_inference_pipeline_tpu.config import HParams

pytestmark = pytest.mark.slow  # builds 3 checkpoints + runs the full chain


@pytest.fixture(scope="module")
def small_cfg(cfg):
    d = cfg.to_dict()
    d["mapper"]["residual_layer_num"] = 2
    d["mapper"]["noise_schedule_factors"] = [0.0001, 0.02, 10]
    d["mapper"]["sampler"] = "plms"
    # match the synthetic whisper checkpoint's width below
    d["mapper"]["input_content_dim"]["whisper"] = 64
    d["vocoder"]["upsample_initial_channel"] = 128
    d["compute_dtype"] = "float32"
    return HParams(**d)


@pytest.fixture(scope="module")
def golden_ckpts(small_cfg, tmp_path_factory, reference_modules):
    """All three checkpoints, reference on-disk formats, tiny shapes."""
    tmp = tmp_path_factory.mktemp("golden_ckpts")
    torch.manual_seed(0)

    enc = reference_modules.encoder.EncoderFramework(small_cfg.mapper)
    den = reference_modules.diffsvc.DiffSVC(small_cfg.mapper)
    mapper = torch.nn.ModuleList([enc, den])
    # DDP-style prefixes — load_models.py:34 strips them
    sd = {f"module.{k}": v for k, v in mapper.state_dict().items()}
    torch.save({"state_dict": sd}, tmp / "mapper.pt")

    gen = reference_modules.bigvgan.Generator(small_cfg.vocoder)
    torch.save({"generator_state_dict": gen.state_dict()}, tmp / "vocoder.pt")

    # whisper: official {dims, model_state_dict} via the reference's own
    # vendored torch model — production mel front-end shape (80 mels,
    # 1500 ctx), toy width so the test stays CPU-cheap
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from utils.whisper_extractor.model import ModelDimensions, Whisper

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=100, n_text_ctx=16, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    wmodel = Whisper(dims).eval()
    with torch.no_grad():  # reference leaves this uninitialised (torch.empty)
        wmodel.decoder.positional_embedding.normal_(0.0, 0.02)
    torch.save(
        {"dims": dims.__dict__, "model_state_dict": wmodel.state_dict()},
        tmp / "whisper-toy.pt",
    )
    return {
        "mapper": str(tmp / "mapper.pt"),
        "vocoder": str(tmp / "vocoder.pt"),
        "whisper": str(tmp / "whisper-toy.pt"),
    }


def test_golden_eval_end_to_end(small_cfg, golden_ckpts, tmp_path):
    from svc_inference_pipeline_tpu.eval import golden_eval

    cfg = small_cfg.replace(
        svc_model_path=golden_ckpts["mapper"],
        vocoder_model_path=golden_ckpts["vocoder"],
        whisper_model=golden_ckpts["whisper"],
    )
    out_wav = tmp_path / "converted.wav"
    metrics = golden_eval(cfg, output_path=str(out_wav))

    # every BASELINE.md axis is present and finite (values are meaningless
    # with synthetic weights — this validates the PLUMBING end to end)
    for key in ("mel_mae", "mcd_db", "snr_db", "f0_rmse_cents",
                "voicing_agreement", "rtf", "duration_s"):
        assert key in metrics, key
        assert np.isfinite(metrics[key]), (key, metrics[key])
    assert out_wav.exists()
    json.dumps(metrics)  # the CLI prints this — must be serialisable


def test_golden_eval_missing_checkpoint_raises(small_cfg, golden_ckpts):
    """No silent random fallback: a missing trained checkpoint must raise
    with remediation text (VERDICT r4 missing #1)."""
    from svc_inference_pipeline_tpu.eval import golden_eval

    cfg = small_cfg.replace(
        svc_model_path="/nonexistent/mapper.pt",
        vocoder_model_path=golden_ckpts["vocoder"],
    )
    with pytest.raises(FileNotFoundError, match="not publicly downloadable"):
        golden_eval(cfg)


def test_golden_cli_arg_plumbing(monkeypatch, capsys, small_cfg, golden_ckpts):
    """`--golden --mapper … --vocoder … --whisper …` reaches golden_eval
    with the overridden cfg paths and prints its JSON."""
    import svc_inference_pipeline_tpu.eval as ev

    seen = {}

    def fake_golden(cfg, input_path, singer, golden_path, output_path):
        seen.update(mapper=cfg.svc_model_path, vocoder=cfg.vocoder_model_path,
                    whisper=cfg.whisper_model, singer=singer)
        return {"ok": 1.0}

    monkeypatch.setattr(ev, "golden_eval", fake_golden)
    rc = ev.main([
        "--golden", "--config", "config/config.json",
        "--mapper", golden_ckpts["mapper"],
        "--vocoder", golden_ckpts["vocoder"],
        "--whisper", golden_ckpts["whisper"],
        "--singer", "svcc_CDM1",
    ])
    assert rc == 0
    assert seen == {
        "mapper": golden_ckpts["mapper"],
        "vocoder": golden_ckpts["vocoder"],
        "whisper": golden_ckpts["whisper"],
        "singer": "svcc_CDM1",
    }
    assert json.loads(capsys.readouterr().out) == {"ok": 1.0}
