"""Quality-parity scoreboard vs the torch reference (BASELINE.md axes).

Runs the reference's own torch chain — EncoderFramework →
svc_model_inference → denormalize_mel_channel → Generator
(/root/reference/modules/diffsvcrepo_inference.py:154-240,
bigvgan_inference.py:29-42) — against our compiled core with
converted-shared random weights and identical injected noise, on features
from the real reference clip, then reports eval.py's metrics between the
two outputs:

    {"mel_mae": …, "wave_mae": …, "wave_max_err": …, "snr_db": …,
     "f0_rmse_cents": …, "voicing_agreement": …}

This is the same chain the slow test (tests/test_e2e_parity.py) asserts
against; here it runs standalone on local CPU so ``bench.py`` can embed
the figures in the benchmark JSON (the BASELINE.md scoreboard: mel MAE,
F0 RMSE, waveform SNR). Deterministic: fixed seeds end to end.

    python eval_parity.py            # prints one JSON line
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))


def run_parity(vocoder_channels: int = 256, steps: int = 10) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")  # axon boot hook override

    import jax.numpy as jnp
    import numpy as np
    import torch

    from conftest import _install_reference_stubs  # tests/conftest.py

    _install_reference_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    import importlib

    ref_inf = importlib.import_module("modules.diffsvcrepo_inference")
    ref_voc_inf = importlib.import_module("modules.bigvgan_inference")
    ref_afe = importlib.import_module("utils.acoustic_feature_extraction")
    ref_util = importlib.import_module("utils.util")
    ref_encoder = importlib.import_module("modules.encoder")
    ref_diffsvc = importlib.import_module("modules.diffsvc")
    ref_bigvgan = importlib.import_module("modules.bigvgan")

    from svc_inference_pipeline_tpu.checkpoints.torch_convert import (
        convert_mapper_state_dict,
        convert_vocoder_state_dict,
    )
    from svc_inference_pipeline_tpu.config import DEFAULT_CONFIG, HParams, load_config
    from svc_inference_pipeline_tpu.eval import f0_rmse_cents, waveform_snr_db
    from svc_inference_pipeline_tpu.pipeline.convert import SVCPipeline
    from svc_inference_pipeline_tpu.sampling.ddpm import INIT_NOISE_STD

    cfg = load_config(DEFAULT_CONFIG)
    d = cfg.to_dict()
    d["mapper"]["noise_schedule_factors"] = [1e-4, 0.02, steps]
    d["mapper"]["sampler"] = "ddpm"
    d["compute_dtype"] = "float32"
    d["use_pallas_vocoder"] = False
    d["vocoder"]["upsample_initial_channel"] = vocoder_channels
    d["min_mel_file"] = "/root/reference/config/mel_min.pkl"
    d["max_mel_file"] = "/root/reference/config/mel_max.pkl"
    small = HParams(**d)

    pipe = SVCPipeline.from_config(small, random_weights=True, whisper_size="tiny")
    batch, n_frames = pipe.extract_features(
        "/root/reference/test_set/1100000814.wav", "svcc_CDF1"
    )
    padded = batch["melody"].shape[1]
    n_mel = pipe.cfg.mapper.n_mel

    # torch side with shared random weights (converted into our layout)
    ref_cfg = ref_util.JsonHParams(**pipe.cfg.to_dict())
    torch.manual_seed(0)
    enc_t = ref_encoder.EncoderFramework(ref_cfg.mapper).eval()
    den_t = ref_diffsvc.DiffSVC(ref_cfg.mapper).eval()
    gen_t = ref_bigvgan.Generator(ref_cfg.vocoder).eval()
    model = torch.nn.ModuleList([enc_t, den_t])

    cond_params, den_params = convert_mapper_state_dict(model.state_dict(), pipe.cfg.mapper)
    voc_params = convert_vocoder_state_dict(gen_t.state_dict(), pipe.cfg.vocoder)
    pipe.cond_params = jax.device_put(cond_params)
    pipe.denoiser_params = jax.device_put(den_params)
    pipe.vocoder_params = jax.device_put(voc_params)

    # identical injected noise on both sides (ddpm_sample key discipline)
    key = jax.random.PRNGKey(0)
    k2, init_key = jax.random.split(key)
    shape = (1, padded, n_mel)
    init = INIT_NOISE_STD * jax.random.normal(init_key, shape, dtype=jnp.float32)
    step_keys = jax.random.split(k2, steps)
    step_noises = [np.asarray(jax.random.normal(k, shape)) for k in step_keys]

    torch.normal = lambda mean, std, size=None, device=None: torch.from_numpy(
        np.asarray(init)
    )
    it = iter(step_noises)
    ref_inf.noise_like = lambda shape_, device, repeat=False: torch.from_numpy(
        next(it).transpose(0, 2, 1)[:, None]
    )

    t_batch = {
        "content_whisper": torch.from_numpy(np.asarray(batch["content_whisper"], np.float32)),
        "melody": torch.from_numpy(np.asarray(batch["melody"], np.float32)),
        "loudness": torch.from_numpy(np.asarray(batch["loudness"], np.float32)),
        "singer": torch.from_numpy(np.asarray(batch["singer"], np.int64)),
        "y": torch.zeros((1, padded, n_mel)),  # shape-only (SURVEY §2.3 quirk)
    }
    with torch.no_grad():
        mel_norm_t = ref_inf.svc_model_inference(model, t_batch, ref_cfg)
        mel_t = ref_afe.denormalize_mel_channel(mel_norm_t, ref_cfg)
        wave_t = np.asarray(ref_voc_inf.synthesis_audios(gen_t, mel_t, ref_cfg))

    # our side: the ONE compiled core (cond → ddpm → denorm → vocoder)
    arrays = {k: jnp.asarray(v) for k, v in batch.items()}
    wave = pipe._core(
        pipe.cond_params, pipe.denoiser_params, pipe.vocoder_params,
        arrays, jax.random.PRNGKey(0),
        jnp.asarray([padded], jnp.int32), n_frames=padded,
        sampler="ddpm", speedup=1,
    )
    wave_ours = np.asarray(wave)[0]

    # denormalised mel straight from both chains' mels
    from svc_inference_pipeline_tpu.models.diffsvc_fast import make_fast_denoise_fn
    from svc_inference_pipeline_tpu.sampling.ddpm import ddpm_sample

    cond = pipe.cond_encoder.apply({"params": pipe.cond_params}, arrays)
    denoise_fn = make_fast_denoise_fn(
        pipe.denoiser_params, cond, pipe.schedule.num_steps, pipe.cfg.mapper,
        compute_dtype=jnp.float32,
    )
    mel_norm = ddpm_sample(denoise_fn, cond, jax.random.PRNGKey(0), shape, pipe.schedule)
    zero = 1e-12
    lo, hi = np.asarray(pipe._mel_min), np.asarray(pipe._mel_max)
    mel_ours = (np.asarray(mel_norm)[0].T + 1.0) / 2.0 * (
        hi[:, None] - lo[:, None] + zero
    ) + lo[:, None]

    out = {
        "mel_mae": float(np.abs(mel_ours - mel_t.numpy()).mean()),
        "wave_mae": float(np.abs(wave_ours - wave_t).mean()),
        "wave_max_err": float(np.abs(wave_ours - wave_t).max()),
        "snr_db": waveform_snr_db(wave_t, wave_ours),
    }
    out.update(f0_rmse_cents(wave_t, wave_ours, pipe.cfg))
    return out


if __name__ == "__main__":
    print(json.dumps(run_parity()))
