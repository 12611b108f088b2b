"""FULL-CHAIN numerical parity vs the reference torch pipeline.

Runs the reference's own core chain — EncoderFramework →
svc_model_inference (modules/diffsvcrepo_inference.py:154-240) →
denormalize_mel_channel (utils/acoustic_feature_extraction.py:83-97) →
Generator via synthesis_audios (modules/bigvgan_inference.py:29-42) —
against `SVCPipeline`'s compiled core with converted-shared random weights
and IDENTICAL injected noise (init + per-step), on features extracted from
the real reference clip.

This bounds end-to-end drift, not just module-level drift: the target is
the BASELINE.md contract (mel MAE < 1e-3 vs the torch reference).
"""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from svc_inference_pipeline_tpu.config import HParams
from svc_inference_pipeline_tpu.checkpoints.torch_convert import (
    convert_mapper_state_dict,
    convert_vocoder_state_dict,
)
from svc_inference_pipeline_tpu.pipeline.convert import SVCPipeline
from svc_inference_pipeline_tpu.sampling.ddpm import INIT_NOISE_STD, ddpm_sample

# >2 min on the 1-CPU CI host (per-file durations audit, BENCH_NOTES.md)
pytestmark = pytest.mark.slow

REF_STEPS = 10  # short schedule: noise_schedule_factors → 10-step linear


@pytest.fixture(scope="module")
def ref_chain(reference_modules):
    """The reference's inference-chain modules (torch oracles)."""
    inf = importlib.import_module("modules.diffsvcrepo_inference")
    voc_inf = importlib.import_module("modules.bigvgan_inference")
    afe = importlib.import_module("utils.acoustic_feature_extraction")
    util = importlib.import_module("utils.util")
    return inf, voc_inf, afe, util


def test_full_chain_parity_vs_reference(reference_modules, ref_chain, cfg, test_wav, monkeypatch):
    ref_inf, ref_voc_inf, ref_afe, ref_util = ref_chain

    d = cfg.to_dict()
    d["mapper"]["noise_schedule_factors"] = [1e-4, 0.02, REF_STEPS]
    d["mapper"]["sampler"] = "ddpm"
    d["compute_dtype"] = "float32"
    d["use_pallas_vocoder"] = False
    # full production structure; halved width keeps the CPU CI run bounded
    d["vocoder"]["upsample_initial_channel"] = 512
    # both sides must read the SAME stats — the reference's own pickles
    d["min_mel_file"] = "/root/reference/config/mel_min.pkl"
    d["max_mel_file"] = "/root/reference/config/mel_max.pkl"
    small = HParams(**d)

    pipe = SVCPipeline.from_config(small, random_weights=True, whisper_size="tiny")
    # front-end features from the REAL clip (front-end parity is covered by
    # the dedicated mel/f0/whisper tests; this test isolates the core chain)
    batch, n_frames = pipe.extract_features(test_wav, "svcc_CDF1")
    padded = batch["melody"].shape[1]
    n_mel = pipe.cfg.mapper.n_mel

    # ---- torch side: reference modules with shared random weights ----
    ref_cfg = ref_util.JsonHParams(**pipe.cfg.to_dict())
    torch.manual_seed(0)
    enc_t = reference_modules.encoder.EncoderFramework(ref_cfg.mapper).eval()
    den_t = reference_modules.diffsvc.DiffSVC(ref_cfg.mapper).eval()
    gen_t = reference_modules.bigvgan.Generator(ref_cfg.vocoder).eval()
    model = torch.nn.ModuleList([enc_t, den_t])

    cond_params, den_params = convert_mapper_state_dict(model.state_dict(), pipe.cfg.mapper)
    voc_params = convert_vocoder_state_dict(gen_t.state_dict(), pipe.cfg.vocoder)
    pipe.cond_params = jax.device_put(cond_params)
    pipe.denoiser_params = jax.device_put(den_params)
    pipe.vocoder_params = jax.device_put(voc_params)

    # ---- identical noise: replicate ddpm_sample's key discipline ----
    key = jax.random.PRNGKey(0)
    k2, init_key = jax.random.split(key)
    shape = (1, padded, n_mel)
    init = INIT_NOISE_STD * jax.random.normal(init_key, shape, dtype=jnp.float32)
    step_keys = jax.random.split(k2, REF_STEPS)
    step_noises = [np.asarray(jax.random.normal(k, shape)) for k in step_keys]

    # torch draws: init via torch.normal([B,T,M]) then transposes
    # (diffsvcrepo_inference.py:207-214); per-step via noise_like([B,1,M,T])
    monkeypatch.setattr(
        torch, "normal",
        lambda mean, std, size=None, device=None: torch.from_numpy(np.asarray(init)),
    )
    it = iter(step_noises)
    monkeypatch.setattr(
        ref_inf, "noise_like",
        lambda shape_, device, repeat=False: torch.from_numpy(
            next(it).transpose(0, 2, 1)[:, None]
        ),
    )

    t_batch = {
        "content_whisper": torch.from_numpy(np.asarray(batch["content_whisper"], np.float32)),
        "melody": torch.from_numpy(np.asarray(batch["melody"], np.float32)),
        "loudness": torch.from_numpy(np.asarray(batch["loudness"], np.float32)),
        "singer": torch.from_numpy(np.asarray(batch["singer"], np.int64)),
        "y": torch.zeros((1, padded, n_mel)),  # shape-only (SURVEY §2.3 quirk)
    }
    mel_norm_t = ref_inf.svc_model_inference(model, t_batch, ref_cfg)  # [n_mel, T]
    mel_t = ref_afe.denormalize_mel_channel(mel_norm_t, ref_cfg)
    wave_t = ref_voc_inf.synthesis_audios(gen_t, mel_t, ref_cfg)  # [T*hop]

    # ---- our side: the same stages through the pipeline's own pieces ----
    arrays = {k: jnp.asarray(v) for k, v in batch.items()}
    cond = pipe.cond_encoder.apply({"params": pipe.cond_params}, arrays)
    from svc_inference_pipeline_tpu.models.diffsvc_fast import make_fast_denoise_fn

    denoise_fn = make_fast_denoise_fn(
        pipe.denoiser_params, cond, pipe.schedule.num_steps, pipe.cfg.mapper,
        compute_dtype=jnp.float32,
    )
    mel_norm = ddpm_sample(denoise_fn, cond, jax.random.PRNGKey(0), shape, pipe.schedule)

    # 1) normalised-mel parity straight out of the sampler
    mel_norm_ours = np.asarray(mel_norm)[0].T  # [n_mel, T]
    mae_norm = np.abs(mel_norm_ours - mel_norm_t.numpy()).mean()
    assert mae_norm < 1e-3, f"normalised mel MAE {mae_norm}"

    # 2) end-to-end wave through the ONE compiled core (cond→ddpm→denorm→vocoder)
    wave = pipe._core(
        pipe.cond_params, pipe.denoiser_params, pipe.vocoder_params,
        arrays, jax.random.PRNGKey(0),
        jnp.asarray([padded], jnp.int32), n_frames=padded,
        sampler=pipe._resolve_sampler(None, None)[0],
        speedup=pipe._resolve_sampler(None, None)[1],
    )
    wave_ours = np.asarray(wave)[0]
    assert wave_ours.shape == wave_t.shape
    max_err = np.abs(wave_ours - wave_t).max()
    assert max_err < 5e-3, f"waveform max err {max_err}"
    mae_wave = np.abs(wave_ours - wave_t).mean()
    assert mae_wave < 5e-4, f"waveform MAE {mae_wave}"

    # 3) denormalised mel MAE — the BASELINE.md headline contract
    zero = 1e-12
    lo, hi = np.asarray(pipe._mel_min), np.asarray(pipe._mel_max)
    mel_ours = (mel_norm_ours + 1.0) / 2.0 * (hi[:, None] - lo[:, None] + zero) + lo[:, None]
    mae = np.abs(mel_ours - mel_t.numpy()).mean()
    assert mae < 1e-3, f"denormalised mel MAE {mae}"
