"""PP/SP wired into SVCPipeline via cfg.parallel switches (VERDICT r3 #4).

``pipeline_stages`` routes the denoiser through the GPipe pipeline
(parallel/pp.py); ``sequence_parallel`` routes the whisper encoder through
the time-sharded SP encoder (parallel/sp_whisper.py). Both must produce
the single-device waveform through the ordinary ``convert()`` API.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svc_inference_pipeline_tpu.config import HParams
from svc_inference_pipeline_tpu.pipeline.convert import SVCPipeline

pytestmark = [
    pytest.mark.slow,  # two extra pipeline compiles on the 1-CPU CI host
    pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices"),
]


def _small_cfg(cfg, **parallel):
    d = cfg.to_dict()
    d["mapper"]["noise_schedule_factors"] = [0.0001, 0.02, 10]
    d["mapper"]["residual_layer_num"] = 2
    d["mapper"]["sampler"] = "plms"
    # channels halve per stage: 256 keeps every vocoder stage divisible by
    # a 4-way model axis (TP rules shard them when a model mesh is present)
    d["vocoder"]["upsample_initial_channel"] = 256
    d["compute_dtype"] = "float32"
    d["parallel"] = dict(d["parallel"], **parallel)
    return HParams(**d)


@pytest.fixture(scope="module")
def ref(cfg):
    small = _small_cfg(cfg)
    pipe = SVCPipeline.from_config(small, random_weights=True, whisper_size="tiny")
    tone = (0.4 * np.sin(2 * np.pi * 220.0 * np.arange(24000) / 24000)).astype(np.float32)
    wave = pipe.convert(tone, "svcc_CDF1", key=jax.random.PRNGKey(0))
    return small, pipe, tone, wave


def test_pipeline_pp_convert_matches_single(cfg, ref):
    """cfg.parallel.pipeline_stages=2 → convert() runs the denoiser as a
    2-stage GPipe pipeline (auto-built `pipe` mesh) with the same waveform."""
    small, ref_pipe, tone, ref_wave = ref
    pp_cfg = _small_cfg(cfg, pipeline_stages=2)
    pp_pipe = SVCPipeline(
        pp_cfg,
        ref_pipe.cond_params,
        ref_pipe.denoiser_params,
        ref_pipe.vocoder_params,
        ref_pipe.whisper,
    )
    assert pp_pipe._pp_stages == 2
    assert pp_pipe.mesh is not None and "pipe" in pp_pipe.mesh.axis_names
    out = pp_pipe.convert(tone, "svcc_CDF1", key=jax.random.PRNGKey(0))
    assert out.shape == ref_wave.shape
    err = np.abs(out - ref_wave)
    assert np.quantile(err, 0.999) < 5e-4, np.quantile(err, 0.999)
    assert err.max() < 0.05, err.max()

    # batched path microbatches over the pipe (n_micro = B)
    waves = pp_pipe.convert_batch(
        [tone, tone], ["svcc_CDF1", "svcc_CDM1"], key=jax.random.PRNGKey(1)
    )
    assert len(waves) == 2 and all(np.isfinite(w).all() for w in waves)
    assert np.abs(waves[0] - waves[1]).max() > 1e-6  # singers differ


def test_pipeline_sp_convert_matches_single(cfg, ref):
    """cfg.parallel.sequence_parallel on a 2x4 data x model mesh: the
    whisper encoder runs time-sharded (params replicated, KV all-gathered)
    while the mapper/vocoder stay TP-sharded — same waveform."""
    from svc_inference_pipeline_tpu.parallel.mesh import make_mesh

    small, ref_pipe, tone, ref_wave = ref
    sp_cfg = _small_cfg(cfg, sequence_parallel=True)
    mesh = make_mesh(data=2, model=4)
    sp_pipe = SVCPipeline(
        sp_cfg,
        ref_pipe.cond_params,
        ref_pipe.denoiser_params,
        ref_pipe.vocoder_params,
        ref_pipe.whisper,
        mesh=mesh,
    )
    assert sp_pipe._sp and sp_pipe.tp
    # SP replicates whisper params (activation sharding, not weight)
    assert "block_0" in sp_pipe.whisper.params  # unstacked layout
    with mesh:
        out = sp_pipe.convert(tone, "svcc_CDF1", key=jax.random.PRNGKey(0))
    assert out.shape == ref_wave.shape
    err = np.abs(out - ref_wave)
    assert np.quantile(err, 0.999) < 5e-4, np.quantile(err, 0.999)
    assert err.max() < 0.05, err.max()


def test_parallel_switch_validation(cfg, ref):
    """Misconfigured switches fail fast with actionable errors."""
    small, ref_pipe, _, _ = ref

    bad_pp = _small_cfg(cfg, pipeline_stages=3)  # 3 ∤ residual_layer_num=2
    with pytest.raises(ValueError, match="pipeline_stages"):
        SVCPipeline(
            bad_pp, ref_pipe.cond_params, ref_pipe.denoiser_params,
            ref_pipe.vocoder_params, ref_pipe.whisper,
        )

    bad_sp = _small_cfg(cfg, sequence_parallel=True)  # no model-axis mesh
    with pytest.raises(ValueError, match="sequence_parallel"):
        SVCPipeline(
            bad_sp, ref_pipe.cond_params, ref_pipe.denoiser_params,
            ref_pipe.vocoder_params, ref_pipe.whisper,
        )
