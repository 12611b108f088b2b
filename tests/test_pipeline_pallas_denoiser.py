"""Pipeline-level parity: fused Pallas denoiser vs the XLA fast path.

On real TPU the conversion core routes the per-step denoiser through the
fused whole-step kernel (ops/pallas/denoiser_step.py). These tests force
that route on CPU (interpret mode) and check the produced waveform
matches the XLA-path pipeline bit-for-bit-ish on a reduced config.
"""

import jax
import jax.numpy as jnp
import numpy as np

from svc_inference_pipeline_tpu.config import HParams
import pytest

# >2 min on the 1-CPU CI host (per-file durations audit, BENCH_NOTES.md)
pytestmark = pytest.mark.slow


def _mini_pipe(cfg, use_pallas_denoiser, sampler="ddpm"):
    from svc_inference_pipeline_tpu.pipeline.convert import SVCPipeline

    d = cfg.to_dict()
    d["mapper"]["noise_schedule_factors"] = [0.0001, 0.02, 10]
    d["mapper"]["residual_layer_num"] = 2
    d["mapper"]["sampler"] = sampler
    d["vocoder"]["upsample_initial_channel"] = 256
    d["use_pallas_vocoder"] = False
    d["use_pallas_denoiser"] = use_pallas_denoiser
    d["compute_dtype"] = "float32"
    small = HParams(**d)
    return SVCPipeline.from_config(small, random_weights=True, whisper_size="tiny")


def test_pipeline_pallas_denoiser_matches_xla(cfg, test_wav):
    ref_pipe = _mini_pipe(cfg, use_pallas_denoiser=False)
    assert not ref_pipe._use_pallas_denoiser
    ref = np.asarray(ref_pipe.convert(test_wav, "svcc_CDF1", key=jax.random.PRNGKey(0)))

    pal_pipe = _mini_pipe(cfg, use_pallas_denoiser=True)
    assert pal_pipe._use_pallas_denoiser
    got = np.asarray(pal_pipe.convert(test_wav, "svcc_CDF1", key=jax.random.PRNGKey(0)))

    assert got.shape == ref.shape
    # identical weights (same seed), f32 compute; the kernel reorders the
    # conv-tap accumulation (one deep-K matmul vs XLA's fusion order), and
    # the vocoder amplifies the per-step reorder noise (~5e-4 observed)
    err = np.abs(got.astype(np.float64) - ref.astype(np.float64)).max()
    assert err < 2e-3, f"pallas-denoiser pipeline err {err}"


def test_pipeline_pallas_denoiser_plms(cfg, test_wav):
    """The serving fast path (PLMS) drives the same kernel denoise_fn."""
    ref_pipe = _mini_pipe(cfg, use_pallas_denoiser=False, sampler="plms")
    ref = np.asarray(ref_pipe.convert(test_wav, "svcc_CDF1", key=jax.random.PRNGKey(0)))

    pal_pipe = _mini_pipe(cfg, use_pallas_denoiser=True, sampler="plms")
    assert pal_pipe._use_pallas_denoiser
    got = np.asarray(pal_pipe.convert(test_wav, "svcc_CDF1", key=jax.random.PRNGKey(0)))

    assert got.shape == ref.shape
    err = np.abs(got.astype(np.float64) - ref.astype(np.float64)).max()
    assert err < 2e-3, f"plms pallas-denoiser pipeline err {err}"


def test_pipeline_pallas_denoiser_batched(cfg, test_wav):
    """B>1 conversions run the batched (grid=(B,L)) kernel and match the
    XLA-path batch output."""
    ref_pipe = _mini_pipe(cfg, use_pallas_denoiser=False)
    ref = ref_pipe.convert_batch(
        [test_wav, test_wav], ["svcc_CDF1", "svcc_CDF1"], key=jax.random.PRNGKey(1)
    )
    pipe = _mini_pipe(cfg, use_pallas_denoiser=True)
    waves = pipe.convert_batch(
        [test_wav, test_wav], ["svcc_CDF1", "svcc_CDF1"], key=jax.random.PRNGKey(1)
    )
    assert len(waves) == 2
    for w, r in zip(waves, ref):
        w, r = np.asarray(w), np.asarray(r)
        assert w.shape == r.shape
        assert np.abs(w.astype(np.float64) - r.astype(np.float64)).max() < 2e-3


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2+ virtual devices")
def test_pipeline_pallas_denoiser_dp_mesh(cfg, test_wav):
    """Data-only mesh keeps the fused kernel live via shard_map: each data
    shard is exactly a single-device kernel conversion of its local clip
    with key = fold_in(key, shard_index)."""
    from svc_inference_pipeline_tpu.parallel.mesh import make_mesh
    from svc_inference_pipeline_tpu.pipeline.convert import SVCPipeline

    d = cfg.to_dict()
    d["mapper"]["noise_schedule_factors"] = [0.0001, 0.02, 10]
    d["mapper"]["residual_layer_num"] = 2
    d["vocoder"]["upsample_initial_channel"] = 256
    d["use_pallas_vocoder"] = False
    d["use_pallas_denoiser"] = True
    d["compute_dtype"] = "float32"
    small = HParams(**d)

    mesh = make_mesh(data=2, model=1)
    dp = SVCPipeline.from_config(small, random_weights=True, whisper_size="tiny", mesh=mesh)
    assert dp._dp_pallas_denoiser and not dp._use_pallas_denoiser
    key = jax.random.PRNGKey(11)
    waves = dp.convert_batch([test_wav, test_wav], ["svcc_CDF1", "svcc_IDM1"], key=key)
    assert len(waves) == 2

    single = SVCPipeline.from_config(small, random_weights=True, whisper_size="tiny")
    assert single._use_pallas_denoiser
    for i, singer in enumerate(["svcc_CDF1", "svcc_IDM1"]):
        ref = np.asarray(
            single.convert(test_wav, singer, key=jax.random.fold_in(key, i))
        )
        got = np.asarray(waves[i])
        n = min(len(ref), len(got))
        err = np.abs(got[:n].astype(np.float64) - ref[:n].astype(np.float64)).max()
        assert err < 2e-3, f"dp shard {i} err {err}"


def test_pipeline_int8_denoiser_close(cfg, test_wav):
    """denoiser_quantize="int8" routes the conversion through the int8
    kernel; the waveform stays close to the unquantized kernel pipe (same
    weights/keys — only the matmul precision differs)."""
    from svc_inference_pipeline_tpu.pipeline.convert import SVCPipeline

    d = cfg.to_dict()
    d["mapper"]["noise_schedule_factors"] = [0.0001, 0.02, 10]
    d["mapper"]["residual_layer_num"] = 2
    d["vocoder"]["upsample_initial_channel"] = 256
    d["use_pallas_vocoder"] = False
    d["use_pallas_denoiser"] = True
    d["compute_dtype"] = "float32"
    ref_pipe = SVCPipeline.from_config(
        HParams(**d), random_weights=True, whisper_size="tiny"
    )
    ref = np.asarray(ref_pipe.convert(test_wav, "svcc_CDF1", key=jax.random.PRNGKey(0)))

    d["denoiser_quantize"] = "int8"
    q_pipe = SVCPipeline.from_config(
        HParams(**d), random_weights=True, whisper_size="tiny"
    )
    assert q_pipe._denoiser_quantize == "int8"
    got = np.asarray(q_pipe.convert(test_wav, "svcc_CDF1", key=jax.random.PRNGKey(0)))

    assert got.shape == ref.shape
    # int8 perturbs the mel trajectory; the waveform stays strongly
    # correlated but not bit-close — pin correlation, not max error
    corr = np.corrcoef(got.astype(np.float64), ref.astype(np.float64))[0, 1]
    assert corr > 0.98, f"int8 pipeline corr {corr}"
