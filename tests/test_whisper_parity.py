"""Whisper encoder parity vs the reference's vendored torch model (tiny dims),
plus the 480→256 hop remap vs the reference's numpy implementation."""

import numpy as np
import pytest
import torch

from svc_inference_pipeline_tpu.checkpoints.torch_convert import convert_whisper_state_dict
from svc_inference_pipeline_tpu.models.whisper import (
    WhisperAudioEncoder,
    WhisperDims,
    WhisperTextDecoder,
    sinusoids,
)
from svc_inference_pipeline_tpu.ops.remap import remap_features, repeat_expand_2d

TINY = WhisperDims(
    n_mels=8,
    n_audio_ctx=50,
    n_audio_state=32,
    n_audio_head=4,
    n_audio_layer=2,
    n_vocab=100,
    n_text_ctx=16,
    n_text_state=32,
    n_text_head=4,
    n_text_layer=2,
)


@pytest.fixture(scope="module")
def ref_whisper(reference_modules):
    import sys

    sys.path.insert(0, "/root/reference")
    from utils.whisper_extractor.model import ModelDimensions, Whisper

    torch.manual_seed(0)
    dims = ModelDimensions(  # noqa: keep explicit for clarity
        n_mels=TINY.n_mels,
        n_audio_ctx=TINY.n_audio_ctx,
        n_audio_state=TINY.n_audio_state,
        n_audio_head=TINY.n_audio_head,
        n_audio_layer=TINY.n_audio_layer,
        n_vocab=TINY.n_vocab,
        n_text_ctx=TINY.n_text_ctx,
        n_text_state=TINY.n_text_state,
        n_text_head=TINY.n_text_head,
        n_text_layer=TINY.n_text_layer,
    )
    model = Whisper(dims).eval()
    # the reference leaves decoder.positional_embedding as torch.empty
    # (uninitialised memory — normally overwritten by checkpoint load);
    # give it defined values so the oracle is deterministic
    with torch.no_grad():
        model.decoder.positional_embedding.normal_(0.0, 0.02)
    return model


def test_sinusoids_match_reference(ref_whisper):
    ref = ref_whisper.encoder.positional_embedding.numpy()
    ours = sinusoids(TINY.n_audio_ctx, TINY.n_audio_state)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_encoder_parity(ref_whisper):
    params = convert_whisper_state_dict(ref_whisper.state_dict(), encoder_only=False)

    mel = np.random.default_rng(0).standard_normal((2, TINY.n_mels, 2 * TINY.n_audio_ctx)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_whisper.embed_audio(torch.from_numpy(mel)).numpy()

    ours = np.asarray(
        WhisperAudioEncoder(TINY).apply({"params": params["encoder"]}, mel)
    )
    assert ours.shape == ref_out.shape == (2, TINY.n_audio_ctx, TINY.n_audio_state)
    err = np.abs(ours - ref_out).max()
    assert err < 1e-4, f"whisper encoder max err {err}"


def test_decoder_parity(ref_whisper):
    params = convert_whisper_state_dict(ref_whisper.state_dict(), encoder_only=False)

    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, TINY.n_mels, 2 * TINY.n_audio_ctx)).astype(np.float32)
    tokens = rng.integers(0, TINY.n_vocab, (1, 5))
    with torch.no_grad():
        audio_feats = ref_whisper.embed_audio(torch.from_numpy(mel))
        ref_logits = ref_whisper.logits(torch.from_numpy(tokens), audio_feats).numpy()

    ours_logits, _cache = WhisperTextDecoder(TINY).apply(
        {"params": params["decoder"]},
        tokens,
        np.asarray(audio_feats.numpy()),
    )
    err = np.abs(np.asarray(ours_logits) - ref_logits).max()
    assert err < 2e-3, f"whisper decoder max err {err}"


def test_remap_matches_reference(reference_modules):
    import utils.whisper as ref_whisper_utils

    rng = np.random.default_rng(2)
    feats = rng.standard_normal((1500, 16)).astype(np.float32)
    for target_len in (100, 937, 2812, 4000):
        mel = np.zeros((target_len, 100), dtype=np.float32)
        ref = ref_whisper_utils.get_mapped_whisper_features(feats, mel)
        ours = remap_features(feats, target_len)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def test_remap_tolerant_matches_reference(reference_modules):
    import utils.hubert as ref_hubert

    rng = np.random.default_rng(3)
    # source_len frames of content → target ≈ source * 15/8
    source_len = 200
    feats = rng.standard_normal((source_len, 16)).astype(np.float32)
    target_len = source_len * 15 // 8  # exact grid
    mel = np.zeros((target_len, 100), dtype=np.float32)
    ref = ref_hubert.get_mapped_features(feats, mel)

    from svc_inference_pipeline_tpu.ops.remap import remap_features_tolerant

    ours = remap_features_tolerant(feats, target_len)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def test_repeat_expand_2d_matches_reference(reference_modules):
    import utils.hubert as ref_hubert

    rng = np.random.default_rng(4)
    content = rng.standard_normal((8, 50)).astype(np.float32)
    for target_len in (50, 93, 137):
        ref = ref_hubert.repeat_expand_2d(torch.from_numpy(content), target_len).numpy()
        ours = repeat_expand_2d(content, target_len)
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def test_extractor_scan_layers_matches_unrolled():
    """scan_layers=True (auto-on for deep encoders) ≡ unrolled blocks, with
    converter-layout params stacked on the fly."""
    import jax
    import jax.numpy as jnp

    from svc_inference_pipeline_tpu.pipeline.content import WhisperPPGExtractor

    # structural equivalence is asserted at f32 compute, where stacking the
    # converter-layout params must be near-exact; the production bf16 stream
    # is only held to the bf16 noise class (scan/remat fuse and round
    # differently from the unrolled loop)
    plain32 = WhisperPPGExtractor.random_init(
        "tiny", scan_layers=False, compute_dtype=jnp.float32
    )
    scanned32 = WhisperPPGExtractor(
        plain32.dims,
        jax.tree_util.tree_map(np.asarray, plain32.params),
        scan_layers=True,
        compute_dtype=jnp.float32,
    )
    assert "blocks" in scanned32.params and "block_0" not in scanned32.params
    mel = np.random.default_rng(0).standard_normal((1, 80, 3000)).astype(np.float32)
    a = np.asarray(plain32.embed_audio(jnp.asarray(mel)))
    b = np.asarray(scanned32.embed_audio(jnp.asarray(mel)))
    assert np.abs(a - b).max() < 1e-4

    plain = WhisperPPGExtractor.random_init("tiny", scan_layers=False)
    scanned = WhisperPPGExtractor(
        plain.dims,
        jax.tree_util.tree_map(np.asarray, plain.params),
        scan_layers=True,
    )
    a16 = np.asarray(plain.embed_audio(jnp.asarray(mel)))
    b16 = np.asarray(scanned.embed_audio(jnp.asarray(mel)))
    assert np.abs(a16 - b16).max() / np.abs(a16).max() < 3e-2


def test_scanned_bf16_storage_keeps_layernorm_f32():
    """bf16 weight storage must not catch the stacked [L, C] LayerNorm
    scales/biases (the f32 norm islands) — they are excluded by path, not
    ndim."""
    import jax
    import jax.numpy as jnp

    from svc_inference_pipeline_tpu.pipeline.content import WhisperPPGExtractor

    plain = WhisperPPGExtractor.random_init("tiny", scan_layers=False)
    scanned = WhisperPPGExtractor(
        plain.dims,
        jax.tree_util.tree_map(np.asarray, plain.params),
        scan_layers=True,
        compute_dtype=jnp.bfloat16,
    )
    block = scanned.params["blocks"]["block"]
    for ln in ("attn_ln", "mlp_ln"):
        for leaf in ("scale", "bias"):
            assert block[ln][leaf].dtype == jnp.float32, (ln, leaf)
    assert scanned.params["ln_post"]["scale"].dtype == jnp.float32
    # while the stacked matmul weights ARE stored bf16
    assert block["attn"]["query"]["kernel"].dtype == jnp.bfloat16
    assert block["mlp_0"]["kernel"].dtype == jnp.bfloat16


def test_scanned_layout_tp_rules():
    """WHISPER_TP_RULES cover the scanned params layout (leading layer axis
    unsharded, head/mlp dims sharded)."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from svc_inference_pipeline_tpu.parallel.sharding import WHISPER_TP_RULES, param_specs

    params = {
        "blocks": {
            "block": {
                "attn": {"query": {"kernel": jnp.zeros((4, 8, 8))}},
                "mlp_2": {"kernel": jnp.zeros((4, 32, 8))},
            }
        }
    }
    specs = param_specs(params, WHISPER_TP_RULES)
    assert specs["blocks"]["block"]["attn"]["query"]["kernel"] == P(None, None, "model")
    assert specs["blocks"]["block"]["mlp_2"]["kernel"] == P(None, "model", None)
