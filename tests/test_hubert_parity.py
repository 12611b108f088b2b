"""HuBERT/ContentVec parity vs the transformers library's HubertModel.

fairseq (the reference's loader) is unavailable; transformers' HuBERT is the
same architecture lineage, so a reduced-size transformers model is converted
through the fairseq-layout adapter and compared end to end.
"""

import numpy as np
import pytest
import torch

from svc_inference_pipeline_tpu.checkpoints.hubert_convert import (
    convert_hubert_state_dict,
    transformers_to_fairseq_keys,
)
from svc_inference_pipeline_tpu.models.hubert import HubertConfig, HubertModel

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def small():
    """A reduced HuBERT (same structure, smaller dims) in both frameworks."""
    hf_cfg = transformers.HubertConfig(
        hidden_size=96,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=192,
        conv_dim=[48] * 7,
        conv_kernel=[10, 3, 3, 3, 3, 2, 2],
        conv_stride=[5, 2, 2, 2, 2, 2, 2],
        feat_extract_norm="group",
        do_stable_layer_norm=False,
        feat_proj_dropout=0.0,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        layerdrop=0.0,
        num_conv_pos_embeddings=128,
        num_conv_pos_embedding_groups=16,
    )
    torch.manual_seed(0)
    hf = transformers.HubertModel(hf_cfg).eval()

    ours_cfg = HubertConfig(
        conv_layers=tuple((48, k, s) for k, s in zip(hf_cfg.conv_kernel, hf_cfg.conv_stride)),
        encoder_dim=96,
        encoder_layers=3,
        encoder_heads=4,
        encoder_ffn_dim=192,
        final_dim=32,
    )
    return hf, ours_cfg


def test_hubert_parity_layer_output(small):
    hf, cfg = small
    sd = transformers_to_fairseq_keys({k: v.detach().numpy() for k, v in hf.state_dict().items()})
    params = convert_hubert_state_dict(sd, cfg)

    wav = np.random.default_rng(0).standard_normal((1, 8000)).astype(np.float32) * 0.1
    layer = 2
    with torch.no_grad():
        hf_out = hf(
            torch.from_numpy(wav), output_hidden_states=True
        ).hidden_states[layer].numpy()

    ours = np.asarray(
        HubertModel(cfg).apply(
            {"params": params}, wav, output_layer=layer, final_proj=False
        )
    )
    assert ours.shape == hf_out.shape
    err = np.abs(ours - hf_out).max()
    assert err < 2e-3, f"hubert layer-{layer} max err {err}"


def test_hubert_frame_rate(small):
    _, cfg = small
    model = HubertModel(cfg)
    import jax

    wav = np.zeros((1, 16000), dtype=np.float32)
    params = model.init(jax.random.PRNGKey(0), wav, output_layer=1, final_proj=False)["params"]
    out = model.apply({"params": params}, wav, output_layer=1, final_proj=False)
    # 320x decimation → ~50 frames per second of 16 kHz audio
    assert abs(out.shape[1] - 49) <= 1


def test_contentvec_extractor_shapes():
    from svc_inference_pipeline_tpu.pipeline.content import ContentVecExtractor

    ext = ContentVecExtractor.random_init()
    audio = np.random.default_rng(1).standard_normal(24000).astype(np.float32) * 0.1
    mel_len = 24000 // 256
    feats = ext.extract(audio, mel_len)
    assert feats.shape == (mel_len, 256)
