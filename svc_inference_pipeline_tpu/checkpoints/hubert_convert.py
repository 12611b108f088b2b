"""fairseq HuBERT/ContentVec checkpoint → flax params.

The reference loads these through fairseq's
``load_model_ensemble_and_task`` (/root/reference/utils/hubert.py:14-28);
here the fairseq ``model`` state_dict is converted directly — no fairseq
dependency. transformers-layout HuBERT state dicts are also accepted (used
as the parity oracle in tests).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple


from svc_inference_pipeline_tpu.checkpoints.torch_convert import (
    fold_weight_norm,
    strip_ddp_prefix,
)
from svc_inference_pipeline_tpu.models.hubert import HubertConfig

Params = Dict[str, Any]


def _linear(sd, prefix):
    p = {"kernel": sd[f"{prefix}.weight"].T}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def convert_hubert_state_dict(
    state_dict: Mapping[str, Any], cfg: HubertConfig = HubertConfig()
) -> Params:
    """fairseq HubertModel state_dict → models/hubert.py params."""
    sd = fold_weight_norm(strip_ddp_prefix(state_dict))

    fe: Params = {}
    for i in range(len(cfg.conv_layers)):
        w = sd[f"feature_extractor.conv_layers.{i}.0.weight"]  # [Cout, Cin, K]
        fe[f"conv_{i}"] = {"kernel": w.transpose(2, 1, 0)}
    # group norm after conv 0 (fairseq index 2 in the layer Sequential)
    fe["group_norm"] = {
        "scale": sd["feature_extractor.conv_layers.0.2.weight"],
        "bias": sd["feature_extractor.conv_layers.0.2.bias"],
    }

    pos_w = sd["encoder.pos_conv.0.weight"]  # [C, C/groups, K]
    params: Params = {
        "feature_extractor": fe,
        "layer_norm": _ln(sd, "layer_norm"),
        "post_extract_proj": _linear(sd, "post_extract_proj"),
        "pos_conv": {
            "kernel": pos_w.transpose(2, 1, 0),
            "bias": sd["encoder.pos_conv.0.bias"],
        },
        "encoder_layer_norm": _ln(sd, "encoder.layer_norm"),
    }
    if "final_proj.weight" in sd:
        params["final_proj"] = _linear(sd, "final_proj")

    for i in range(cfg.encoder_layers):
        base = f"encoder.layers.{i}"
        params[f"layer_{i}"] = {
            "self_attn": {
                "q_proj": _linear(sd, f"{base}.self_attn.q_proj"),
                "k_proj": _linear(sd, f"{base}.self_attn.k_proj"),
                "v_proj": _linear(sd, f"{base}.self_attn.v_proj"),
                "out_proj": _linear(sd, f"{base}.self_attn.out_proj"),
            },
            "self_attn_layer_norm": _ln(sd, f"{base}.self_attn_layer_norm"),
            "fc1": _linear(sd, f"{base}.fc1"),
            "fc2": _linear(sd, f"{base}.fc2"),
            "final_layer_norm": _ln(sd, f"{base}.final_layer_norm"),
        }
    return params


_TRANSFORMERS_RENAMES = [
    ("feature_projection.layer_norm", "layer_norm"),
    ("feature_projection.projection", "post_extract_proj"),
    ("encoder.pos_conv_embed.conv", "encoder.pos_conv.0"),
    ("attention.q_proj", "self_attn.q_proj"),
    ("attention.k_proj", "self_attn.k_proj"),
    ("attention.v_proj", "self_attn.v_proj"),
    ("attention.out_proj", "self_attn.out_proj"),
    ("layer_norm.weight", "self_attn_layer_norm.weight"),
    ("layer_norm.bias", "self_attn_layer_norm.bias"),
    ("feed_forward.intermediate_dense", "fc1"),
    ("feed_forward.output_dense", "fc2"),
]


def transformers_to_fairseq_keys(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Rename a transformers HubertModel state_dict into fairseq layout.

    Covers the keys used by :func:`convert_hubert_state_dict`; parametrized
    weight-norm keys (parametrizations.weight.original0/1) become
    weight_g/weight_v.
    """
    out: Dict[str, Any] = {}
    for k, v in state_dict.items():
        nk = k
        nk = nk.replace("feature_extractor.conv_layers", "feature_extractor.conv_layers")
        # conv layers: transformers .conv/.layer_norm → fairseq .0/.2
        if ".conv.weight" in nk and "conv_layers" in nk:
            nk = nk.replace(".conv.weight", ".0.weight")
        if "conv_layers.0.layer_norm" in nk:
            nk = nk.replace(".layer_norm.", ".2.")
        if nk.startswith("feature_projection.layer_norm"):
            nk = nk.replace("feature_projection.layer_norm", "layer_norm")
        if nk.startswith("feature_projection.projection"):
            nk = nk.replace("feature_projection.projection", "post_extract_proj")
        if nk.startswith("encoder.pos_conv_embed.conv"):
            nk = nk.replace("encoder.pos_conv_embed.conv", "encoder.pos_conv.0")
            nk = nk.replace("parametrizations.weight.original0", "weight_g")
            nk = nk.replace("parametrizations.weight.original1", "weight_v")
        if ".attention." in nk:
            nk = nk.replace(".attention.", ".self_attn.")
        if ".feed_forward.intermediate_dense" in nk:
            nk = nk.replace(".feed_forward.intermediate_dense", ".fc1")
        if ".feed_forward.output_dense" in nk:
            nk = nk.replace(".feed_forward.output_dense", ".fc2")
        if ".layer_norm." in nk and "encoder.layers" in nk and "self_attn_layer_norm" not in nk and "final_layer_norm" not in nk:
            nk = nk.replace(".layer_norm.", ".self_attn_layer_norm.")
        out[nk] = v
    return out


def load_hubert(path: str) -> Tuple[HubertConfig, Params]:
    """Load + convert a fairseq ``.pt`` checkpoint (ckpt key ``model``)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    cfg = HubertConfig()
    return cfg, convert_hubert_state_dict(sd, cfg)
