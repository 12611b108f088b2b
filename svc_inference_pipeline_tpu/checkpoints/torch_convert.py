"""PyTorch checkpoint → JAX parameter-pytree converters.

Replaces the reference's load-time machinery (/root/reference/utils/
load_models.py:17-79) with one-shot conversion:

* ``module.`` DDP-prefix stripping and key-existence + shape-match
  filtering with silent partial update — the reference's exact loader
  semantics (load_models.py:33-43),
* weight-norm folding: the reference keeps the g·v/‖v‖ parametrisation
  live at every inference step (Generator never calls remove_weight_norm,
  modules/bigvgan.py:624-631); we fold it into plain weights once,
* torch layout → channels-last flax layout transposes
  (Conv1d [Cout,Cin,K] → [K,Cin,Cout]; ConvTranspose1d [Cin,Cout,K] →
  [K,Cout,Cin]; Linear [Dout,Din] → [Din,Dout]).

Checkpoint key schemas converted:
* mapper ckpt ``state_dict`` — ModuleList[EncoderFramework, DiffSVC]
  (load_models.py:26-43),
* vocoder ckpt ``generator_state_dict`` — BigVGAN Generator
  (load_models.py:60-73),
* whisper ckpt ``model_state_dict`` + ``dims``
  (whisper_extractor/__init__.py:109-115).

torch is only needed when reading ``.pt`` files; converted checkpoints are
plain numpy pytrees saved through checkpoints/native_io.py.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Generic helpers
# ---------------------------------------------------------------------------


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def strip_ddp_prefix(state_dict: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Strip a leading ``module.`` (DataParallel fossil, load_models.py:34-41)."""
    return {k.split("module.")[-1]: _to_numpy(v) for k, v in state_dict.items()}


def fold_weight_norm(state_dict: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold ``weight_g``/``weight_v`` pairs into plain ``weight`` entries.

    torch's weight_norm(dim=d): w = g · v / ‖v‖ with the norm over all dims
    except d. The dim is inferred from g's shape (size 1 everywhere except
    d) — BigVGAN uses the default dim=0, HuBERT's pos_conv uses dim=2.
    New-style ``parametrizations.weight.original0/1`` keys are normalised to
    weight_g/weight_v first.
    """
    renamed = {}
    for k, v in state_dict.items():
        nk = k.replace("parametrizations.weight.original0", "weight_g")
        nk = nk.replace("parametrizations.weight.original1", "weight_v")
        renamed[nk] = v

    out: Dict[str, np.ndarray] = {}
    for key, value in renamed.items():
        if key.endswith("weight_v"):
            base = key[: -len("weight_v")]
            g = np.asarray(renamed[base + "weight_g"], dtype=np.float64)
            v = np.asarray(value, dtype=np.float64)
            non_unit = [d for d in range(g.ndim) if g.shape[d] != 1]
            dim = non_unit[0] if non_unit else 0
            axes = tuple(d for d in range(v.ndim) if d != dim)
            norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True))
            out[base + "weight"] = (g * v / norm).astype(np.float32)
        elif key.endswith("weight_g"):
            continue
        else:
            out[key] = np.asarray(value)
    return out


def _linear(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    p: Params = {"kernel": sd[f"{prefix}.weight"].T}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _conv1x1_as_dense(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    w = sd[f"{prefix}.weight"]  # [Cout, Cin, 1]
    p: Params = {"kernel": w[:, :, 0].T}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _conv1d(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    w = sd[f"{prefix}.weight"]  # [Cout, Cin, K]
    p: Params = {"kernel": w.transpose(2, 1, 0)}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _conv_transpose1d(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    w = sd[f"{prefix}.weight"]  # [Cin, Cout, K]
    p: Params = {"kernel": w.transpose(2, 1, 0)}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


# ---------------------------------------------------------------------------
# Mapper: EncoderFramework (index 0) + DiffSVC (index 1)
# ---------------------------------------------------------------------------


def convert_mapper_state_dict(state_dict: Mapping[str, Any], cfg) -> Tuple[Params, Params]:
    """torch ModuleList state_dict → (cond_encoder_params, denoiser_params).

    ``cfg`` is the mapper config subtree.
    """
    sd = strip_ddp_prefix(state_dict)

    enc: Params = {}
    for content_type in cfg.content_feature:
        key = f"0.registered_modules_dict.content_{content_type}.nn"
        if f"{key}.weight" in sd:
            enc[f"content_{content_type}"] = _linear(sd, key)
    if "0.registered_modules_dict.melody.nn.weight" in sd:
        enc["melody"] = {"embedding": sd["0.registered_modules_dict.melody.nn.weight"]}
    if "0.registered_modules_dict.loudness.nn.weight" in sd:
        enc["loudness"] = {"embedding": sd["0.registered_modules_dict.loudness.nn.weight"]}
    if "0.registered_modules_dict.singer.nn.weight" in sd:
        enc["singer"] = {"embedding": sd["0.registered_modules_dict.singer.nn.weight"]}

    den: Params = {
        "mel_preprocess": _conv1x1_as_dense(sd, "1.mel_preprocess.projection"),
        "diffusion_embedding": {
            "projection1": _linear(sd, "1.diffusion_embedding.projection1"),
            "projection2": _linear(sd, "1.diffusion_embedding.projection2"),
        },
        "skip_projection": _conv1x1_as_dense(sd, "1.skip_projection"),
        "output_projection": _conv1x1_as_dense(sd, "1.output_projection"),
    }
    for i in range(cfg.residual_layer_num):
        base = f"1.residual_layers.{i}"
        den[f"residual_{i}"] = {
            "diffusion_projection": _linear(sd, f"{base}.diffusion_projection"),
            "dilated_conv": _conv1d(sd, f"{base}.dilated_conv"),
            "conditioner_projection": _conv1x1_as_dense(sd, f"{base}.conditioner_projection"),
            "output_projection": _conv1x1_as_dense(sd, f"{base}.output_projection"),
        }
    return enc, den


# ---------------------------------------------------------------------------
# Vocoder: BigVGAN Generator
# ---------------------------------------------------------------------------


def convert_vocoder_state_dict(state_dict: Mapping[str, Any], cfg) -> Params:
    """torch Generator state_dict → BigVGANGenerator params (weight-norm folded).

    ``cfg`` is the vocoder config subtree.
    """
    sd = fold_weight_norm(strip_ddp_prefix(state_dict))
    num_kernels = len(cfg.resblock_kernel_sizes)

    params: Params = {
        "conv_pre": {"conv": _conv1d(sd, "conv_pre")},
        "conv_post": {"conv": _conv1d(sd, "conv_post")},
    }

    for i in range(len(cfg.upsample_rates)):
        params[f"up_{i}"] = _conv_transpose1d(sd, f"ups.{i}.0")

    amp1 = cfg.resblock == "1"
    for i in range(len(cfg.upsample_rates)):
        for j in range(num_kernels):
            base = f"resblocks.{i * num_kernels + j}"
            block: Params = {}
            if amp1:
                n_dil = len(cfg.resblock_dilation_sizes[j])
                for k in range(n_dil):
                    block[f"conv1_{k}"] = {"conv": _conv1d(sd, f"{base}.convs1.{k}")}
                    block[f"conv2_{k}"] = {"conv": _conv1d(sd, f"{base}.convs2.{k}")}
                    block[f"act1_{k}"] = _act_params(sd, f"{base}.activations.{2 * k}")
                    block[f"act2_{k}"] = _act_params(sd, f"{base}.activations.{2 * k + 1}")
            else:
                n_dil = len(cfg.resblock_dilation_sizes[j])
                for k in range(n_dil):
                    block[f"conv_{k}"] = {"conv": _conv1d(sd, f"{base}.convs.{k}")}
                    block[f"act_{k}"] = _act_params(sd, f"{base}.activations.{k}")
            params[f"resblock_{i}_{j}"] = block

    params["activation_post"] = _act_params(sd, "activation_post")
    return params


def _act_params(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    p: Params = {"alpha": sd[f"{prefix}.act.alpha"]}
    if f"{prefix}.act.beta" in sd:
        p["beta"] = sd[f"{prefix}.act.beta"]
    return p


# ---------------------------------------------------------------------------
# Whisper encoder
# ---------------------------------------------------------------------------


def convert_whisper_state_dict(state_dict: Mapping[str, Any], encoder_only: bool = True) -> Params:
    """Whisper ``model_state_dict`` → flax params for models/whisper.py."""
    sd = strip_ddp_prefix(state_dict)

    def conv(prefix):
        return _conv1d(sd, prefix)

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    def attn(prefix):
        return {
            "query": _linear(sd, f"{prefix}.query"),
            "key": {"kernel": sd[f"{prefix}.key.weight"].T},
            "value": _linear(sd, f"{prefix}.value"),
            "out": _linear(sd, f"{prefix}.out"),
        }

    def block(prefix, cross: bool):
        p = {
            "attn": attn(f"{prefix}.attn"),
            "attn_ln": ln(f"{prefix}.attn_ln"),
            "mlp_0": _linear(sd, f"{prefix}.mlp.0"),
            "mlp_2": _linear(sd, f"{prefix}.mlp.2"),
            "mlp_ln": ln(f"{prefix}.mlp_ln"),
        }
        if cross:
            p["cross_attn"] = attn(f"{prefix}.cross_attn")
            p["cross_attn_ln"] = ln(f"{prefix}.cross_attn_ln")
        return p

    n_enc = max(
        int(m.group(1)) + 1
        for k in sd
        if (m := re.match(r"encoder\.blocks\.(\d+)\.", k))
    )
    enc: Params = {
        "conv1": conv("encoder.conv1"),
        "conv2": conv("encoder.conv2"),
        "ln_post": ln("encoder.ln_post"),
    }
    for i in range(n_enc):
        enc[f"block_{i}"] = block(f"encoder.blocks.{i}", cross=False)

    if encoder_only:
        return enc

    n_dec = max(
        int(m.group(1)) + 1
        for k in sd
        if (m := re.match(r"decoder\.blocks\.(\d+)\.", k))
    )
    dec: Params = {
        "token_embedding": {"embedding": sd["decoder.token_embedding.weight"]},
        "positional_embedding": sd["decoder.positional_embedding"],
        "ln": ln("decoder.ln"),
    }
    for i in range(n_dec):
        dec[f"block_{i}"] = block(f"decoder.blocks.{i}", cross=True)
    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------------------
# File-level loaders (torch only imported here)
# ---------------------------------------------------------------------------


def _torch_load(path: str) -> Dict[str, Any]:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


# Official Whisper checkpoint digests — the sha256 components of the
# reference's download-URL registry
# (/root/reference/utils/whisper_extractor/__init__.py:18-31). This
# environment has no egress, so only the *integrity* half of that
# contract applies: a local file claiming to be one of these models must
# match its published digest.
WHISPER_SHA256: Dict[str, str] = {
    "tiny.en": "d3dd57d32accea0b295c96e26691aa14d8822fac7d9d27d5dc00b4ca2826dd03",
    "tiny": "65147644a518d12f04e32d6f3b26facc3f8dd46e5390956a9424a650c0ce22b9",
    "base.en": "25a8566e1d0c1e2231d1c762132cd20e0f96a85d16145c3a00adf5d1ac670ead",
    "base": "ed3a0b6b1c0edf879ad9b11b1af5a0e6ab5db9205f891f668f8b0e6c6326e34e",
    "small.en": "f953ad0fd29cacd07d5a9eda5624af0f6bcf2258be67c92b79389873d91e0872",
    "small": "9ecf779972d90ba49c06d968637d720dd632c55bbf19d441fb42bf17a411e794",
    "medium.en": "d7440d1dc186f76616474e0ff0b3b6b879abc9d1a4926b7adfa41db2d497ab4f",
    "medium": "345ae4da62f9b3d59415adc60127b97c714f32e89e936602e85993674d08dcb1",
    "large-v1": "e4b87e7e0bf463eb8e6956e646f1e277e901512310def2c24bf0e11bd3c28e9a",
    "large-v2": "81f7c96c852ee8fc832187b0132e569d6c3065a3252ed18e56effd0b6a73e524",
    "large": "81f7c96c852ee8fc832187b0132e569d6c3065a3252ed18e56effd0b6a73e524",
}


def file_sha256(path: str) -> str:
    import hashlib

    h = hashlib.sha256()
    with open(path, "rb") as f:
        for block in iter(lambda: f.read(1 << 20), b""):
            h.update(block)
    return h.hexdigest()


def verify_sha256(path: str, expected: str) -> None:
    """Raise RuntimeError when ``path`` does not hash to ``expected`` —
    the reference's post-download integrity rule
    (whisper_extractor/__init__.py:61-63) applied to a local file."""
    actual = file_sha256(path)
    if actual != expected.lower():
        raise RuntimeError(
            f"{path}: SHA256 checksum does not match (expected {expected}, "
            f"got {actual}); the checkpoint is corrupt or mislabelled"
        )


def load_mapper_params(path: str, cfg, expected_sha256: str | None = None) -> Tuple[Params, Params]:
    """Load + convert a mapper ``.pt`` checkpoint (ckpt key ``state_dict``)."""
    if expected_sha256:
        verify_sha256(path, expected_sha256)
    ckpt = _torch_load(path)
    return convert_mapper_state_dict(ckpt["state_dict"], cfg)


def load_vocoder_params(path: str, cfg, expected_sha256: str | None = None) -> Params:
    """Load + convert a vocoder ``.pt`` checkpoint (``generator_state_dict``)."""
    if expected_sha256:
        verify_sha256(path, expected_sha256)
    ckpt = _torch_load(path)
    return convert_vocoder_state_dict(ckpt["generator_state_dict"], cfg)


def load_whisper(
    path_or_name: str,
    download_root: str | None = None,
    expected_sha256: str | None = None,
    verify: bool = True,
):
    """Load a Whisper checkpoint → (dims dict, encoder params [, decoder]).

    Accepts a filesystem path (the zero-egress environment cannot download;
    the reference's URL registry semantics live in models/whisper.py).
    Integrity: an explicit ``expected_sha256`` is always enforced; when the
    filename matches an official model name (``medium.pt`` etc.) the file
    is checked against WHISPER_SHA256 unless ``verify=False``.
    """
    expected = expected_sha256
    if expected is None and verify:
        stem = os.path.splitext(os.path.basename(path_or_name))[0]
        expected = WHISPER_SHA256.get(stem)
    if expected:
        verify_sha256(path_or_name, expected)
    ckpt = _torch_load(path_or_name)
    return ckpt["dims"], convert_whisper_state_dict(ckpt["model_state_dict"], encoder_only=False)
