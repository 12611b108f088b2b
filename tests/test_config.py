import json
import os

from svc_inference_pipeline_tpu.config import HParams, load_config, override_config


def test_load_config_basic(cfg):
    assert cfg.fs == 24000
    assert cfg.hop_length == 256
    assert cfg.mapper.residual_layer_num == 20
    assert cfg.mapper.input_content_dim["whisper"] == 1024
    assert cfg.vocoder.upsample_rates == [4, 4, 2, 2, 2, 2]


def test_hparams_dict_protocol():
    hp = HParams(a=1, b={"c": 2})
    assert hp["a"] == 1
    assert hp.b.c == 2
    assert "a" in hp and "z" not in hp
    assert len(hp) == 2
    assert set(hp.keys()) == {"a", "b"}
    hp["d"] = 3
    assert hp.d == 3
    assert hp.to_dict() == {"a": 1, "b": {"c": 2}, "d": 3}
    hp2 = hp.replace(a=9)
    assert hp2.a == 9 and hp.a == 1


def test_override_config_deep_merge():
    base = {"a": 1, "b": {"c": 2, "d": 3}}
    new = {"b": {"c": 9}, "e": 4}
    merged = override_config(base, new)
    assert merged == {"a": 1, "b": {"c": 9, "d": 3}, "e": 4}


def test_basic_config_inheritance(tmp_path, monkeypatch):
    parent = {"fs": 24000, "mapper": {"x": 1, "y": 2}}
    child = {"basic_config": "parent.json", "mapper": {"y": 99}}
    (tmp_path / "parent.json").write_text(json.dumps(parent))
    (tmp_path / "child.json").write_text(json.dumps(child))
    monkeypatch.setenv("WORD_DIR", str(tmp_path))
    cfg = load_config(str(tmp_path / "child.json"))
    assert cfg.fs == 24000
    assert cfg.mapper.x == 1
    assert cfg.mapper.y == 99


def test_json5_comments_accepted(tmp_path):
    (tmp_path / "c.json").write_text('{\n // comment\n "a": 1, // trailing\n "b": [1, 2,],\n}')
    cfg = load_config(str(tmp_path / "c.json"))
    assert cfg.a == 1 and cfg.b == [1, 2]


def test_singers_lut(cfg):
    from svc_inference_pipeline_tpu.utils.registry import get_singer_id

    assert get_singer_id(cfg, "svcc_CDF1")[0] == 1
    assert get_singer_id(cfg, "svcc_IDM1")[0] == 4
