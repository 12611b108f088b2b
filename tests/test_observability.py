import json

import jax.numpy as jnp
import numpy as np

from svc_inference_pipeline_tpu.utils.observability import (
    Metrics,
    capture_intermediates,
    get_logger,
    trace,
)


def test_metrics_counters_and_observations():
    m = Metrics()
    m.incr("conversions")
    m.incr("conversions")
    m.observe("rtf", 0.04)
    m.observe("rtf", 0.06)
    s = m.summary()
    assert s["conversions"] == 2
    assert s["rtf"]["count"] == 2
    assert abs(s["rtf"]["mean"] - 0.05) < 1e-9
    json.loads(m.to_json())
    m.reset()
    assert m.summary() == {}


def test_trace_records_span():
    Metrics.default().reset()
    with trace("unit_test_span"):
        pass
    assert "span/unit_test_span" in Metrics.default().summary()


def test_capture_intermediates_replaces_stats_tuples(cfg):
    """The reference returns (out, stats) tuples from every forward
    (modules/diffsvc.py:94,232,321); here intermediates come functionally."""
    import jax

    from svc_inference_pipeline_tpu.models.diffsvc import DiffSVCDenoiser
    from svc_inference_pipeline_tpu.utils.devices import fast_random_params

    mcfg = cfg.mapper.replace(residual_layer_num=2)
    model = DiffSVCDenoiser(mcfg)
    x = jnp.zeros((1, 8, 100))
    cond = jnp.zeros((1, 8, 384))
    t = jnp.zeros((1, 1), jnp.int32)
    params = fast_random_params(lambda: model.init(jax.random.PRNGKey(0), x, cond, t))

    out, inter = capture_intermediates(model, {"params": params["params"]}, x, cond, t)
    assert out.shape == (1, 8, 100)
    # step-encoder stats (reference stats['step_embedding'], diffsvc.py:85)
    assert "step_embedding" in inter["diffusion_embedding"]
    # per-layer gated outputs (reference stats['noise_step_condition'])
    assert "noise_step_condition" in inter["residual_0"]
    assert "noise_step_condition" in inter["residual_1"]


def test_logger_singleton():
    a = get_logger("svc_test")
    b = get_logger("svc_test")
    assert a is b and len(a.handlers) == 1
