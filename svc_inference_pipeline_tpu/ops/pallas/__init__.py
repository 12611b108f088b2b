from svc_inference_pipeline_tpu.ops.pallas.snake import fused_activation1d  # noqa: F401
