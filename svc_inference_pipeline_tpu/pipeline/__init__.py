from svc_inference_pipeline_tpu.pipeline.convert import SVCPipeline  # noqa: F401
