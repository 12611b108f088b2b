from svc_inference_pipeline_tpu.sampling.schedule import DiffusionSchedule  # noqa: F401
from svc_inference_pipeline_tpu.sampling.ddpm import ddpm_sample  # noqa: F401
from svc_inference_pipeline_tpu.sampling.plms import plms_sample  # noqa: F401
