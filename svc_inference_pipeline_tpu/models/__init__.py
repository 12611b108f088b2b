from svc_inference_pipeline_tpu.models.encoder import ConditionEncoder  # noqa: F401
from svc_inference_pipeline_tpu.models.diffsvc import DiffSVCDenoiser  # noqa: F401
from svc_inference_pipeline_tpu.models.bigvgan import BigVGANGenerator  # noqa: F401
from svc_inference_pipeline_tpu.models.whisper import WhisperAudioEncoder, WhisperDims  # noqa: F401
