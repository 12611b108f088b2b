from svc_inference_pipeline_tpu.ops.mel import (  # noqa: F401
    mel_filterbank,
    mel_spectrogram,
    extract_mel_features,
)
from svc_inference_pipeline_tpu.ops.whisper_mel import log_mel_spectrogram  # noqa: F401
from svc_inference_pipeline_tpu.ops.resample import resample  # noqa: F401
