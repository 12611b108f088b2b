from svc_inference_pipeline_tpu.utils.audio_io import (  # noqa: F401
    load_audio,
    save_audio,
    read_wav,
    write_wav,
)
from svc_inference_pipeline_tpu.utils.registry import get_singer_id, load_singer_lut  # noqa: F401
from svc_inference_pipeline_tpu.utils.artifacts import (  # noqa: F401
    load_mel_min_max,
    get_target_f0_median,
)
