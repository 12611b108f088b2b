from svc_inference_pipeline_tpu.checkpoints.torch_convert import (  # noqa: F401
    convert_mapper_state_dict,
    convert_vocoder_state_dict,
    convert_whisper_state_dict,
    fold_weight_norm,
    load_mapper_params,
    load_vocoder_params,
)
from svc_inference_pipeline_tpu.checkpoints.native_io import (  # noqa: F401
    save_checkpoint,
    load_checkpoint,
)
