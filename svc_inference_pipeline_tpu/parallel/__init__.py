from svc_inference_pipeline_tpu.parallel.mesh import make_mesh  # noqa: F401
from svc_inference_pipeline_tpu.parallel.sharding import (  # noqa: F401
    shard_params,
    batch_sharding,
    replicate,
    MAPPER_TP_RULES,
    VOCODER_TP_RULES,
    WHISPER_TP_RULES,
)
