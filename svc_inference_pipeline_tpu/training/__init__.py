from svc_inference_pipeline_tpu.training.diffusion import (  # noqa: F401
    DiffusionTrainState,
    make_diffusion_train_step,
    init_diffusion_train_state,
)
