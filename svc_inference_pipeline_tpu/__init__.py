"""svc_inference_pipeline_tpu — a TPU-native singing-voice-conversion framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``WallaceRao/svc_inference_pipeline`` (reference: /root/reference): an
end-to-end singing-voice-conversion inference stack

    wav in  →  DSP front-end (mel / F0 / energy)
            →  content encoders (Whisper PPG, ContentVec)
            →  condition encoder (content + melody + loudness + singer)
            →  DiffSVC DDPM acoustic model (lax.scan sampling)
            →  BigVGAN vocoder
            →  wav out

re-designed TPU-first:

* channels-last ``[B, T, C]`` layouts everywhere, bf16 on the MXU,
* the DDPM reverse process as a single ``jax.lax.scan``,
* fused Pallas kernels for the BigVGAN anti-aliased snake activation,
* ``jax.sharding.Mesh``-based data/tensor parallelism instead of NCCL,
* pure functions — no module-level mutable state (the reference keeps
  DDPM coefficients and mel filterbanks in module globals).

Package map
-----------
``config``      json5 config loader (compatible with the reference's
                ``config/config.json`` schema, utils/util.py:68-123).
``ops``         DSP primitives: STFT/mel/energy, resampling, F0, Pallas kernels.
``models``      Flax modules: condition encoders, DiffSVC, BigVGAN, Whisper,
                HuBERT/ContentVec.
``sampling``    DDPM / PLMS / DDIM samplers as lax.scan.
``parallel``    Mesh construction + sharding rules (data/tensor parallel).
``checkpoints`` PyTorch→JAX weight converters (weight-norm folding) and
                native Orbax checkpoint I/O.
``pipeline``    The end-to-end ``convert()`` API mirroring infer.py.
``training``    Diffusion + GAN training steps (the reference ships dead
                discriminators; here they are live).
"""

__version__ = "0.1.0"

from svc_inference_pipeline_tpu.config import load_config, HParams  # noqa: F401
