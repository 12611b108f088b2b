"""Native host runtime (C++): WAV codec + resampler, via ctypes.

Builds lazily with the system compiler on first import; all users go
through :mod:`utils.audio_io`, which falls back to the pure-numpy codec
when no compiler is available.
"""

from svc_inference_pipeline_tpu.native import wav_codec  # noqa: F401
