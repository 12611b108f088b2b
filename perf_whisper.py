"""Whisper-medium encoder device-time A/Bs (VERDICT r3 #8).

Profiles the encoder executable ([1, 80, 3000] → [1, 1500, 1024], bf16
compute, Pallas attention) and A/Bs the remaining f32 islands:

  a) production: f32 LayerNorm + exact gelu
  b) bf16 LayerNorm affine (stats still f32)
  c) tanh-approximate gelu

Numerics deltas vs (a) are printed alongside — an island only graduates
to the live path when its device win is real AND the feature delta stays
in the bf16 noise class.

Caveat: under random_init the LN affine is identity (scale=1, bias=0), so
the fast-norms delta prints exactly 0 (cast-before vs cast-after an
identity affine is bitwise equal). The timing comparison is still valid;
judge numerics on real checkpoints or randomized affines.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import _profiled_device_ms
    from svc_inference_pipeline_tpu.models import whisper as W
    from svc_inference_pipeline_tpu.pipeline.content import WhisperPPGExtractor

    ext = WhisperPPGExtractor.random_init("medium", fs=24000)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 80, 3000)), jnp.float32
    )

    def profile(tag, fast_norms):
        W._DEBUG["fast_norms"] = fast_norms
        jax.clear_caches()
        enc = W.WhisperAudioEncoder(ext.dims, compute_dtype=jnp.bfloat16,
                                    scan_layers=True)
        fn = jax.jit(lambda p, m: enc.apply({"params": p}, m))
        out = np.asarray(fn(ext.params, mel))
        ms = _profiled_device_ms(lambda: fn(ext.params, mel).block_until_ready())
        print(f"{tag:28s} device {ms:6.2f} ms", flush=True)
        return ms, out

    base_ms, base = profile("f32 LN (production)", False)
    fast_ms, fast = profile("bf16 LN affine", True)
    scale = np.abs(base).max()
    delta = np.abs(fast - base).max() / scale
    print(f"bf16-LN: {base_ms:.2f} -> {fast_ms:.2f} ms; "
          f"rel feature delta {delta:.2e}", flush=True)
    W._DEBUG["fast_norms"] = False


if __name__ == "__main__":
    main()
