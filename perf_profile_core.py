"""Op-level profile of the inference core on the real chip.

Captures a jax.profiler trace of one core call (cond → DDPM-1000 →
vocoder) and prints the top ops by self time, grouped by HLO name prefix,
via jax.profiler.ProfileData — no TensorBoard needed.
"""

import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from svc_inference_pipeline_tpu.config import DEFAULT_CONFIG, load_config
    from svc_inference_pipeline_tpu.pipeline.convert import SVCPipeline
    from svc_inference_pipeline_tpu.utils.audio_io import load_audio

    cfg = load_config(DEFAULT_CONFIG)
    src = "/root/reference/test_set/1100000814.wav"
    audio, _ = load_audio(src, cfg.fs)
    audio = np.asarray(audio)
    reps = int(np.ceil(10 * cfg.fs / len(audio)))
    audio = np.tile(audio, reps)[: 10 * cfg.fs]

    # bucket=16 + pcm16 + upload_pcm16: the exact executables bench.py
    # compiled (persistent cache hit — a different signature would pay a
    # fresh multi-minute remote compile)
    pipe = SVCPipeline.from_config(cfg, random_weights=True, whisper_size="medium", bucket=16)
    key = jax.random.PRNGKey(0)

    # compile + warm
    wave = pipe.convert(audio, "svcc_CDF1", key=key, pcm16=True, upload_pcm16=True)
    print("warm ok", wave.shape, file=sys.stderr)

    trace_dir = "/tmp/jax_trace_core"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        wave = pipe.convert(audio, "svcc_CDF1", key=key, pcm16=True, upload_pcm16=True)

    # find the xplane file
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    print("xplane files:", paths, file=sys.stderr)
    if not paths:
        print("NO TRACE CAPTURED")
        return

    from jax.profiler import ProfileData

    pd = ProfileData.from_file(paths[0])
    # find the TPU device plane and sum event durations by name
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        print("plane:", plane.name, file=sys.stderr)
        for line in plane.lines:
            for ev in line.events:
                name = ev.name
                dur = ev.duration_ns / 1e6
                agg[name] += dur
                cnt[name] += 1
    total = sum(agg.values())
    print(f"total device time: {total:.1f} ms over {sum(cnt.values())} events")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{ms:9.2f} ms  x{cnt[name]:<6d} {name[:110]}")


if __name__ == "__main__":
    main()
