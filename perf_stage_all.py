"""Per-stage fused AMP kernel attribution on the real chip.

For each production vocoder stage (C = 768…24 at 944 input frames):
kernel-only device time, plus _DEBUG bisects (no_act / no_conv) to
attribute VPU (snake sandwiches) vs MXU (conv matmuls) vs residual
data-movement cost. Optionally the exact-edges patch cost.

Usage: python perf_stage_all.py [--edges] [--stages 0,1,5]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

KS = (3, 7, 11)
DILS = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
T_IN = 944
RATES = (4, 4, 2, 2, 2, 2)
C0 = 1536


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--edges", action="store_true", help="also time exact_edges=True")
    p.add_argument("--stages", default="0,1,2,3,4,5")
    p.add_argument("--bisect", action="store_true", help="no_act / no_conv runs")
    p.add_argument("--t-tile", type=int, default=0,
                   help="override fused_amp_stage's base t_tile (0 = default)")
    args = p.parse_args()
    stages = [int(s) for s in args.stages.split(",")]

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import _profiled_device_ms
    from svc_inference_pipeline_tpu.ops.pallas import amp_stage
    from svc_inference_pipeline_tpu.ops.pallas.amp_stage import fused_amp_stage

    rng = np.random.default_rng(0)

    def mk_pair(c, k):
        w1 = jnp.asarray(rng.standard_normal((k, c, c)) * 0.02, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((k, c, c)) * 0.02, jnp.float32)
        b = jnp.asarray(rng.standard_normal((c,)) * 0.01, jnp.float32)
        a = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
        return (w1, b, w2, b, a, a, a, a)

    total = 0.0
    t = T_IN
    for i, r in enumerate(RATES):
        t *= r
        c = C0 >> (i + 1)
        if i not in stages:
            continue
        x = jnp.asarray(rng.standard_normal((1, t, c)) * 0.1, jnp.bfloat16)
        block_params = tuple(
            tuple(mk_pair(c, KS[blk]) for _ in DILS[blk]) for blk in range(3)
        )

        kw = {"t_tile": args.t_tile} if args.t_tile else {}

        def run(edges=False):
            fn = lambda: fused_amp_stage(
                x, block_params, KS, DILS, exact_edges=edges, **kw
            ).block_until_ready()
            fn()
            return _profiled_device_ms(fn)

        ms = run()
        total += ms
        line = f"stage{i} [1,{t},{c}] kernel-only {ms:7.2f} ms"
        if args.edges:
            line += f"   +edges {run(True):7.2f} ms"
        print(line, flush=True)

        if args.bisect:
            for knob in ("no_act", "no_conv"):
                amp_stage._DEBUG[knob] = True
                jax.clear_caches()
                ms_k = run()
                amp_stage._DEBUG[knob] = False
                jax.clear_caches()
                print(f"        {knob:8s} {ms_k:7.2f} ms (delta {ms - ms_k:+6.2f})",
                      flush=True)

    print(f"kernel-only total (stages {stages}): {total:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
