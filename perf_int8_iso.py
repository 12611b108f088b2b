"""Isolate the int8 denoiser error source: weights vs activations.

Runs the fused DDPM chain (interpret mode, reduced shape) four ways:
  f32        — reference chain
  int8       — full int8 kernel (per-row activation scales)
  w-only     — f32 kernel over DEQUANTIZED int8 weights (weight error only)
  tail-K     — int8 for the first steps, f32 for the last K steps

and reports final-mel corr/rmse/rel-max-err vs the f32 chain. Answers
whether the 0.9998 corr ceiling is weight- or activation-dominated and
how much a full-precision tail buys back.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from svc_inference_pipeline_tpu.config import DEFAULT_CONFIG, load_config
from svc_inference_pipeline_tpu.models.diffsvc import DiffSVCDenoiser
from svc_inference_pipeline_tpu.ops.pallas.denoiser_step import (
    make_pallas_denoise_fn,
    _quantize_cols,
)
from svc_inference_pipeline_tpu.sampling.schedule import DiffusionSchedule
from svc_inference_pipeline_tpu.utils.devices import fast_random_params


def dequant_params(params, L, names=("dilated_conv", "output_projection"),
                   cols=None):
    """Round-trip the chosen hot matmul weights through int8 (f32 storage).

    ``cols=(lo_frac, hi_frac)`` restricts the rounding to that fraction of
    output columns (e.g. (0, 0.5) = wout's residual half only)."""
    out = jax.tree.map(lambda x: x, params)  # shallow-ish copy of leaves
    out = jax.device_get(out)
    for i in range(L):
        for name in names:
            w = np.asarray(out[f"residual_{i}"][name]["kernel"], np.float32)
            shp = w.shape
            w2 = w.reshape(-1, shp[-1])
            q, s = _quantize_cols(jnp.asarray(w2))
            deq = (np.asarray(q, np.float32) * np.asarray(s)).reshape(shp)
            if cols is not None:
                n = shp[-1]
                lo, hi = int(cols[0] * n), int(cols[1] * n)
                keep = np.asarray(out[f"residual_{i}"][name]["kernel"], np.float32)
                deq = keep.copy()
                full = (np.asarray(q, np.float32) * np.asarray(s)).reshape(shp)
                deq[..., lo:hi] = full[..., lo:hi]
            out[f"residual_{i}"][name]["kernel"] = jnp.asarray(deq)
    return out


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    cfg = load_config(DEFAULT_CONFIG)
    mcfg = cfg.mapper.replace(
        residual_layer_num=6, noise_schedule_factors=[0.0001, 0.02, steps]
    )
    b, t = 1, 64
    model = DiffSVCDenoiser(mcfg, compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, mcfg.n_mel)), jnp.float32)
    cond = jnp.asarray(
        rng.standard_normal((b, t, mcfg.conditioner_size)), jnp.float32
    )
    params = fast_random_params(
        lambda: model.init(
            jax.random.PRNGKey(0), x, cond, jnp.zeros((b, 1), jnp.int32)
        )
    )["params"]
    params = jax.tree.map(
        lambda p: jnp.asarray(
            (np.random.default_rng(1).standard_normal(p.shape) * 0.05).astype(
                np.float32
            ),
            p.dtype,
        ),
        params,
    )
    sched = DiffusionSchedule.from_factors(mcfg.noise_schedule_factors)
    key = jax.random.PRNGKey(7)
    shape = (b, t, mcfg.n_mel)

    def run(p, quantize, tail=0):
        fn = make_pallas_denoise_fn(
            p, cond, sched.num_steps, mcfg, compute_dtype=jnp.float32,
            interpret=True, quantize=quantize, quantize_tail=tail,
        )
        return np.asarray(fn.fused_ddpm(key, shape, sched))

    ref = run(params, None)

    def report(tag, out):
        rel = float(np.abs(out - ref).max() / np.abs(ref).max())
        corr = float(np.corrcoef(out.ravel(), ref.ravel())[0, 1])
        rmse = float(np.sqrt(np.mean((out - ref) ** 2)))
        print(f"{tag:>10}: corr {corr:.6f}  rmse {rmse:.5f}  rel-max {rel:.4f}",
              flush=True)

    L = mcfg.residual_layer_num
    report("int8", run(params, "int8"))
    report("w-only", run(dequant_params(params, L), None))
    report("w1-only", run(dequant_params(params, L, ("dilated_conv",)), None))
    report("wout-only",
           run(dequant_params(params, L, ("output_projection",)), None))
    report("int8-w1", run(params, "int8-w1"))
    report("wout-res½",
           run(dequant_params(params, L, ("output_projection",), cols=(0, 0.5)),
               None))
    report("wout-skip½",
           run(dequant_params(params, L, ("output_projection",), cols=(0.5, 1.0)),
               None))
    for tail in (steps // 20, steps // 10, steps // 4):
        report(f"tail-{tail}", run(params, "int8", tail=tail))
        report(f"w1+tail-{tail}", run(params, "int8-w1", tail=tail))


if __name__ == "__main__":
    main()
