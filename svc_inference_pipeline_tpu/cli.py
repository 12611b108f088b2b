"""Command-line interface: the reference's ``infer.py`` as a real CLI.

The reference hard-codes input path, singer, and output path at the top of
a script (/root/reference/infer.py:26-28); here they're flags, multiple
inputs/singers batch together, and ``--random-weights`` smoke-drives the
full graph without checkpoints (the reference repo ships none).

    python -m svc_inference_pipeline_tpu.cli \
        --input clip.wav --singer svcc_CDF1 --output out.wav
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="svc_inference_pipeline_tpu",
        description="TPU-native singing voice conversion",
    )
    p.add_argument("--config", default="./config/config.json", help="json5 config path")
    p.add_argument("--input", "-i", action="append", required=True, help="source wav (repeatable)")
    p.add_argument("--singer", "-s", action="append", required=True, help="target singer name (repeatable)")
    p.add_argument("--output", "-o", action="append", required=True, help="output wav path (repeatable)")
    p.add_argument("--sampler", choices=["ddpm", "plms", "ddim", "dpmpp"], default=None, help="override cfg.mapper.sampler")
    p.add_argument("--speedup", type=int, default=None, help="PLMS stride (default from config)")
    p.add_argument("--seed", type=int, default=0, help="sampling PRNG seed")
    p.add_argument("--quantize", choices=["int8", "int8-w1"], default=None,
                   help="int8 denoiser matmuls (2x MXU rate; int8-w1 keeps "
                        "the output projection at compute dtype and passes "
                        "the final-mel corr>=0.9999 quality gate)")
    p.add_argument("--quantize-tail", type=int, default=None, metavar="K",
                   help="run the LAST K DDPM steps full-precision "
                        "(cfg.denoiser_quantize_tail)")
    p.add_argument("--random-weights", action="store_true", help="random-init models (no checkpoints needed)")
    p.add_argument("--whisper-size", default="tiny", help="whisper size when random-init (tiny…large)")
    p.add_argument("--cpu", action="store_true", help="force local CPU execution")
    p.add_argument("--bucket", type=int, default=None,
                   help="frame padding granularity (smaller = less padded compute, more compiled variants)")
    p.add_argument("--pcm16-io", action="store_true",
                   help="int16 device transfers both ways (halves host<->device bytes)")
    p.add_argument("--profile", metavar="DIR", default=None, help="write a jax.profiler trace to DIR")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from svc_inference_pipeline_tpu.config import load_config
    from svc_inference_pipeline_tpu.pipeline.convert import SVCPipeline
    from svc_inference_pipeline_tpu.utils.audio_io import save_audio

    if not (len(args.input) == len(args.singer) == len(args.output)):
        print("error: --input/--singer/--output must repeat the same number of times", file=sys.stderr)
        return 2

    cfg = load_config(args.config)
    if args.sampler:
        cfg.mapper.sampler = args.sampler
    if args.speedup:
        cfg.mapper.plms_speedup = args.speedup
    if args.quantize:
        cfg.denoiser_quantize = args.quantize
    if args.quantize_tail is not None:
        cfg.denoiser_quantize_tail = args.quantize_tail

    print(f"Loading models ({'random weights' if args.random_weights else 'checkpoints'})...")
    pipe = SVCPipeline.from_config(
        cfg, random_weights=args.random_weights, whisper_size=args.whisper_size,
        seed=args.seed, **({"bucket": args.bucket} if args.bucket else {})
    )

    start = time.time()
    if args.profile:
        jax.profiler.start_trace(args.profile)

    if len(args.input) == 1:
        waves = [
            pipe.convert(args.input[0], args.singer[0], key=jax.random.PRNGKey(args.seed),
                         upload_pcm16=args.pcm16_io)
        ]
    else:
        waves = pipe.convert_batch(
            args.input, args.singer, key=jax.random.PRNGKey(args.seed)
        )

    if args.profile:
        jax.profiler.stop_trace()
    elapsed = time.time() - start

    total_audio = sum(len(w) for w in waves) / cfg.fs
    print(f"Converted {len(waves)} clip(s), {total_audio:.2f}s audio in {elapsed:.2f}s "
          f"(RTF {elapsed / max(total_audio, 1e-9):.4f})")

    for wave, path in zip(waves, args.output):
        save_audio(path, wave, cfg.fs)
        print("Saved", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
