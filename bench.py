"""Benchmark: end-to-end conversion RTF on one TPU chip.

Workload = the reference pipeline's headline path at full model scale
(BASELINE.md): 10 s clip → mel/F0/energy front-end → Whisper-medium-size
encoder → 1000-step DDPM over the 20-block DiffSVC denoiser → full-width
BigVGAN → waveform. Random weights (the reference repo ships no
checkpoints); compute shape and numerics match the real models exactly.

Prints the headline JSON line
    {"metric": "e2e_rtf_10s_ddpm1000", "value": <rtf>, "unit": "rtf",
     "vs_baseline": <0.05 / rtf>}
IMMEDIATELY after the first timed run (warm-up + 1), then keeps
re-printing the line enriched/refined after every additional measurement
— each stdout JSON line is a superset of the previous one, so parsing
either the FIRST or the LAST line yields a valid record.

vs_baseline is measured against the BASELINE.md target (RTF < 0.05 on one
v5e chip, the wall-clock contract of the reference's infer.py timing
bracket): >1.0 means the target is beaten.

Timeout discipline (rounds 2 and 4 both lost their driver run to rc 124
before the single line-190 emit): the headline now goes out after ONE
timed run — nothing after warm-up can zero the record — and every extra
stage that could trigger a fresh remote compile (fast samplers, quantize
variants, batch throughput) is budget-gated via ``BENCH_BUDGET`` seconds
(default 2200, measured from the headline emit so the variable-cost
build/warm-up can't starve the extras), runs under a HARD per-extra wall
cap (``BENCH_EXTRA_TIMEOUT``, default 1250 s — clears one healthy cold
remote compile; a wedged remote-compile service hangs fresh compiles
forever and try/except can't catch that),
and re-emits the scoreboard as soon as it lands. Extras run in value
order (vocoder, full-precision counterpart, batched throughput, then
the sampler-comparison rows) so a straggler only ever costs the tail.
``BENCH_SAMPLERS`` (default "plms,ddim,dpmpp") picks the sampler rows.

BENCH_QUANTIZE overrides the headline denoiser quantize mode
(default int8-w1 — the mode that passes the final-mel corr >= 0.9999
quality gate in tests/test_int8_denoiser.py; "none" = full precision,
reported alongside as bf16_ddpm1000_rtf either way).
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

START = time.time()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def elapsed():
    return time.time() - START


def _profiled_device_ms(run_fn) -> float:
    """Total TPU busy time (ms) for one call of ``run_fn``, via a
    jax.profiler trace. Sums top-level module executions on the device
    plane ('XLA Modules' line) so nested op events aren't double-counted;
    falls back to the busiest line when that line is absent."""
    import glob
    import shutil
    import tempfile

    import jax

    trace_dir = tempfile.mkdtemp(prefix="bench_trace_")
    try:
        with jax.profiler.trace(trace_dir):
            run_fn()
        paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
        if not paths:
            return 0.0
        from jax.profiler import ProfileData

        pd = ProfileData.from_file(paths[0])
        best = 0.0
        for plane in pd.planes:
            if "tpu" not in plane.name.lower():
                continue
            module_ms = None
            line_sums = []
            for line in plane.lines:
                s = sum(ev.duration_ns for ev in line.events) / 1e6
                line_sums.append(s)
                if "module" in line.name.lower():
                    module_ms = (module_ms or 0.0) + s
            plane_ms = module_ms if module_ms is not None else max(line_sums, default=0.0)
            best = max(best, plane_ms)
        return best
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)


def run_extra(label: str, seconds: float, fn):
    """Run one budget-gated extra with a HARD wall-clock cap.

    A sick remote-compile service can HANG a fresh compile indefinitely
    (observed: tpu_compile_helper SIGKILL → subsequent compiles block
    forever) — a plain try/except can't save the run from that. Each
    extra therefore runs on a daemon thread: on timeout it is abandoned
    (the thread may finish later or never; it holds no locks the main
    path needs) and the scoreboard moves on. Returns True when the extra
    completed, False on timeout or error."""
    out = {}

    def tgt():
        try:
            out["r"] = fn()
        except Exception as e:  # noqa: BLE001 — extras never kill the record
            out["e"] = e

    th = threading.Thread(target=tgt, daemon=True, name=f"extra-{label}")
    th.start()
    th.join(seconds)
    if th.is_alive():
        log(f"{label}: no result after {seconds:.0f}s — abandoned (likely a "
            "wedged remote compile); scoreboard continues without it")
        return False
    if "e" in out:
        log(f"{label} failed: {out['e']}")
        return False
    return True


def main():
    # extras' hard per-stage caps (run_extra) are the timeout defense now;
    # the budget just bounds how much tail the scoreboard chases. It is
    # measured FROM THE HEADLINE EMIT (see extras_elapsed below), not from
    # process start — the mandatory model build + warm-up vary 3-10x with
    # host contention and cache state, and must not starve the extras.
    budget = float(os.environ.get("BENCH_BUDGET", 2200))
    # hard per-extra wall cap (compile hangs can't stall the scoreboard);
    # 1250 s clears a healthy cold remote compile (~1070-1270 s observed)
    # while still bounding a wedged compile service to ~2 lost extras
    extra_timeout = float(os.environ.get("BENCH_EXTRA_TIMEOUT", 1250))
    headline_quant = os.environ.get("BENCH_QUANTIZE", "int8-w1")
    if headline_quant.lower() in ("none", "", "bf16", "off"):
        headline_quant = None

    import jax

    # persistent compile cache: repeated bench runs skip the (remote) compiles
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimisation, never fatal
        log(f"compilation cache unavailable: {e}")

    from svc_inference_pipeline_tpu.config import DEFAULT_CONFIG, load_config
    from svc_inference_pipeline_tpu.pipeline.convert import SVCPipeline
    from svc_inference_pipeline_tpu.utils.audio_io import load_audio

    cfg = load_config(DEFAULT_CONFIG)
    log(f"devices: {jax.devices()}")

    # 10 s input: tile the reference clip if available, else a harmonic tone
    src = "/root/reference/test_set/1100000814.wav"
    fs = cfg.fs
    if os.path.exists(src):
        audio, _ = load_audio(src, fs)
        audio = np.asarray(audio)
        reps = int(np.ceil(10 * fs / len(audio)))
        audio = np.tile(audio, reps)[: 10 * fs]
    else:
        t = np.arange(10 * fs) / fs
        audio = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    duration = len(audio) / fs

    t0 = time.time()
    # bucket=16: latency-tuned padding granularity (938 frames -> 944 not 960;
    # ~2% less DDPM/vocoder work; one compiled bucket per 16-frame class)
    cfg.denoiser_quantize = headline_quant
    pipe = SVCPipeline.from_config(cfg, random_weights=True, whisper_size="medium", bucket=16)
    log(f"model build ({headline_quant or 'bf16'}): {time.time() - t0:.1f}s"
        f"  (elapsed {elapsed():.0f}s)")

    key = jax.random.PRNGKey(0)

    # warm-up (compiles every stage); pcm16: output finalised on device
    # (peak-norm + int16 — the exact WAV payload)
    t0 = time.time()
    wave = pipe.convert(audio, "svcc_CDF1", key=key, pcm16=True, upload_pcm16=True)
    log(f"warm-up (incl. compile): {time.time() - t0:.1f}s, out {wave.shape} {wave.dtype}"
        f"  (elapsed {elapsed():.0f}s)")

    # ---- headline: banked after ONE timed run (tunnel jitter ±20-35 ms →
    # RTF ±0.003 provisional error), refined to a 7-sample median below.
    # Nothing past this point can zero the round (rounds 2+4 rc-124 lesson).
    times = []
    t0 = time.time()
    wave = pipe.convert(audio, "svcc_CDF1", key=jax.random.PRNGKey(1),
                        pcm16=True, upload_pcm16=True)
    times.append(time.time() - t0)
    metrics = {
        "metric": "e2e_rtf_10s_ddpm1000",
        "value": float(times[0] / duration),
        "unit": "rtf",
        "vs_baseline": 0.05 / (times[0] / duration),
        "denoiser_quantize": headline_quant or "bf16",
    }
    print(json.dumps(metrics), flush=True)

    # extras budget clock starts HERE — the headline is banked, everything
    # past this point is optional scoreboard tail
    t_headline = time.time()

    def extras_elapsed():
        return time.time() - t_headline

    def emit():
        metrics["vs_baseline"] = 0.05 / metrics["value"]
        print(json.dumps(metrics), flush=True)

    # quality-parity scoreboard vs the torch reference chain (CPU-only,
    # deterministic — eval_parity.py): launched as a niced subprocess so it
    # overlaps the device-bound runs + remote compiles below, collected at
    # the end
    import subprocess

    parity_proc = subprocess.Popen(
        ["nice", "-n", "10", sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)), "eval_parity.py")],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )

    # refine: the tunnel adds ±20-35 ms of per-call jitter — 7 samples give
    # a stable median (3 samples can swing the RTF by ±0.003)
    for i in range(2, 8):
        t0 = time.time()
        wave = pipe.convert(audio, "svcc_CDF1", key=jax.random.PRNGKey(i),
                            pcm16=True, upload_pcm16=True)
        times.append(time.time() - t0)
    rtf = float(np.median(times) / duration)
    metrics["value"] = rtf
    log(f"e2e times: {[f'{x:.3f}' for x in times]} → RTF {rtf:.4f} ({duration:.1f}s audio)")
    emit()

    # core breakdown through the SAME compiled executable as convert()
    # (identical static args incl. pcm16=True — round 2's separate
    # pcm16=False executable cost a 515 s remote compile)
    import jax.numpy as jnp

    t0 = time.time()
    batch, n_frames = pipe.extract_features(audio, "svcc_CDF1", upload_pcm16=True)
    fe_time = time.time() - t0
    log(f"front-end (mel+f0+whisper+pack): {fe_time:.3f}s")

    arrays = {k: jnp.asarray(v) for k, v in batch.items()}
    padded = batch["melody"].shape[1]
    n_true = jnp.asarray([n_frames], jnp.int32)

    core_sampler, core_speedup = pipe._resolve_sampler(None, None)

    def run_core():
        out = pipe._core(pipe.cond_params, pipe.denoiser_params, pipe.vocoder_params,
                         arrays, key, n_true, n_frames=padded, pcm16=True,
                         sampler=core_sampler, speedup=core_speedup)
        np.asarray(out)  # fetch → one tunnel round trip, like convert()

    core_times = []
    for _ in range(5):
        t0 = time.time()
        run_core()
        core_times.append(time.time() - t0)
    core_rtf = float(np.median(core_times) / duration)
    metrics["core_rtf_10s_ddpm1000"] = core_rtf
    log(f"core (cond+ddpm1000+vocoder): {np.median(core_times):.3f}s → RTF {core_rtf:.4f} "
        "(device + one tunnel round trip; the e2e number adds upload/fetch RTs that a "
        "co-located host would not pay)")
    emit()

    # device-only RTF from a profiler trace of the SAME executable: the
    # number a co-located host would see. The tunnel adds ±20-55 ms of RT
    # jitter per call to every wall number above; ProfileData device time
    # has none of it. Runs AFTER the headline is banked (the xplane fetch
    # rides the tunnel and could stall).
    try:
        device_ms = _profiled_device_ms(run_core)
        if device_ms:
            device_rtf = device_ms / 1e3 / duration
            metrics["device_rtf_10s_ddpm1000"] = device_rtf
            log(f"profiled device time: {device_ms:.1f} ms → device RTF {device_rtf:.4f}")
            emit()
    except Exception as e:  # profiling is auxiliary, never fatal
        log(f"device profile unavailable: {e}")

    # ---- BigVGAN stage throughput (BASELINE.md: samples/sec, mel→waveform).
    # One extra executable (vocoder-only jit) — budget-gated like every
    # stage below that can trigger a fresh remote compile.
    if extras_elapsed() < budget:
        def voc_extra():
            voc_fn = jax.jit(
                lambda vp, mel: pipe.vocoder.apply({"params": vp}, mel)
            )
            mel_in = jnp.asarray(
                np.random.default_rng(0).standard_normal((1, padded, cfg.mapper.n_mel)),
                jnp.float32,
            )
            t0 = time.time()
            np.asarray(voc_fn(pipe.vocoder_params, mel_in))
            log(f"vocoder compile+warm-up: {time.time() - t0:.1f}s  (elapsed {elapsed():.0f}s)")
            voc_times = []
            for _ in range(5):
                t0 = time.time()
                np.asarray(voc_fn(pipe.vocoder_params, mel_in))
                voc_times.append(time.time() - t0)
            voc_s = float(np.median(voc_times))
            sps = padded * cfg.hop_length / voc_s
            metrics["bigvgan_samples_per_sec"] = sps
            metrics["bigvgan_rtf"] = voc_s / (padded * cfg.hop_length / fs)
            log(f"bigvgan mel→wave: {voc_s*1e3:.1f} ms for {padded * cfg.hop_length} samples "
                f"→ {sps/1e6:.2f} Msamples/s ({sps/fs:.0f}x realtime)")

        if run_extra("vocoder throughput", extra_timeout, voc_extra):
            emit()
    else:
        log(f"skipping vocoder throughput: extras wall {extras_elapsed():.0f}s > budget {budget:.0f}s")

    # ---- the full-precision counterpart of the headline (or, when the
    # headline runs full precision, the quality-gated int8-w1 speed mode):
    # fresh pipeline = fresh core executable, so budget-gated.
    alt_quant = None if headline_quant else "int8-w1"
    alt_tag = "bf16" if alt_quant is None else alt_quant.replace("-", "")
    pipe_fp = pipe if headline_quant is None else None
    if extras_elapsed() < budget:
        alt_box = {}

        def alt_extra():
            # reuse the headline pipe's params (same seed-0 weights either
            # way): quantize mode is a kernel flag, not a repack, so the
            # second ~15-min full-scale weight build is pure waste
            cfg.denoiser_quantize = alt_quant
            apipe = SVCPipeline(cfg, pipe.cond_params, pipe.denoiser_params,
                                pipe.vocoder_params, pipe.whisper, bucket=16)
            t0 = time.time()
            apipe.convert(audio, "svcc_CDF1", key=key, pcm16=True, upload_pcm16=True)
            log(f"{alt_tag} compile+warm-up: {time.time() - t0:.1f}s  (elapsed {elapsed():.0f}s)")
            a_times = []
            for i in range(5):
                t0 = time.time()
                apipe.convert(audio, "svcc_CDF1", key=jax.random.PRNGKey(i),
                              pcm16=True, upload_pcm16=True)
                a_times.append(time.time() - t0)
            a_rtf = float(np.median(a_times) / duration)
            metrics[f"{alt_tag}_ddpm1000_rtf"] = a_rtf
            log(f"{alt_tag} DDPM-1000 e2e RTF: {a_rtf:.4f} (vs_baseline {0.05 / a_rtf:.2f})")
            alt_box["pipe"] = apipe

        if run_extra(f"{alt_tag} extra", extra_timeout, alt_extra):
            emit()
            if alt_quant is None:
                pipe_fp = alt_box["pipe"]  # full-precision pipe for sampler/batch rows
    else:
        log(f"skipping {alt_tag} extra: extras wall {extras_elapsed():.0f}s > budget {budget:.0f}s")

    # ---- batched serving throughput (clips/sec on the PLMS@10 serving
    # path — the number that justifies the DP/serving layer; the reference
    # has no batching at all, SURVEY §2.9). One batched executable per B.
    if pipe_fp is not None:
        singers = ["svcc_CDF1", "svcc_CDM1", "svcc_IDF1", "svcc_IDM1"]
        for b in (4, 8):
            if extras_elapsed() > budget:
                log(f"skipping batch{b} extra: extras wall {extras_elapsed():.0f}s > budget {budget:.0f}s")
                continue

            def batch_extra(b=b):
                clips = [audio] * b
                names = (singers * ((b + 3) // 4))[:b]
                t0 = time.time()
                pipe_fp.convert_batch(clips, names, key=jax.random.PRNGKey(0),
                                      sampler="plms", speedup=10)
                log(f"batch{b} compile+warm-up: {time.time() - t0:.1f}s"
                    f"  (elapsed {elapsed():.0f}s)")
                b_times = []
                for i in range(3):
                    t0 = time.time()
                    pipe_fp.convert_batch(clips, names, key=jax.random.PRNGKey(i),
                                          sampler="plms", speedup=10)
                    b_times.append(time.time() - t0)
                b_s = float(np.median(b_times))
                metrics[f"batch{b}_clips_per_sec"] = b / b_s
                log(f"batch{b} plms@10: {b_s*1e3:.0f} ms/batch → {b / b_s:.2f} clips/s "
                    f"({b * duration / b_s:.1f}x realtime aggregate)")

            if run_extra(f"batch{b} extra", extra_timeout, batch_extra):
                emit()

    # ---- fast samplers: plms/ddim/dpmpp @ speedup 10 on the FULL-PRECISION
    # pipeline (comparable across rounds; separate executables, each gated
    # so a fresh remote compile can't overrun the driver timeout)
    sampler_list = [s for s in os.environ.get(
        "BENCH_SAMPLERS", "plms,ddim,dpmpp").split(",") if s]
    if pipe_fp is not None:
        for sampler in sampler_list:
            if extras_elapsed() > budget:
                log(f"skipping {sampler} extra: extras wall {extras_elapsed():.0f}s > budget {budget:.0f}s")
                continue

            def sampler_extra(sampler=sampler):
                t0 = time.time()
                pipe_fp.convert(audio, "svcc_CDF1", key=key, pcm16=True,
                                upload_pcm16=True, sampler=sampler, speedup=10)
                log(f"{sampler} compile+warm-up: {time.time() - t0:.1f}s  (elapsed {elapsed():.0f}s)")
                s_times = []
                for i in range(5):
                    t0 = time.time()
                    pipe_fp.convert(audio, "svcc_CDF1", key=jax.random.PRNGKey(i),
                                    pcm16=True, upload_pcm16=True,
                                    sampler=sampler, speedup=10)
                    s_times.append(time.time() - t0)
                s_rtf = float(np.median(s_times) / duration)
                metrics[f"{sampler}10_rtf"] = s_rtf
                log(f"{sampler}@10 e2e RTF: {s_rtf:.4f} (vs_baseline {0.05 / s_rtf:.2f})")

            if run_extra(f"{sampler} extra", extra_timeout, sampler_extra):
                emit()
    else:
        log("skipping sampler extras: no full-precision pipeline available")

    # ---- collect the quality-parity subprocess (CPU chain vs torch ref)
    try:
        remaining = max(60.0, budget + 300 - extras_elapsed())
        out, _ = parity_proc.communicate(timeout=remaining)
        line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
        parity = json.loads(line)
        metrics.update({
            "parity_mel_mae": parity["mel_mae"],
            "parity_snr_db": parity["snr_db"],
            "parity_f0_rmse_cents": parity["f0_rmse_cents"],
            "parity_wave_max_err": parity["wave_max_err"],
        })
        log(f"quality parity vs torch reference (shared weights, identical noise): {parity}")
    except Exception as e:
        parity_proc.kill()
        log(f"quality parity unavailable: {e}")

    # ---- final line: the COMPLETE scoreboard (superset of the headline)
    emit()


if __name__ == "__main__":
    main()
