"""MFU scoreboard: analytic FLOP/byte roofline vs achieved device time.

Per pipeline stage (whisper encoder, DDPM denoiser scan, BigVGAN stages)
this prints: FLOPs, bytes moved (HBM-resident traffic the kernel cannot
avoid), the roofline time max(FLOPs/peak, bytes/BW), the achieved device
time from the latest integrated profile (perf_profile_core.py /
perf_int8.py — constants below, update when re-profiled), and MFU%.

FLOP counts are derived analytically from the config dims (the same
arithmetic the models execute — see each helper's formula), NOT from
XLA cost analysis, so the table is exact and runs host-only in <1 s.

Chip model (v5e): 197 TFLOP/s bf16, 394 TOP/s int8, 819 GB/s HBM.
Reference op-count source for the vocoder: BigVGAN generator loop,
/root/reference/modules/bigvgan.py:310-439; denoiser hot loop:
/root/reference/modules/diffsvcrepo_inference.py:234-240.
"""

import sys

PEAK_BF16 = 197e12
PEAK_INT8 = 394e12
HBM_BW = 819e9

# Achieved device times (ms) — integrated profile, round-4/5 close
# (BENCH_NOTES.md "integrated core profile" + int8 variant table).
ACHIEVED_MS = {
    "whisper_encoder": 10.7,
    "ddpm_scan_bf16": 264.1,       # 1000 steps
    "ddpm_scan_int8w1": 230.0 * 1000 / 1000,  # 230 us/step x 1000
    "ddpm_scan_int8": 194.0,
    "vocoder_stages": 31.5,
    "vocoder_glue": 4.7,           # impl/pad/patch fusions
}


def gflops(x):
    return x / 1e9


def whisper_encoder_flops(T_mel=3000, d=1024, n_layer=24, ffn_mult=4):
    """Whisper-medium AudioEncoder at [1, 80, T_mel]; T = T_mel // 2 after
    the stride-2 stem. Per layer: QKV+O projections 8*T*d^2, attention
    4*T^2*d, MLP 2*2*T*d*(ffn_mult*d)."""
    T = T_mel // 2
    stem = 2 * T_mel * 3 * 80 * d + 2 * T * 3 * d * d
    per_layer = 8 * T * d * d + 4 * T * T * d + 2 * 2 * T * d * ffn_mult * d
    return stem + n_layer * per_layer, T


def whisper_encoder_bytes(T_mel=3000, d=1024, n_layer=24, ffn_mult=4):
    """Weights once (bf16) + residual stream in/out per layer (bf16)."""
    T = T_mel // 2
    w = n_layer * (4 * d * d + 2 * d * ffn_mult * d) * 2
    acts = n_layer * 2 * T * d * 2
    return w + acts


def denoiser_step_flops(T=944, C=384, L=20):
    """Fused concat-tap step: per layer ONE [T,3C]@[3C,2C] dilated matmul
    (12*T*C^2) + wout [T,C]@[C,2C] (4*T*C^2). Conditioner projections are
    hoisted outside the scan (diffsvc_fast); gate/filter/res adds are VPU."""
    return L * (12 * T * C * C + 4 * T * C * C)


def denoiser_step_bytes(T=944, C=384, L=20, w_bytes=2):
    """The scan re-streams every layer's weights each step (activations are
    VMEM-resident): dilated [3C,2C] + wout [C,2C] per layer."""
    return L * (3 * C * 2 * C + C * 2 * C) * w_bytes


def vocoder_stage_flops(T_in, c_in, rate, up_k, res_kernels=(3, 7, 11)):
    """One BigVGAN stage: transposed upsample conv (2*T_in*up_k*c_in*c_out)
    + 3 ResBlock1s on c_out (per kernel k: 3 dilated + 3 plain convs,
    each 2*T_out*k*c^2) + 18 anti-aliased Snake sandwiches (up2x/down2x
    12-tap FIRs, 2*(2*T_out*12*c)*2 each)."""
    c_out = c_in // 2
    T_out = T_in * rate
    up = 2 * T_in * up_k * c_in * c_out
    res = sum(6 * 2 * T_out * k * c_out * c_out for k in res_kernels)
    act = 18 * 2 * (2 * T_out * 12 * c_out) * 2
    return up + res + act, T_out, c_out


def vocoder_stage_bytes(T_in, c_in, rate, res_kernels=(3, 7, 11)):
    """Fused stage kernel: stream input + output activations once (bf16),
    plus the stage's weights."""
    c_out = c_in // 2
    T_out = T_in * rate
    w = (8 * c_in * c_out + sum(6 * k * c_out * c_out for k in res_kernels)) * 2
    return (T_in * c_in + T_out * c_out) * 2 + w


def roof_ms(flops, bytes_, peak):
    return max(flops / peak, bytes_ / HBM_BW) * 1e3


def main():
    rows = []

    wf, _ = whisper_encoder_flops()
    wb = whisper_encoder_bytes()
    rows.append(("whisper-medium encoder", wf, wb, PEAK_BF16,
                 ACHIEVED_MS["whisper_encoder"]))

    df = denoiser_step_flops() * 1000
    db = denoiser_step_bytes() * 1000
    rows.append(("DDPM-1000 scan (bf16)", df, db, PEAK_BF16,
                 ACHIEVED_MS["ddpm_scan_bf16"]))
    # int8-w1: the 12*T*C^2 dilated matmul runs int8, wout stays bf16;
    # weights 1 byte for the quantized matmul
    df_w1 = denoiser_step_flops() * 1000
    db_w1 = (denoiser_step_bytes(w_bytes=1) * 12 / 16
             + denoiser_step_bytes(w_bytes=2) * 4 / 16) * 1000
    mix_peak = 1.0 / (0.75 / PEAK_INT8 + 0.25 / PEAK_BF16)
    rows.append(("DDPM-1000 scan (int8-w1)", df_w1, db_w1, mix_peak,
                 ACHIEVED_MS["ddpm_scan_int8w1"]))

    T, c = 944, 1536
    voc_f = voc_b = 0
    stage0 = 2 * T * 7 * 100 * c  # mel->1536 input conv (k=7)
    voc_f += stage0
    voc_b += (T * 100 + T * c) * 2 + 7 * 100 * c * 2
    for rate, up_k in zip((4, 4, 2, 2, 2, 2), (8, 8, 4, 4, 4, 4)):
        f, T2, c2 = vocoder_stage_flops(T, c, rate, up_k)
        voc_f += f
        voc_b += vocoder_stage_bytes(T, c, rate)
        T, c = T2, c2
    voc_f += 2 * T * 7 * c * 1  # output conv (k=7, ->1)
    rows.append(("BigVGAN stages (fused)", voc_f, voc_b, PEAK_BF16,
                 ACHIEVED_MS["vocoder_stages"] + ACHIEVED_MS["vocoder_glue"]))

    print(f"{'stage':<26} {'GFLOP':>8} {'GB':>6} {'roof ms':>8} "
          f"{'ach ms':>8} {'MFU%':>6} {'roof-bound':>10}")
    stats = {}
    for name, f, b, peak, ach in rows:
        r = roof_ms(f, b, peak)
        mfu = f / (ach / 1e3) / peak * 100
        bound = "memory" if b / HBM_BW > f / peak else "compute"
        stats[name] = (r, ach)
        print(f"{name:<26} {gflops(f):8.1f} {b/1e9:6.2f} {r:8.2f} "
              f"{ach:8.1f} {mfu:6.1f} {bound:>10}")
    # per-configuration core totals (whisper + one scan variant + vocoder)
    for variant in ("bf16", "int8-w1"):
        parts = ["whisper-medium encoder", f"DDPM-1000 scan ({variant})",
                 "BigVGAN stages (fused)"]
        r = sum(stats[p][0] for p in parts)
        a = sum(stats[p][1] for p in parts)
        print(f"{'TOTAL core (' + variant + ')':<26} {'':>8} {'':>6} {r:8.2f} "
              f"{a:8.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
