"""End-to-end singing voice conversion: wav in → converted wav out.

The functional equivalent of the reference driver (/root/reference/
infer.py:26-91), as a reusable API instead of a hard-coded script:

    pipe = SVCPipeline.from_config(cfg)          # or random_weights=True
    wav  = pipe.convert("clip.wav", "svcc_CDF1")

Stages (infer.py order preserved):
  load+resample → mel/energy → F0 (+ median shift to target singer) →
  Whisper PPG → condition encoder → DDPM/PLMS mel sampling →
  per-channel denormalisation → BigVGAN → trim + fade-out.

TPU design:
* everything from the condition encoder to the vocoder output is ONE
  jit-compiled function per padded length bucket — the reference crosses
  host↔device at pack_data, denormalize_mel_channel and the final .cpu()
  (infer.py:74-86); here intermediate tensors never leave the device,
* frame counts are padded to a bucket multiple so repeated calls with
  similar lengths reuse the compiled executable (XLA static shapes),
* models are loaded once and cached (the reference reloads Whisper-medium
  on every call, utils/whisper.py:96-99),
* batch conversion shards over a ``jax.sharding.Mesh`` data axis.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from svc_inference_pipeline_tpu.config import HParams
from svc_inference_pipeline_tpu.models.bigvgan import BigVGANGenerator, vocoder_output_finalize
from svc_inference_pipeline_tpu.models.diffsvc import DiffSVCDenoiser
from svc_inference_pipeline_tpu.models.encoder import ConditionEncoder
from svc_inference_pipeline_tpu.ops.f0 import get_f0_features
from svc_inference_pipeline_tpu.ops.mel import extract_mel_features
from svc_inference_pipeline_tpu.pipeline.content import WhisperPPGExtractor
from svc_inference_pipeline_tpu.sampling.ddpm import ddpm_sample
from svc_inference_pipeline_tpu.sampling.plms import plms_sample
from svc_inference_pipeline_tpu.sampling.schedule import DiffusionSchedule
from svc_inference_pipeline_tpu.utils.artifacts import (
    load_mel_min_max,
    pitch_shift,
)
from svc_inference_pipeline_tpu.utils.audio_io import load_audio, save_audio
from svc_inference_pipeline_tpu.utils.registry import get_singer_id

DEFAULT_BUCKET = 64  # frame-count padding granularity (recompile bucket)


def pad_to_bucket(n: int, bucket: int = DEFAULT_BUCKET) -> int:
    return ((n + bucket - 1) // bucket) * bucket


class SVCPipeline:
    """Holds converted params + compiled stage functions."""

    def __init__(
        self,
        cfg: HParams,
        cond_params,
        denoiser_params,
        vocoder_params,
        whisper: WhisperPPGExtractor,
        mesh=None,
        bucket: int = DEFAULT_BUCKET,
    ):
        self.cfg = cfg
        self.bucket = bucket
        model_axis = cfg.parallel.get("model_axis", "model") if "parallel" in cfg else "model"
        par = cfg.parallel if "parallel" in cfg else None
        # pipeline parallelism: cfg.parallel.pipeline_stages > 1 splits the
        # denoiser's residual stack into S GPipe stages over a `pipe` mesh
        # axis (parallel/pp.py); every reverse step sweeps the stages
        self._pp_stages = int(par.get("pipeline_stages", 1)) if par is not None else 1
        self._pp_axis = par.get("pipe_axis", "pipe") if par is not None else "pipe"
        self._pp_microbatch = int(par.get("pp_microbatch", 0)) if par is not None else 0
        # sequence parallelism: cfg.parallel.sequence_parallel shards the
        # whisper encoder over TIME on the model axis (parallel/sp_whisper.py)
        self._sp = bool(par.get("sequence_parallel", False)) if par is not None else False
        if self._pp_stages > 1:
            if cfg.mapper.residual_layer_num % self._pp_stages:
                raise ValueError(
                    f"pipeline_stages={self._pp_stages} must divide "
                    f"residual_layer_num={cfg.mapper.residual_layer_num}"
                )
            if mesh is None:
                if len(jax.devices()) < self._pp_stages:
                    raise ValueError(
                        f"pipeline_stages={self._pp_stages} needs at least "
                        f"that many devices; found {len(jax.devices())}"
                    )
                from jax.sharding import Mesh

                mesh = Mesh(
                    np.asarray(jax.devices()[: self._pp_stages]),
                    axis_names=(self._pp_axis,),
                )
            elif (
                self._pp_axis not in mesh.axis_names
                or dict(mesh.shape)[self._pp_axis] != self._pp_stages
            ):
                raise ValueError(
                    f"pipeline_stages={self._pp_stages} needs a "
                    f"'{self._pp_axis}' mesh axis of that size; got {mesh}"
                )
        if self._sp:
            sp_size = dict(mesh.shape).get(model_axis, 1) if mesh is not None else 1
            if sp_size < 2:
                raise ValueError(
                    f"sequence_parallel needs a mesh with a >1 '{model_axis}' axis"
                )
            if whisper.dims.n_audio_ctx % sp_size:
                raise ValueError(
                    f"whisper n_audio_ctx={whisper.dims.n_audio_ctx} must "
                    f"divide by the {sp_size}-way sequence shard"
                )
            whisper.ensure_unstacked()  # SP needs the per-block param layout
        self.mesh = mesh
        # tensor parallelism: with a model axis > 1 every model's params are
        # sharded with the TP rules (parallel/sharding.py) and GSPMD inserts
        # the ICI collectives through the whole inference computation
        self.tp = mesh is not None and dict(mesh.shape).get(model_axis, 1) > 1
        compute_dtype_name = cfg.get("compute_dtype", "bfloat16")
        # denoiser weights are re-streamed from HBM on EVERY one of the 1000
        # scan steps — storing them in the compute dtype halves that traffic
        # (checkpoints keep the f32 master copy)
        if compute_dtype_name == "bfloat16":
            # cast host-side when the leaf is host memory: an eager
            # jnp.asarray under the axon backend uploads the f32 master
            # over the TPU tunnel and casts remotely — twice the transfer
            # bytes of shipping bf16 (numpy RNE cast ≡ XLA convert)
            def _cast_bf16(x):
                if isinstance(x, np.ndarray):
                    return x.astype(jnp.dtype(jnp.bfloat16))
                return jnp.asarray(x, dtype=jnp.bfloat16)

            denoiser_params = jax.tree_util.tree_map(_cast_bf16, denoiser_params)
            # vocoder conv kernels are cast to bf16 per use inside the
            # modules/kernels anyway — storing them bf16 is bit-identical
            # and halves their HBM streaming (profile: ~30 ms of f32 weight
            # slice-starts for the composed stages). 1-D leaves (biases,
            # snake α/β — the latter feed exp in f32) keep the f32 master.
            vocoder_params = jax.tree_util.tree_map(
                lambda x: _cast_bf16(x) if getattr(x, "ndim", 0) >= 2 else x,
                vocoder_params,
            )
        # fused Pallas Activation1d/stage kernels on real TPU; XLA
        # composition elsewhere. Under TP the kernels stay on: the vocoder
        # runs overlap-save time-chunked over the model axis with its
        # params replicated (parallel/tp_vocoder.py) — channel-sharding
        # can't drive a Pallas custom call and would pay per-conv
        # collectives besides.
        use_pallas = cfg.get("use_pallas_vocoder", jax.default_backend() == "tpu")
        # fused whole-step denoiser kernel (ops/pallas/denoiser_step.py):
        # 262 vs 282 us/step profiled against the XLA fast path at the
        # production shape (BENCH_NOTES round 3) — ~20 ms per DDPM-1000
        # conversion. Not under TP: the denoiser params are channel-sharded
        # and GSPMD can't split a Pallas custom call. Under a data-only
        # mesh the kernel stays live via shard_map over the data axis
        # (each shard runs the full sampler on its local clips —
        # _sample_dp_pallas); batches not divisible by the data size fall
        # back to the XLA fast path, which GSPMD shards cleanly.
        kernel_shapes_ok = bool(
            cfg.get("use_pallas_denoiser", jax.default_backend() == "tpu")
            and cfg.mapper.residual_kernel_size == 3
            and cfg.mapper.residual_channels % 128 == 0
        )
        self._use_pallas_denoiser = kernel_shapes_ok and self.mesh is None
        # opt-in int8 denoiser: the two hot per-layer matmuls run on the
        # int8 MXU at 2x the bf16 rate (per-output-channel weight scales,
        # dynamic activation scale). Accuracy trade measured in
        # tests/test_int8_denoiser.py + perf_int8.py. Kernel-only — the
        # XLA fast-path fallback (non-divisible DP batches) runs at the
        # compute dtype instead, i.e. degrades UP in precision.
        self._denoiser_quantize = cfg.get("denoiser_quantize", None)
        if self._denoiser_quantize not in (None, "int8", "int8-w1"):
            raise ValueError(
                f"denoiser_quantize={self._denoiser_quantize!r}: use 'int8', "
                "'int8-w1' (output projection stays at compute dtype) or unset"
            )
        # DDPM-only: run the LAST K reverse steps at the compute dtype —
        # the int8 error is weight rounding that the late steps repair
        # (perf_int8_iso.py), so a short tail buys accuracy at ~K/steps
        # of the bf16 cost
        self._denoiser_quantize_tail = int(cfg.get("denoiser_quantize_tail", 0))
        if self._denoiser_quantize and not kernel_shapes_ok:
            raise ValueError(
                "denoiser_quantize requires the fused Pallas denoiser "
                "(use_pallas_denoiser, kernel_size=3, channels % 128 == 0)"
            )
        self._data_axis = (
            cfg.parallel.get("data_axis", "data") if "parallel" in cfg else "data"
        )
        self._dp_size = (
            dict(mesh.shape).get(self._data_axis, 1) if mesh is not None else 0
        )
        self._dp_pallas_denoiser = bool(
            kernel_shapes_ok and mesh is not None and not self.tp and self._dp_size > 1
        )
        if self._denoiser_quantize and not (
            self._use_pallas_denoiser or self._dp_pallas_denoiser
        ):
            # TP meshes and pipeline_stages>1 route the denoiser through the
            # XLA/GPipe paths, which run at the compute dtype — quantization
            # would be silently ignored and the user would benchmark/serve
            # full precision believing it is int8
            raise ValueError(
                "denoiser_quantize is set but the selected denoiser path "
                "cannot honor it: TP (model-axis) meshes and "
                "pipeline_stages>1 use the XLA/GPipe denoisers. Unset "
                "denoiser_quantize, or run single-device / data-only-mesh."
            )
        if self.tp:
            from svc_inference_pipeline_tpu.parallel.sharding import (
                MAPPER_TP_RULES,
                VOCODER_TP_RULES,
                WHISPER_TP_RULES,
                shard_params,
            )
            from jax.sharding import NamedSharding, PartitionSpec

            self.cond_params = shard_params(cond_params, mesh, MAPPER_TP_RULES)
            self.denoiser_params = shard_params(denoiser_params, mesh, MAPPER_TP_RULES)
            if use_pallas:
                self.vocoder_params = jax.device_put(
                    vocoder_params, NamedSharding(mesh, PartitionSpec())
                )
            else:
                self.vocoder_params = shard_params(vocoder_params, mesh, VOCODER_TP_RULES)
            if not self._sp:
                # SP replicates whisper params (time-sharded activations
                # instead of channel/head-sharded weights)
                whisper.shard(mesh, WHISPER_TP_RULES)
        else:
            # pin params on device once — passing host (numpy) pytrees into
            # jit re-uploads every weight on every call (≈1.2 GB/conversion
            # at full scale over the TPU tunnel)
            self.cond_params = jax.device_put(cond_params)
            self.denoiser_params = jax.device_put(denoiser_params)
            self.vocoder_params = jax.device_put(vocoder_params)
        self.whisper = whisper

        compute_dtype = jnp.bfloat16 if cfg.get("compute_dtype", "bfloat16") == "bfloat16" else jnp.float32
        self._model_axis = model_axis
        if self.tp and use_pallas:
            from svc_inference_pipeline_tpu.parallel.tp_vocoder import (
                vocoder_receptive_radius,
            )

            self._voc_chunks = dict(mesh.shape)[model_axis]
            # analytic bound is ~3× the measured structural radius (~21
            # frames for the production config) — override to trim the
            # overlap redundancy after validating on your config
            self._voc_halo = int(
                cfg.vocoder.get("tp_halo_frames", vocoder_receptive_radius(cfg.vocoder))
            )
        else:
            self._voc_chunks = 1
            self._voc_halo = 0
        self.cond_encoder = ConditionEncoder(cfg.mapper)
        self.denoiser = DiffSVCDenoiser(cfg.mapper, compute_dtype=compute_dtype)
        self.vocoder = BigVGANGenerator(
            cfg.vocoder, compute_dtype=compute_dtype, use_pallas=use_pallas
        )
        self.schedule = DiffusionSchedule.from_config(cfg.mapper)

        mel_min, mel_max = load_mel_min_max(cfg.min_mel_file, cfg.max_mel_file)
        self._mel_min = jnp.asarray(mel_min)
        self._mel_max = jnp.asarray(mel_max)

        self.sampler = cfg.mapper.get("sampler", "ddpm")
        self.plms_speedup = int(cfg.mapper.get("plms_speedup", 10))

        # ONE jit wrapper; the sampler choice is a static argument, not a
        # trace-time self attribute: jax's trace cache compares equal bound
        # methods as the same function, so per-sampler jax.jit wrappers
        # silently shared traces (the first sampler won — caught by test)
        self._core = jax.jit(
            self._convert_core,
            static_argnames=("n_frames", "pcm16", "sampler", "speedup"),
        )

    # ------------------------------------------------------------------
    # Builders
    # ------------------------------------------------------------------

    @classmethod
    def from_config(
        cls,
        cfg: HParams,
        random_weights: bool = False,
        whisper_size: str = "tiny",
        seed: int = 0,
        mesh=None,
        bucket: int = DEFAULT_BUCKET,
    ) -> "SVCPipeline":
        """Build from config: converts torch checkpoints when present;
        ``random_weights=True`` initialises every model randomly (the
        reference repo ships no checkpoints) for smoke/perf runs."""
        import os

        key = jax.random.PRNGKey(seed)

        # the whisper extractor must honour cfg.compute_dtype too — its
        # constructor default (bf16) would otherwise silently override an
        # f32 config (parity tests set f32 to make path-equivalence exact)
        whisper_dtype = (
            jnp.bfloat16
            if cfg.get("compute_dtype", "bfloat16") == "bfloat16"
            else jnp.float32
        )

        whisper_ref = cfg.whisper_model
        if not random_weights and not os.path.exists(str(whisper_ref)):
            from svc_inference_pipeline_tpu.checkpoints.fetch import (
                WHISPER_URLS,
                fetch_whisper_checkpoint,
            )

            if str(whisper_ref) in WHISPER_URLS:
                # registry name ("medium", …): resolve through the cached-
                # download registry (reference __init__.py:33-64). When
                # downloads are disabled and nothing is cached, a
                # production pipeline RAISES — converted audio from random
                # whisper weights is garbage and must not look like a
                # model bug. Smoke runs can opt into the fallback with
                # cfg.allow_random_whisper or SVC_ALLOW_RANDOM_WHISPER=1
                # (the random init then uses the CONFIGURED size so
                # downstream dims match, not the whisper_size argument).
                try:
                    whisper_ref = fetch_whisper_checkpoint(whisper_ref)
                except FileNotFoundError as e:
                    allow = bool(cfg.get("allow_random_whisper", False)) or (
                        os.environ.get("SVC_ALLOW_RANDOM_WHISPER", "") == "1"
                    )
                    if not allow:
                        raise FileNotFoundError(
                            f"whisper checkpoint {whisper_ref!r} unavailable "
                            f"({e}); set SVC_ALLOW_DOWNLOAD=1 to fetch it, "
                            "point cfg.whisper_model at a local .pt, or opt "
                            "into random weights for smoke runs with "
                            "cfg.allow_random_whisper / "
                            "SVC_ALLOW_RANDOM_WHISPER=1"
                        ) from e
                    from svc_inference_pipeline_tpu.utils.observability import (
                        get_logger,
                    )

                    get_logger("svc_tpu.pipeline").warning(
                        "whisper checkpoint unavailable — falling back to "
                        "RANDOM weights at the configured size (%s)", e,
                    )
                    whisper_size = str(cfg.whisper_model)
        if not random_weights and os.path.exists(str(whisper_ref)):
            whisper = WhisperPPGExtractor.from_torch_checkpoint(
                whisper_ref, fs=cfg.fs, compute_dtype=whisper_dtype
            )
        else:
            whisper = WhisperPPGExtractor.random_init(
                whisper_size, fs=cfg.fs, compute_dtype=whisper_dtype
            )
            # a non-medium random whisper emits a different feature width —
            # adapt the content-encoder input dim (smoke mode only)
            width = whisper.dims.n_audio_state
            if cfg.mapper.input_content_dim["whisper"] != width:
                d = cfg.to_dict()
                d["mapper"]["input_content_dim"]["whisper"] = width
                cfg = HParams(**d)

        mcfg, vcfg = cfg.mapper, cfg.vocoder

        if not random_weights and os.path.exists(cfg.svc_model_path):
            from svc_inference_pipeline_tpu.checkpoints.torch_convert import load_mapper_params

            cond_params, den_params = load_mapper_params(cfg.svc_model_path, mcfg)
        else:
            from svc_inference_pipeline_tpu.utils.devices import fast_random_params

            k1, k2, key = jax.random.split(key, 3)
            t_feat = 16
            dummy = {
                "content_whisper": jnp.zeros((1, t_feat, mcfg.input_content_dim["whisper"])),
                "melody": jnp.zeros((1, t_feat)),
                "loudness": jnp.zeros((1, t_feat)),
                "singer": jnp.zeros((1, 1), jnp.int32),
            }
            cond_params = fast_random_params(
                lambda: ConditionEncoder(mcfg).init(k1, dummy), seed=seed
            )["params"]
            den_params = fast_random_params(
                lambda: DiffSVCDenoiser(mcfg).init(
                    k2,
                    jnp.zeros((1, t_feat, mcfg.n_mel)),
                    jnp.zeros((1, t_feat, mcfg.conditioner_size)),
                    jnp.zeros((1, 1), jnp.int32),
                ),
                seed=seed + 1,
            )["params"]

        if not random_weights and os.path.exists(cfg.vocoder_model_path):
            from svc_inference_pipeline_tpu.checkpoints.torch_convert import load_vocoder_params

            voc_params = load_vocoder_params(cfg.vocoder_model_path, vcfg)
        else:
            from svc_inference_pipeline_tpu.utils.devices import fast_random_params

            k3, key = jax.random.split(key)
            voc_params = fast_random_params(
                lambda: BigVGANGenerator(vcfg).init(
                    k3, jnp.zeros((1, 16, vcfg.input_dim))
                ),
                seed=seed + 2,
            )["params"]

        return cls(cfg, cond_params, den_params, voc_params, whisper, mesh=mesh, bucket=bucket)

    # ------------------------------------------------------------------
    # Compiled core: cond encode → sample → denorm → vocode
    # ------------------------------------------------------------------

    def _convert_core(
        self,
        cond_params,
        denoiser_params,
        vocoder_params,
        batch: Dict[str, jnp.ndarray],
        key: jax.Array,
        n_true: jnp.ndarray,  # [B] int32 — true frame count per row
        n_frames: int,
        pcm16: bool = False,
        *,
        sampler: str,
        speedup: int,
    ) -> jnp.ndarray:
        cond = self.cond_encoder.apply({"params": cond_params}, batch)

        # hoisted-conditioning denoiser: the conditioner projections and the
        # step-encoder table are computed once, not once per sampling step
        # (~20% of scan FLOPs in the naive formulation). On real TPU the
        # per-step forward additionally runs as ONE fused Pallas kernel
        # (VMEM-resident activations, concat-tap conv matmul).
        b = cond.shape[0]
        shape = (b, n_frames, self.cfg.mapper.n_mel)
        if self._dp_pallas_denoiser and b % self._dp_size == 0:
            # data-only mesh + fused kernel: GSPMD can't partition a
            # pallas_call, so shard_map over the data axis — each shard
            # builds the kernel denoise_fn on its local batch and runs the
            # full sampler (no cross-shard comms in the denoiser); keys
            # fold the shard index so noise stays independent per clip
            mel_norm = self._sample_dp_pallas(
                denoiser_params, cond, key, n_frames, sampler, speedup
            )
        elif self._pp_stages > 1:
            from svc_inference_pipeline_tpu.parallel.pp import make_pp_denoise_fn

            # GPipe: every reverse step's ε-prediction sweeps the S stages
            # (microbatches flow via ppermute; parallel/pp.py)
            denoise_fn = make_pp_denoise_fn(
                denoiser_params,
                cond,
                self.schedule.num_steps,
                self.cfg.mapper,
                self.mesh,
                axis=self._pp_axis,
                n_micro=self._pp_microbatch or None,
            )
            mel_norm = self._run_sampler(denoise_fn, cond, key, shape, sampler, speedup)
        else:
            extra = {}
            if self._use_pallas_denoiser:
                from svc_inference_pipeline_tpu.ops.pallas.denoiser_step import (
                    make_pallas_denoise_fn as make_denoise_fn,
                )

                extra = {
                    "quantize": self._denoiser_quantize,
                    "quantize_tail": self._denoiser_quantize_tail,
                }
            else:
                from svc_inference_pipeline_tpu.models.diffsvc_fast import (
                    make_fast_denoise_fn as make_denoise_fn,
                )

            denoise_fn = make_denoise_fn(
                denoiser_params,
                cond,
                self.schedule.num_steps,
                self.cfg.mapper,
                compute_dtype=self.denoiser.compute_dtype or jnp.float32,
                **extra,
            )
            mel_norm = self._run_sampler(denoise_fn, cond, key, shape, sampler, speedup)

        # per-channel denormalisation (acoustic_feature_extraction.py:83-97),
        # without the reference's device→numpy→device round-trip
        zero = 1e-12
        lo, hi = self._mel_min, self._mel_max
        mel = (mel_norm + 1.0) / 2.0 * (hi - lo + zero) + lo  # [B, T, M]

        if self._voc_chunks > 1:
            # TP: overlap-save time chunks over the model axis — keeps the
            # fused Pallas kernels live per device (parallel/tp_vocoder.py)
            from svc_inference_pipeline_tpu.parallel.tp_vocoder import (
                chunked_vocoder_apply,
            )

            wave = chunked_vocoder_apply(
                lambda m: self.vocoder.apply({"params": vocoder_params}, m),
                mel,
                n_chunks=self._voc_chunks,
                halo=self._voc_halo,
                hop=self.cfg.hop_length,
                mesh=self.mesh,
                axis=self._model_axis,
            )
        else:
            wave = self.vocoder.apply({"params": vocoder_params}, mel)  # [B, T*hop]
        # fade + trim at the TRUE length (masked — shapes stay padded), and
        # optionally peak-norm + PCM16 on device: the fetched bytes are then
        # exactly the WAV payload (halves the device→host transfer)
        return vocoder_output_finalize(
            wave[..., : n_frames * self.cfg.hop_length],
            n_true,
            self.cfg.hop_length,
            pcm16=pcm16,
        )

    # ------------------------------------------------------------------
    # Public API
    # ------------------------------------------------------------------

    def _run_sampler(self, denoise_fn, cond, key, shape, sampler, speedup):
        if sampler == "plms":
            return plms_sample(
                denoise_fn, cond, key, shape, self.schedule, speedup=speedup
            )
        if sampler == "ddim":
            from svc_inference_pipeline_tpu.sampling.ddim import ddim_sample

            return ddim_sample(
                denoise_fn, cond, key, shape, self.schedule, speedup=speedup
            )
        if sampler == "dpmpp":
            from svc_inference_pipeline_tpu.sampling.dpmpp import dpmpp_sample

            return dpmpp_sample(
                denoise_fn, cond, key, shape, self.schedule, speedup=speedup
            )
        # fused whole-step path: the Pallas denoiser runs the ancestral
        # update in its epilogue (same keys/draws → same samples as
        # ddpm_sample over the plain denoise_fn)
        fused = getattr(denoise_fn, "fused_ddpm", None)
        if fused is not None:
            return fused(key, shape, self.schedule)
        return ddpm_sample(denoise_fn, cond, key, shape, self.schedule)

    def _sample_dp_pallas(self, denoiser_params, cond, key, n_frames, sampler, speedup):
        """Sampler over a data-only mesh with the fused Pallas denoiser:
        shard_map over the data axis; each shard is exactly a single-device
        conversion of its local clips with key=fold_in(key, shard_index)."""
        import functools

        from jax.sharding import PartitionSpec as P

        try:  # jax >= 0.4.35 moved shard_map to the top level
            from jax import shard_map as _sm

            shard_map = functools.partial(_sm, check_vma=False)
        except ImportError:  # pragma: no cover
            from jax.experimental.shard_map import shard_map as _sm_old

            shard_map = functools.partial(_sm_old, check_rep=False)

        from svc_inference_pipeline_tpu.ops.pallas.denoiser_step import (
            make_pallas_denoise_fn,
        )

        data_axis = self._data_axis
        n_mel = self.cfg.mapper.n_mel

        def body(dn_params, cond_l):
            k = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
            fn = make_pallas_denoise_fn(
                dn_params,
                cond_l,
                self.schedule.num_steps,
                self.cfg.mapper,
                compute_dtype=self.denoiser.compute_dtype or jnp.float32,
                quantize=self._denoiser_quantize,
                quantize_tail=self._denoiser_quantize_tail,
            )
            return self._run_sampler(
                fn, cond_l, k, (cond_l.shape[0], n_frames, n_mel), sampler, speedup
            )

        return shard_map(
            body,
            mesh=self.mesh,
            in_specs=(P(), P(data_axis, None, None)),
            out_specs=P(data_axis, None, None),
        )(denoiser_params, cond)

    SAMPLERS = ("ddpm", "plms", "ddim", "dpmpp")

    def _resolve_sampler(self, sampler: Optional[str], speedup: Optional[int]):
        """Validated (sampler, speedup) with pipeline defaults; ddpm pins
        the stride (it ignores it — a varying value would only fork the
        static-arg executable cache with byte-identical graphs)."""
        sampler = sampler or self.sampler
        if sampler not in self.SAMPLERS:
            raise ValueError(f"unknown sampler {sampler!r} (choose from {self.SAMPLERS})")
        speedup = int(speedup) if speedup is not None else self.plms_speedup
        if speedup < 1:
            raise ValueError(f"speedup must be >= 1, got {speedup}")
        if sampler == "ddpm":
            speedup = 1
        return sampler, speedup

    def set_sampler(self, sampler: str, speedup: Optional[int] = None) -> None:
        """Switch the sampler ("ddpm" | "plms" | "ddim" | "dpmpp") at runtime.

        Pure attribute update: the sampler is a static argument of the one
        jitted core, so every (sampler, speedup) combination keeps its own
        compiled executable in the jit cache.
        """
        if sampler not in self.SAMPLERS:
            raise ValueError(f"unknown sampler {sampler!r} (choose from {self.SAMPLERS})")
        if speedup is not None and int(speedup) < 1:
            raise ValueError(f"speedup must be >= 1, got {speedup}")
        self.sampler = sampler
        if speedup is not None:
            self.plms_speedup = int(speedup)

    def _whisper_encode(self, whisper_params, wmel):
        """Encoder dispatch: plain apply, or time-sharded sequence-parallel
        attention (all-gathered KV over the model axis) when
        ``cfg.parallel.sequence_parallel`` is set."""
        if self._sp:
            from svc_inference_pipeline_tpu.parallel.sp_whisper import (
                encode_sequence_parallel,
            )

            return encode_sequence_parallel(
                whisper_params,
                self.whisper.dims,
                wmel,
                self.mesh,
                seq_axis=self._model_axis,
                compute_dtype=self.whisper.encoder.compute_dtype or jnp.float32,
            )
        return self.whisper.encoder.apply({"params": whisper_params}, wmel)

    def mel_frame_count(self, n_samples: int) -> int:
        """Frame count of the mel front-end, analytically (no device sync)."""
        cfg = self.cfg
        padded_len = n_samples + 2 * int((cfg.n_fft - cfg.hop_length) / 2)
        return 1 + (padded_len - cfg.n_fft) // cfg.hop_length

    @partial(jax.jit, static_argnames=("self", "n_windows", "n_frames", "padded"))
    def _frontend_device(self, whisper_params, audio24: jnp.ndarray,
                         n_windows: int, n_frames: int, padded: int):
        """Device half of the front-end as ONE jit: 24→16 kHz resample +
        mel energy + whisper log-mel + encoder (batched over 30 s windows
        for long audio) + 480→256 remap + bucket padding. The host half
        (F0) runs concurrently with this dispatch. ``whisper_params`` is an
        explicit argument — closing over it would bake ~300M weights into
        the executable as constants. Only the 24 kHz waveform is uploaded
        (the tunnel moves ~37 MB/s; every avoided transfer is ~30 ms)."""
        from svc_inference_pipeline_tpu.ops.remap import remap_features_device
        from svc_inference_pipeline_tpu.ops.resample import _resample_conv
        from svc_inference_pipeline_tpu.ops.whisper_mel import N_SAMPLES, log_mel_spectrogram

        if audio24.dtype == jnp.int16:
            # PCM16 upload path: halves the host→device transfer (the
            # tunnel moves ~90 MB/s; ~20 ms on a 10 s clip). Same scale as
            # load_audio's int16 normalisation.
            audio24 = audio24.astype(jnp.float32) * np.float32(1.0 / 32768.0)

        _, energy = extract_mel_features(audio24, self.cfg)

        audio16 = _resample_conv(audio24, self.cfg.fs, 16000, "kaiser_best")
        total = n_windows * N_SAMPLES
        audio16 = jnp.pad(audio16, (0, total - audio16.shape[-1]))
        windows = audio16.reshape(n_windows, N_SAMPLES)

        wmel = log_mel_spectrogram(windows)  # [W, 80, 3000]
        feats = self._whisper_encode(whisper_params, wmel)
        feats = feats.reshape(-1, feats.shape[-1])  # [W*1500, D]
        content = remap_features_device(feats.astype(jnp.float32), n_frames)

        energy = jnp.pad(energy[:n_frames], (0, padded - n_frames))
        content = jnp.pad(content, [(0, padded - n_frames), (0, 0)])
        return energy[None], content[None]

    @partial(jax.jit, static_argnames=("self", "n_windows", "padded"))
    def _frontend_device_batch(self, whisper_params, audios24: jnp.ndarray,
                               n_true: jnp.ndarray, n_windows: int, padded: int):
        """Batched device front-end: B clips → ONE whisper-encoder call.

        All clips are zero-padded to a rectangular [B, L] block on the host;
        whisper windows stack across clips into a single [B·W, 80, 3000]
        encode (the per-clip loop ran B separate encoder dispatches). True
        frame counts arrive as a dynamic [B] vector so one executable
        serves any batch of lengths ≤ the bucket; features beyond each
        clip's true length are masked to zero, matching the single-clip
        path (loudness for the ≤4 tail frames of shorter clips sees the
        batch zero-padding instead of that clip's reflect-pad — sub-bucket
        noise on the 256-bin loudness quantiser)."""
        from svc_inference_pipeline_tpu.ops.remap import remap_features_device
        from svc_inference_pipeline_tpu.ops.resample import _resample_conv
        from svc_inference_pipeline_tpu.ops.whisper_mel import N_SAMPLES, log_mel_spectrogram

        b = audios24.shape[0]
        _, energy = extract_mel_features(audios24, self.cfg)  # [B, T]

        audio16 = _resample_conv(audios24, self.cfg.fs, 16000, "kaiser_best")
        total = n_windows * N_SAMPLES
        audio16 = jnp.pad(audio16, [(0, 0), (0, total - audio16.shape[-1])])
        windows = audio16.reshape(b * n_windows, N_SAMPLES)

        wmel = log_mel_spectrogram(windows)  # [B·W, 80, 3000]
        feats = self._whisper_encode(whisper_params, wmel)
        feats = feats.reshape(b, -1, feats.shape[-1])  # [B, W·1500, D]
        content = jax.vmap(
            lambda f: remap_features_device(f.astype(jnp.float32), padded)
        )(feats)  # [B, padded, D]

        idx = jnp.arange(padded)[None, :]
        mask = idx < n_true[:, None]
        energy = jnp.where(mask, jnp.pad(
            energy[:, :padded], [(0, 0), (0, max(0, padded - energy.shape[-1]))]
        ), 0.0)
        content = jnp.where(mask[..., None], content, 0.0)
        return energy, content

    def extract_features_batch(
        self, wavs: Sequence[Union[str, np.ndarray]], singer_names: Sequence[str]
    ):
        """Batched front-end: (batch dict [B, padded, …], frame counts).

        One device dispatch for the whole batch (mel energy + whisper
        encode + remap), overlapped with the per-clip host F0 loop.
        """
        cfg = self.cfg
        from svc_inference_pipeline_tpu.ops.resample import _out_len
        from svc_inference_pipeline_tpu.ops.whisper_mel import N_SAMPLES

        audios = []
        for wav in wavs:
            if isinstance(wav, str):
                a, _ = load_audio(wav, cfg.fs)
            else:
                a = np.asarray(wav, dtype=np.float32)
            audios.append(np.asarray(a))

        frame_counts, window_counts = [], []
        for a in audios:
            len16 = _out_len(len(a), 2, 3)
            w = max(1, -(-len16 // N_SAMPLES))
            frame_counts.append(min(self.mel_frame_count(len(a)), w * 1500 * 15 // 8))
            window_counts.append(w)
        padded = pad_to_bucket(max(frame_counts), self.bucket)
        # enough windows that the remap's source span covers `padded`
        n_windows = max(max(window_counts), -(-(padded * 8 // 15 + 1) // 1500))

        l_max = max(len(a) for a in audios)
        block = np.zeros((len(audios), l_max), np.float32)
        for i, a in enumerate(audios):
            block[i, : len(a)] = a

        energy, content = self._frontend_device_batch(  # async dispatch
            self.whisper.params,
            jnp.asarray(block),
            jnp.asarray(frame_counts, jnp.int32),
            n_windows=n_windows,
            padded=padded,
        )

        # host F0 per clip runs while the device computes the whisper chain
        f0s = np.zeros((len(audios), padded), np.float32)
        for i, (a, n) in enumerate(zip(audios, frame_counts)):
            f0, _ = get_f0_features(a, n, cfg)
            f0 = pitch_shift(f0, cfg)
            f0s[i, :n] = f0[:n]

        singer_ids = np.concatenate(
            [get_singer_id(cfg, s) for s in singer_names]
        ).astype(np.int32)[:, None]
        batch = {
            "content_whisper": content,
            "melody": jnp.asarray(f0s),
            "loudness": energy,
            "singer": jnp.asarray(singer_ids),
        }
        return batch, frame_counts

    def extract_features(self, wav: Union[str, np.ndarray], singer_name: str,
                         upload_pcm16: bool = False,
                         pitch_factor: Optional[float] = None):
        """Front-end: (batch dict padded to bucket, true frame count).

        Device work (mel energy, whisper encode, remap) is dispatched first
        and runs while the host computes F0 — the two halves overlap.
        ``upload_pcm16`` quantises the waveform to int16 for the upload
        (half the host→device bytes; ~20 ms on a 10 s clip over the
        tunnel) — lossless when the source was 16-bit PCM, ≤ ±2⁻¹⁶
        otherwise; the host F0 path always sees the float signal.
        ``pitch_factor`` overrides the per-utterance median pitch shift
        with a fixed multiplier (the streaming path pins it from the first
        chunk so a long stream's target pitch doesn't wobble).
        """
        cfg = self.cfg
        if isinstance(wav, str):
            audio, _ = load_audio(wav, cfg.fs)
        else:
            audio = np.asarray(wav, dtype=np.float32)

        from svc_inference_pipeline_tpu.ops.resample import _out_len
        from svc_inference_pipeline_tpu.ops.whisper_mel import N_SAMPLES

        # the reference truncates content at 30 s (utils/whisper.py:52-56);
        # here long clips encode in batched 30 s whisper windows instead
        len16 = _out_len(len(audio), 2, 3)  # 24 kHz → 16 kHz length
        n_windows = max(1, -(-len16 // N_SAMPLES))

        mel_len = self.mel_frame_count(len(audio))
        n_frames = min(mel_len, n_windows * 1500 * 15 // 8)
        padded = pad_to_bucket(n_frames, self.bucket)

        # host F0 on a worker thread, started BEFORE the (blocking-ish)
        # audio upload: the F0 tracker runs on host CPU concurrently with
        # the upload AND the device-side whisper chain, so the device never
        # idles waiting for Python to finish pitch tracking
        from concurrent.futures import ThreadPoolExecutor

        def _f0_job():
            f0, _ = get_f0_features(audio, n_frames, cfg)
            if pitch_factor is not None:
                f0 = f0 * pitch_factor
            else:
                f0 = pitch_shift(f0, cfg)
            return np.pad(f0[:n_frames], (0, padded - n_frames)).astype(np.float32)

        with ThreadPoolExecutor(max_workers=1) as pool:
            f0_future = pool.submit(_f0_job)

            if upload_pcm16 and audio.dtype == np.float32:
                dev_audio = np.clip(
                    np.round(audio * 32768.0), -32768, 32767
                ).astype(np.int16)
            else:
                dev_audio = audio
            energy, content = self._frontend_device(  # async dispatch
                self.whisper.params,
                jnp.asarray(dev_audio),
                n_windows=n_windows,
                n_frames=n_frames,
                padded=padded,
            )
            f0 = f0_future.result()

        singer = get_singer_id(cfg, singer_name)
        batch = {
            "content_whisper": content,
            "melody": jnp.asarray(f0)[None],
            "loudness": energy,
            "singer": jnp.asarray(singer[None].astype(np.int32)),
        }
        return batch, n_frames

    def convert(
        self,
        wav: Union[str, np.ndarray],
        singer_name: str,
        key: Optional[jax.Array] = None,
        output_path: Optional[str] = None,
        pcm16: bool = False,
        upload_pcm16: bool = False,
        pitch_factor: Optional[float] = None,
        sampler: Optional[str] = None,
        speedup: Optional[int] = None,
    ) -> np.ndarray:
        """Convert one utterance to the target singer → waveform @ cfg.fs.

        ``pcm16=True`` finalises on device (peak-norm 0.9 + int16 — the
        exact WAV payload) and returns int16 samples; the device→host
        transfer halves versus float32. ``upload_pcm16=True`` halves the
        upload too (see :meth:`extract_features`). ``sampler``/``speedup``
        override the pipeline defaults for this call only.
        """
        sampler, speedup = self._resolve_sampler(sampler, speedup)
        key = key if key is not None else jax.random.PRNGKey(int(time.time_ns() % 2**31))
        batch, n_frames = self.extract_features(
            wav, singer_name, upload_pcm16=upload_pcm16, pitch_factor=pitch_factor
        )
        padded = batch["melody"].shape[1]

        wave = self._core(
            self.cond_params,
            self.denoiser_params,
            self.vocoder_params,
            {k: jnp.asarray(v) for k, v in batch.items()},
            key,
            jnp.asarray([n_frames], jnp.int32),
            n_frames=padded,
            pcm16=pcm16,
            sampler=sampler,
            speedup=speedup,
        )
        audio = np.asarray(wave)[0, : n_frames * self.cfg.hop_length].copy()

        if output_path is not None:
            save_audio(output_path, audio, self.cfg.fs, turn_up=not pcm16)
        return audio

    def convert_streaming(
        self,
        wav: Union[str, np.ndarray],
        singer_name: str,
        chunk_seconds: float = 10.0,
        context_seconds: float = 1.0,
        key: Optional[jax.Array] = None,
        upload_pcm16: bool = False,
        sampler: Optional[str] = None,
        speedup: Optional[int] = None,
    ):
        """Generator of converted chunks (pipeline/streaming.py): bounded
        time-to-first-audio and O(chunk) memory for arbitrarily long input;
        equal-power crossfades at seams; one compiled executable."""
        from svc_inference_pipeline_tpu.pipeline.streaming import stream_convert

        return stream_convert(
            self, wav, singer_name,
            chunk_seconds=chunk_seconds, context_seconds=context_seconds,
            key=key, upload_pcm16=upload_pcm16, sampler=sampler, speedup=speedup,
        )

    def convert_multi_singer(
        self,
        wav: Union[str, np.ndarray],
        singer_names: Sequence[str],
        key: Optional[jax.Array] = None,
    ) -> List[np.ndarray]:
        """One utterance → several target singers, sharing the front-end.

        Features are extracted ONCE; the batch tiles over singers (the
        reference would re-run the whole pipeline per singer).
        """
        key = key if key is not None else jax.random.PRNGKey(0)
        batch, n_frames = self.extract_features(wav, singer_names[0])
        ids = np.concatenate(
            [get_singer_id(self.cfg, s) for s in singer_names]
        ).astype(np.int32)[:, None]
        b = len(singer_names)
        tiled = {
            k: jnp.tile(v, (b,) + (1,) * (v.ndim - 1)) for k, v in batch.items()
        }
        tiled["singer"] = jnp.asarray(ids)

        padded = batch["melody"].shape[1]
        waves = np.asarray(
            self._core(
                self.cond_params, self.denoiser_params, self.vocoder_params,
                tiled, key, jnp.full((b,), n_frames, jnp.int32), n_frames=padded,
                sampler=self.sampler, speedup=self.plms_speedup,
            )
        )
        return [waves[i, : n_frames * self.cfg.hop_length].copy() for i in range(b)]

    def convert_batch(
        self,
        wavs: Sequence[Union[str, np.ndarray]],
        singer_names: Sequence[str],
        key: Optional[jax.Array] = None,
        sampler: Optional[str] = None,
        speedup: Optional[int] = None,
    ) -> List[np.ndarray]:
        """Batched multi-utterance / multi-singer conversion.

        All utterances are padded to one bucket and converted in a single
        device batch; with a mesh, the batch shards over the data axis.
        ``sampler``/``speedup`` override the pipeline defaults per call.
        """
        assert len(wavs) == len(singer_names)
        sampler, speedup = self._resolve_sampler(sampler, speedup)
        key = key if key is not None else jax.random.PRNGKey(0)

        merged, frame_counts = self.extract_features_batch(wavs, singer_names)
        padded = merged["melody"].shape[1]

        arrays = {k: jnp.asarray(v) for k, v in merged.items()}
        if self.mesh is not None and self._data_axis in self.mesh.axis_names:
            from jax.sharding import NamedSharding, PartitionSpec as P

            arrays = {
                k: jax.device_put(v, NamedSharding(self.mesh, P(self._data_axis, *([None] * (v.ndim - 1)))))
                for k, v in arrays.items()
            }

        waves = np.asarray(
            self._core(
                self.cond_params,
                self.denoiser_params,
                self.vocoder_params,
                arrays,
                key,
                jnp.asarray(frame_counts, jnp.int32),
                n_frames=padded,
                sampler=sampler,
                speedup=speedup,
            )
        )

        return [
            waves[i, : n * self.cfg.hop_length].copy()
            for i, n in enumerate(frame_counts)
        ]
