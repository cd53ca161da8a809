"""Fused text->mel->waveform inference pipeline.

One jitted XLA graph per (batch, text-bucket, mel-bucket): conditioning
network runs ONCE, the T<=4 consistency sampler drives only the bare
denoiser, and HiFi-GAN vocodes the padded mel — fixing the reference's
per-step cond-net re-execution and per-batch checkpoint reload
(SURVEY §3.2 inefficiencies).  Buckets keep shapes static so the timed
path never recompiles (BASELINE.md north-star: RTF <= 0.01 at T=1).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cmtts_tpu.cm.karras import KarrasSchedule
from cmtts_tpu.cm.sampling import default_ts, sample_mel
from cmtts_tpu.core.config import Config
from cmtts_tpu.core.masks import (
    DEFAULT_MEL_BUCKETS,
    DEFAULT_TEXT_BUCKETS,
    pad_to,
    pick_bucket,
)
from cmtts_tpu.models.cmtts import CMTTS
from cmtts_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator
from cmtts_tpu.train.loop import schedule_from_config


def warn_if_bucket_saturated(mel_lens: np.ndarray, mel_bucket: int) -> bool:
    """Predicted durations are clamped to the mel bucket (matching the
    reference's max_seq_len cap) — but in batch synthesis that silently
    clips audio, so say so.  Returns True when saturated."""
    sat = np.asarray(mel_lens) >= mel_bucket
    if sat.any():
        import warnings

        warnings.warn(
            f"{int(sat.sum())}/{sat.size} utterances saturated the mel "
            f"bucket ({mel_bucket} frames) — audio may be truncated; "
            "pass a larger mel_bucket= or raise model.max_seq_len")
        return True
    return False


class Synthesizer:
    """Bucket-compiled synthesis: call with host numpy token batches."""

    def __init__(
        self,
        cfg: Config,
        cm_params,
        vocoder_params=None,
        T: int = 1,
        sampler: str | None = None,
        sample_steps: int = 2,
        text_buckets: Sequence[int] = DEFAULT_TEXT_BUCKETS,
        mel_buckets: Sequence[int] = DEFAULT_MEL_BUCKETS,
        compute_dtype=jnp.bfloat16,
        mesh=None,
        vocoder_name: str = "HiFi-GAN",
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — batch inputs are
        sharded over its 'data' axis and params replicated, so one call
        serves a multi-chip slice (XLA partitions the whole fused graph;
        batch must divide the 'data' axis size).  A 2-D mesh with a
        'model' axis additionally Megatron-shards the denoiser blocks
        (``tp_shard_tree``) — tensor-parallel sampling for latency-bound
        single-sample synthesis, where batch sharding can't help."""
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            from cmtts_tpu.parallel.sharding import replicated, tp_shard_tree

            if "model" in mesh.axis_names:
                cm_params = tp_shard_tree(cm_params, mesh)
            else:
                cm_params = jax.device_put(cm_params, replicated(mesh))
            if vocoder_params is not None:
                vocoder_params = jax.device_put(vocoder_params,
                                                replicated(mesh))
        self.model = CMTTS(cfg)
        self.vocoder_name = vocoder_name
        # infer the generator width from the params so in-repo-trained
        # non-default-width generators (cli/train_hifigan.py
        # --upsample_initial_channel) load without a config override
        width = 512
        if (vocoder_params is not None
                and isinstance(vocoder_params, dict)
                and "conv_pre" in vocoder_params):
            width = int(vocoder_params["conv_pre"]["kernel"].shape[-1])
        self.hifigan = HiFiGANGenerator(HiFiGANConfig(
            num_mels=cfg.stft.n_mel_channels,
            sampling_rate=cfg.stft.sampling_rate,
            upsample_initial_channel=width))
        # Commit both param trees to device ONCE.  Checkpoint/npz loaders
        # (orbax restore, hifigan.unflatten_npz) hand back host numpy
        # leaves; passing those to a jitted call re-uploads every weight
        # on EVERY invocation (~50 MB of vocoder params per call through
        # the dev tunnel — a 30-40x RTF regression found in round 4).
        # Under a mesh the device_put above already placed them.
        if mesh is None:
            cm_params = jax.tree_util.tree_map(jnp.asarray, cm_params)
            if vocoder_params is not None:
                vocoder_params = jax.tree_util.tree_map(jnp.asarray,
                                                        vocoder_params)
        self.cm_params = cm_params
        self.vocoder_params = vocoder_params
        self.T = T
        if sampler is None:
            sampler = "onestep" if T == 1 else "multistep"
        self.sampler = sampler
        # grid size for the ODE samplers (heun/euler/dpm/ancestral) —
        # e.g. an edm diffusion teacher sampled with heun at ~18 levels
        self.sample_steps = sample_steps
        self.sched = schedule_from_config(cfg)
        self.text_buckets = tuple(text_buckets)
        self.mel_buckets = tuple(mel_buckets)
        self.compute_dtype = compute_dtype
        self._jitted = {}

    # -- jitted core -------------------------------------------------------
    def _build(self, t_mel: int, vocode: bool):
        sched = self.sched
        model = self.model
        hifigan = self.hifigan
        vocoder_name = self.vocoder_name
        sampler = self.sampler
        T = self.T
        steps = self.sample_steps
        cdt = self.compute_dtype

        @jax.jit
        def run(cm_params, voc_params, speakers, texts, src_lens, spker_embeds,
                rng, d_control, p_control, e_control):
            if cdt != jnp.float32:
                # bf16 compute for the two FLOP-heavy nets (denoiser +
                # vocoder); the conditioning net stays f32 — it is tiny
                # (phoneme-length) and its duration/pitch bucketing math
                # is precision-sensitive.  Casts are in-graph; sampler
                # math and outputs stay f32.
                cm_params = dict(cm_params)
                cm_params["denoiser"] = jax.tree_util.tree_map(
                    lambda x: x.astype(cdt), cm_params["denoiser"])
            cond_out = model.apply(
                {"params": cm_params},
                speakers=speakers, texts=texts, src_lens=src_lens,
                t_mel=t_mel, spker_embeds=spker_embeds,
                p_control=p_control, e_control=e_control, d_control=d_control,
                deterministic=True,
                method=CMTTS.condition)
            cond = cond_out["cond"]
            spk = cond_out["speaker_emb"]

            def denoise(x_t, sigma):
                c_skip, c_out, c_in = sched.active_scalings(sigma)
                out = model.apply(
                    {"params": cm_params},
                    (c_in[:, None, None] * x_t).astype(cdt),
                    sched.rescale_t(sigma),
                    cond, spk,
                    method=CMTTS.denoise).astype(jnp.float32)
                return c_out[:, None, None] * out + c_skip[:, None, None] * x_t

            B = texts.shape[0]
            shape = (B, t_mel, model.cfg.stft.n_mel_channels)
            mel = sample_mel(denoise, shape, rng, sched, sampler, T=T,
                             steps=steps,
                             ts=default_ts(T) if sampler == "multistep" else None)
            mel_lens = cond_out["mel_lens"]
            if vocode and vocoder_name in ("MelGAN", "melgan"):
                from cmtts_tpu.models.melgan import MelGANGenerator

                # reference feeds ln-mel / ln(10) = log10-mel to MelGAN
                # (utils/model.py:189)
                wav = MelGANGenerator().apply(
                    {"params": voc_params},
                    mel / jnp.log(10.0)).astype(jnp.float32)
            elif vocode:
                from cmtts_tpu.models.hifigan import hifigan_apply_fused

                interpret = jax.default_backend() == "cpu"
                # Pallas custom calls have no GSPMD partitioning rule:
                # on a >1-device mesh the vocoder runs the pure-XLA path
                # (partitioned cleanly); single-chip keeps the fused
                # VMEM-resident / weight-streaming kernels.
                multi = self.mesh is not None and self.mesh.devices.size > 1
                # the fused Pallas stages are tiled for the standard
                # 512-width generator; non-default widths (v2-style
                # small generators) run the pure-XLA path
                nonstd = hifigan.cfg.upsample_initial_channel != 512
                xla_only = multi or nonstd
                wav = hifigan_apply_fused(
                    voc_params, mel, hifigan.cfg,
                    mrf_pallas_max_c=0 if xla_only else None,
                    stream_stage0=False if xla_only else None,
                    interpret=interpret).astype(jnp.float32)
            else:
                wav = None
            return mel, mel_lens, wav

        return run

    def _get(self, t_mel: int, vocode: bool):
        key = (t_mel, vocode)
        if key not in self._jitted:
            self._jitted[key] = self._build(t_mel, vocode)
        return self._jitted[key]

    # -- host API ----------------------------------------------------------
    def __call__(
        self,
        token_seqs: Sequence[np.ndarray],
        speakers: np.ndarray | None = None,
        spker_embeds: np.ndarray | None = None,
        seed: int = 42,
        d_control: float = 1.0,
        p_control: float = 1.0,
        e_control: float = 1.0,
        mel_bucket: int | None = None,
    ):
        """Returns (mel (B,L,80) np, mel_lens np, wav np or None).

        Token sequences are bucket-padded host-side; the mel bucket is
        either given or estimated as 10 frames per phoneme — a deliberate
        headroom margin over the ~6-frame LJSpeech average so predicted
        durations rarely overflow the bucket (overflow truncates, matching
        the reference's max_seq_len clamp); clamp to max_seq_len.
        """
        B = len(token_seqs)
        max_txt = max(len(t) for t in token_seqs)
        t_txt = pick_bucket(max_txt, self.text_buckets)
        texts = np.stack([pad_to(np.asarray(t, np.int32), t_txt) for t in token_seqs])
        src_lens = np.asarray([len(t) for t in token_seqs], np.int32)
        if mel_bucket is None:
            est = min(int(max_txt * 10), self.cfg.model.max_seq_len)
            mel_bucket = pick_bucket(est, self.mel_buckets)
        if speakers is None:
            speakers = np.zeros(B, np.int32)
        if spker_embeds is None and self.cfg.model.multi_speaker \
                and self.cfg.model.speaker_embedder != "none":
            raise ValueError("spker_embeds required for external-embedder models")
        if spker_embeds is None:
            spker_embeds = np.zeros((B, self.cfg.model.external_speaker_dim),
                                    np.float32)

        vocode = self.vocoder_params is not None
        fn = self._get(mel_bucket, vocode)
        if self.mesh is not None:
            from cmtts_tpu.parallel.sharding import data_sharding

            ds = data_sharding(self.mesh)
            put = lambda x: jax.device_put(jnp.asarray(x), ds)  # noqa: E731
            speakers, texts, src_lens, spker_embeds = (
                put(speakers), put(texts), put(src_lens), put(spker_embeds))
        else:
            speakers = jnp.asarray(speakers)
            texts = jnp.asarray(texts)
            src_lens = jnp.asarray(src_lens)
            spker_embeds = jnp.asarray(spker_embeds)
        mel, mel_lens, wav = fn(
            self.cm_params, self.vocoder_params,
            speakers, texts, src_lens,
            spker_embeds, jax.random.PRNGKey(seed),
            d_control, p_control, e_control)
        mel_lens = np.asarray(mel_lens)
        warn_if_bucket_saturated(mel_lens, mel_bucket)
        return (np.asarray(mel), mel_lens,
                None if wav is None else np.asarray(wav))

    def trim_wavs(self, wav: np.ndarray, mel_lens: np.ndarray):
        """Per-sample waveform trim to mel_len * hop (reference
        utils/tools.py:594-607)."""
        hop = self.cfg.stft.hop_length
        return [w[: int(l) * hop] for w, l in zip(wav, mel_lens)]


def synthesize_long(
    synth: Synthesizer,
    token_chunks,
    speaker: int = 0,
    spker_embed: np.ndarray | None = None,
    gap_ms: float = 150.0,
    seed: int = 42,
    d_control: float = 1.0,
    p_control: float = 1.0,
    e_control: float = 1.0,
    pad_pow2: bool = False,
):
    """Long-form synthesis: run all pre-packed chunks (see
    ``cmtts_tpu.text.segment.chunk_text``) as ONE batched device call,
    then splice the trimmed per-chunk waveforms with ``gap_ms`` of
    silence. The reference has no long-form path — its length regulator
    silently truncates at max_seq_len (utils/tools.py:304).

    ``pad_pow2`` pads the batch to the next power of two by repeating
    the last chunk (padding rows are discarded) — for serving, where
    the set of compiled batch shapes must stay bounded.

    Returns ``(wav, mels, mel_lens)``: the spliced waveform (or None
    for a mel-only synthesizer) and the per-chunk trimmed mels.
    """
    if not token_chunks:
        raise ValueError("no token chunks to synthesize")
    B = len(token_chunks)
    token_chunks = list(token_chunks)
    if pad_pow2:
        b = 1
        while b < B:
            b *= 2
        token_chunks += [token_chunks[-1]] * (b - B)
    speakers = np.full(len(token_chunks), speaker, np.int32)
    embeds = (None if spker_embed is None
              else np.tile(np.asarray(spker_embed, np.float32)[None],
                           (len(token_chunks), 1)))
    mel, mel_lens, wav = synth(
        token_chunks, speakers=speakers, spker_embeds=embeds, seed=seed,
        d_control=d_control, p_control=p_control, e_control=e_control)
    mel_lens = mel_lens[:B]
    mels = [mel[i, : int(mel_lens[i])] for i in range(B)]
    if wav is None:
        return None, mels, mel_lens
    sr = synth.cfg.stft.sampling_rate
    gap = np.zeros(int(sr * gap_ms / 1000.0), np.float32)
    pieces = synth.trim_wavs(wav, mel_lens)
    out = []
    for i, p in enumerate(pieces):
        out.append(np.asarray(p, np.float32))
        if i < len(pieces) - 1:
            out.append(gap)
    return np.concatenate(out) if out else np.zeros(0, np.float32), \
        mels, mel_lens
