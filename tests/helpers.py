"""Shared test fixtures: tiny configs and synthetic batches."""

import numpy as np

from cmtts_tpu.core.config import (
    CMConfig,
    Config,
    DataConfig,
    DenoiserConfig,
    EnergyConfig,
    LossConfig,
    ModelConfig,
    PitchConfig,
    StftConfig,
    TrainConfig,
    TransformerConfig,
    VarianceEmbeddingConfig,
    VariancePredictorConfig,
)


def tiny_config(
    multi_speaker: bool = False,
    pitch_type: str = "cwt",
    n_mels: int = 16,
    hidden: int = 16,
    **cm_kw,
) -> Config:
    return Config(
        data=DataConfig(),
        stft=StftConfig(n_mel_channels=n_mels),
        pitch=PitchConfig(pitch_type=pitch_type, use_uv=True),
        energy=EnergyConfig(energy_min=-1.0, energy_max=2.0),
        model=ModelConfig(
            transformer=TransformerConfig(
                encoder_layer=1, encoder_head=2, encoder_hidden=hidden,
                ffn_kernel_size=3, encoder_dropout=0.1),
            denoiser=DenoiserConfig(residual_layers=2, residual_channels=hidden),
            variance_predictor=VariancePredictorConfig(
                filter_size=hidden, predictor_layers=1, cwt_hidden_size=8,
                dur_predictor_layers=1),
            variance_embedding=VarianceEmbeddingConfig(
                pitch_n_bins=300, energy_n_bins=16),
            multi_speaker=multi_speaker,
            n_speakers=4,
            external_speaker_dim=8,
            speaker_embedder="none",
            max_seq_len=64,
        ),
        train=TrainConfig(
            batch_size=2,
            loss=LossConfig(),
            cm=CMConfig(start_scales=3, **cm_kw),
        ),
    )


def tiny_batch(B=2, T_txt=8, T_mel=24, n_mels=16, seed=0):
    rng = np.random.RandomState(seed)
    texts = rng.randint(1, 300, size=(B, T_txt)).astype(np.int32)
    src_lens = np.array([T_txt, T_txt - 2], dtype=np.int32)
    texts[1, -2:] = 0
    d_targets = np.zeros((B, T_txt), dtype=np.int32)
    for b in range(B):
        L = src_lens[b]
        base = T_mel // L
        d_targets[b, :L] = base
        d_targets[b, L - 1] += T_mel - base * L
    mel2ph = np.zeros((B, T_mel), dtype=np.int32)
    for b in range(B):
        pos = 0
        for i in range(T_txt):
            for _ in range(d_targets[b, i]):
                if pos < T_mel:
                    mel2ph[b, pos] = i + 1
                    pos += 1
    mels = rng.randn(B, T_mel, n_mels).astype(np.float32)
    mel_lens = np.array([T_mel, T_mel], dtype=np.int32)
    batch = {
        "speakers": np.zeros(B, dtype=np.int32),
        "texts": texts,
        "src_lens": src_lens,
        "mels": mels,
        "mel_lens": mel_lens,
        "mel2ph": mel2ph,
        "d_targets": d_targets,
        "e_targets": rng.rand(B, T_txt).astype(np.float32),
        "p_targets": {
            "pitch": rng.randint(1, 255, (B, T_mel)).astype(np.int32),
            "f0": rng.rand(B, T_mel).astype(np.float32) * 2,
            "uv": (rng.rand(B, T_mel) > 0.7).astype(np.float32),
            "cwt_spec": rng.randn(B, T_mel, 10).astype(np.float32),
            "f0_mean": (5 + rng.rand(B)).astype(np.float32),
            "f0_std": (0.5 + rng.rand(B)).astype(np.float32),
        },
        "spker_embeds": None,
    }
    return batch
