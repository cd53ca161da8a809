"""Long-form synthesis: sentence segmentation, chunk packing, and the
batched chunked-synthesis splice (cmtts_tpu.text.segment +
cmtts_tpu.pipeline.synthesize_long).

No reference counterpart: the reference's length regulator silently
truncates at max_seq_len (utils/tools.py:304); long-form is a
framework addition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmtts_tpu.text.segment import chunk_text, pack_chunks, sentences

from helpers import tiny_config


def test_sentences_basic():
    assert sentences("Hello world. How are you? Fine!") == [
        "Hello world.", "How are you?", "Fine!"]


def test_sentences_abbreviations_not_split():
    out = sentences("Dr. Smith arrived. He sat down.")
    assert out == ["Dr. Smith arrived.", "He sat down."]


def test_sentences_cjk_punctuation():
    out = sentences("你好。很高兴认识你！")
    assert out == ["你好。", "很高兴认识你！"]


def test_sentences_whitespace_only():
    assert sentences("   ") == []


def test_pack_chunks_merges_within_budget():
    toks = [np.arange(3), np.arange(4), np.arange(5)]
    chunks = pack_chunks(toks, budget=8, sep_token=99)
    # 3 + sep + 4 = 8 fits; 5 starts a new chunk
    assert len(chunks) == 2
    assert list(chunks[0]) == [0, 1, 2, 99, 0, 1, 2, 3]
    assert list(chunks[1]) == [0, 1, 2, 3, 4]


def test_pack_chunks_no_separator():
    chunks = pack_chunks([np.arange(2), np.arange(2)], budget=4)
    assert len(chunks) == 1 and len(chunks[0]) == 4


def test_pack_chunks_oversized_sentence_hard_split():
    chunks = pack_chunks([np.arange(10)], budget=4)
    assert [len(c) for c in chunks] == [4, 4, 2]
    assert list(np.concatenate(chunks)) == list(range(10))


def test_pack_chunks_skips_empty():
    chunks = pack_chunks([np.asarray([], np.int32), np.arange(2)], budget=4)
    assert len(chunks) == 1


def test_chunk_text_uses_tokenizer():
    tok = lambda s: np.arange(len(s.split()), dtype=np.int32)  # noqa: E731
    chunks = chunk_text("One two three. Four five.", tok, budget=10,
                        sep_token=7)
    assert len(chunks) == 1
    assert 7 in chunks[0]


@pytest.mark.slow
def test_synthesize_long_splices_chunks():
    from cmtts_tpu.models.cmtts import CMTTS
    from cmtts_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator
    from cmtts_tpu.pipeline import Synthesizer, synthesize_long

    cfg = tiny_config()
    model = CMTTS(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 16, 16)), jnp.zeros(1),
        speakers=jnp.zeros(1, jnp.int32), texts=jnp.ones((1, 8), jnp.int32),
        src_lens=jnp.asarray([8]), deterministic=True)
    voc_cfg = HiFiGANConfig(
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=8, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), num_mels=16)
    voc = HiFiGANGenerator(voc_cfg)
    voc_params = voc.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 8, 16)))["params"]
    synth = Synthesizer(cfg, variables["params"], voc_params, T=1,
                        text_buckets=(8,), mel_buckets=(32,))
    synth.hifigan = voc

    chunks = [np.arange(1, 7, dtype=np.int32),
              np.arange(1, 9, dtype=np.int32),
              np.arange(1, 5, dtype=np.int32)]
    gap_ms = 100.0
    wav, mels, mel_lens = synthesize_long(synth, chunks, gap_ms=gap_ms)
    sr = cfg.stft.sampling_rate
    hop = cfg.stft.hop_length
    # the tiny test vocoder upsamples 16x (not the config's 256 hop), so
    # each trimmed piece is min(mel_len*hop, bucket*16) samples
    piece = [min(int(l) * hop, 32 * 16) for l in mel_lens]
    g = int(sr * gap_ms / 1000.0)
    assert len(wav) == sum(piece) + 2 * g
    assert len(mels) == 3
    for m, l in zip(mels, mel_lens):
        assert m.shape == (int(l), 16)
    # the first gap region is exact silence
    assert np.all(wav[piece[0]: piece[0] + g] == 0)

    # mel-only synthesizer returns wav=None but the chunk mels
    synth_nv = Synthesizer(cfg, variables["params"], None, T=1,
                           text_buckets=(8,), mel_buckets=(32,))
    wav2, mels2, _ = synthesize_long(synth_nv, chunks[:2])
    assert wav2 is None and len(mels2) == 2

    with pytest.raises(ValueError, match="no token chunks"):
        synthesize_long(synth, [])
