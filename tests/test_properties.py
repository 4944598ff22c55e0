"""Property-based checks (hypothesis): the vectorized parser must agree
with the sequential oracle on arbitrary inputs, not just fixture-shaped
ones — and block spans must always index back into the markdown.
"""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from engine import oracle
from engine.core import parser

# payload-ish alphabet: markdown/HTML/JSON punctuation + text + unicode
_ALPHABET = st.sampled_from(
    list("abcXYZ 019\n\t#>|-!foo[]()`{}<\"'&;:=/.\\*_")
    + ["<p>", "</p>", "<li>", "```", "```json", "![x](x)", "&amp;", "中文",
       "<nav>", "</nav>", "<h2>", "</h2>", "\n\n", "\n\n\n", "  \n"]
)

payloads = st.lists(_ALPHABET, min_size=0, max_size=60).map("".join)


@settings(max_examples=150, deadline=None)
@given(st.lists(payloads, min_size=1, max_size=8))
def test_extraction_parity_random(texts):
    s = pd.Series(texts, dtype=object)
    vec = parser.extract_markdown_series(s)
    for i, t in enumerate(texts):
        assert vec[i] == oracle.extract_markdown(t), repr(t)


@settings(max_examples=100, deadline=None)
@given(st.lists(payloads, min_size=1, max_size=6))
def test_block_parity_and_offsets_random(texts):
    s = pd.Series(texts, dtype=object)
    md = parser.extract_markdown_series(s)
    keys = pd.DataFrame({"rid": range(len(md))})
    blocks = parser.segment_blocks_frame(md, keys)

    # parity with the oracle segmenter
    want = []
    for rid, m in enumerate(md):
        for bi, b in enumerate(oracle.segment_blocks(m)):
            want.append((rid, bi, b["block_type"], b["level"], b["start"],
                         b["end"], b["text"]))
    got = [
        (int(r.rid), int(r.block_idx), r.block_type, int(r.level),
         int(r.start), int(r.end), r.text)
        for r in blocks.itertuples(index=False)
    ]
    assert got == want

    # spans always index back exactly
    for rid, _bi, _bt, _lv, start, end, text in got:
        assert md[rid][start:end] == text


@settings(max_examples=150, deadline=None)
@given(payloads)
def test_kind_detection_total(text):
    k_vec = parser.detect_kinds(pd.Series([text], dtype=object))[0]
    assert k_vec == oracle.detect_kind(text)


@settings(max_examples=100, deadline=None)
@given(payloads)
def test_extraction_idempotent_on_markdown(text):
    """Extracting already-extracted markdown-kind output is a fixpoint
    (normalisation is idempotent)."""
    out = oracle.extract_markdown(text)
    if oracle.detect_kind(out) == "markdown":
        assert oracle.extract_markdown(out) == out


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_png_roundtrip_random(w, h, seed):
    """encode→decode is the identity on dims and pixel checksums for
    arbitrary sizes (every scanline filter mix, odd strides, 1×1)."""
    import zlib as _z

    from engine.spark import multimodal as mm

    rnd = (seed * 2654435761 + 12345) % (2**32)
    px = bytes((rnd >> (i % 24) & 0xFF) ^ (i * 37 % 256) for i in range(w * h))
    d = mm.decode_png(mm.encode_png_gray(w, h, px))
    assert (d["width"], d["height"]) == (w, h)
    assert d["pixel_sum"] == sum(px)
    assert d["pixel_crc32"] == _z.crc32(px) & 0xFFFFFFFF


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=8000, max_value=48000),
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=0,
        max_size=200,
    ),
)
def test_wav_roundtrip_random(rate, samples):
    """PCM-16 WAV encode→decode round-trip over arbitrary rates and
    sample values (incl. empty clips and int16 extremes)."""
    from engine.spark import multimodal as mm

    d = mm.decode_wav(mm.encode_wav_pcm16(rate, samples))
    assert d["sample_rate"] == rate
    assert d["n_channels"] == 1 and d["bits"] == 16
    assert d["n_samples"] == len(samples)
    assert d["sample_abs_sum"] == sum(abs(s) for s in samples)


def test_wav_rejects_garbage():
    from engine.spark import multimodal as mm
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mm.decode_wav(b"not a riff payload at all")
