"""Oracle (per-row Python) vs vectorized parser parity — no Spark needed.

The sequential oracle re-expresses the reference's semantics verbatim
(engine/oracle.py); the vectorized parser is the engine's hot path.
Byte-equality here is the core extraction invariant.
"""

import pandas as pd
import pytest

from engine import fixtures, oracle
from engine.core import parser, spec


@pytest.fixture(scope="module")
def transcripts() -> pd.DataFrame:
    return fixtures.make_transcripts(n_convs=60, seed=42)


def test_fixture_determinism():
    a = fixtures.make_transcripts(n_convs=10, seed=42)
    b = fixtures.make_transcripts(n_convs=10, seed=42)
    pd.testing.assert_frame_equal(a, b)


def test_fixture_kind_coverage(transcripts):
    kinds = parser.detect_kinds(transcripts["text"].astype(object))
    present = set(kinds.unique())
    assert {spec.KIND_HTML, spec.KIND_MARKDOWN, spec.KIND_TOOL_JSON,
            spec.KIND_EMPTY} <= present


def test_kind_detection_parity(transcripts):
    texts = transcripts["text"].astype(object)
    vec = parser.detect_kinds(texts)
    seq = texts.map(oracle.detect_kind)
    mism = vec != seq
    assert not mism.any(), texts[mism].head(3).tolist()


def test_extraction_parity(transcripts):
    texts = transcripts["text"].astype(object)
    vec = parser.extract_markdown_series(texts)
    seq = texts.map(oracle.extract_markdown)
    mism = vec != seq
    if mism.any():
        i = mism.idxmax()
        raise AssertionError(
            f"first mismatch at {i}\nINPUT:\n{texts[i]!r}\n"
            f"VEC:\n{vec[i]!r}\nSEQ:\n{seq[i]!r}"
        )


def test_block_segmentation_parity(transcripts):
    texts = transcripts["text"].astype(object).reset_index(drop=True)
    md = parser.extract_markdown_series(texts)
    keys = pd.DataFrame({"rid": range(len(md))})
    vec = parser.segment_blocks_frame(md, keys)

    seq_rows = []
    for rid, m in enumerate(md):
        for bi, b in enumerate(oracle.segment_blocks(m)):
            seq_rows.append(
                (rid, bi, b["block_type"], b["level"], b["start"], b["end"],
                 b["text"])
            )
    seq = pd.DataFrame(
        seq_rows,
        columns=["rid", "block_idx", "block_type", "level", "start", "end",
                 "text"],
    )
    vec_cmp = vec[["rid", "block_idx", "block_type", "level", "start", "end",
                   "text"]].reset_index(drop=True)
    vec_cmp = vec_cmp.astype({"rid": "int64", "block_idx": "int64",
                              "level": "int64", "start": "int64",
                              "end": "int64"})
    seq = seq.astype(vec_cmp.dtypes.to_dict())
    pd.testing.assert_frame_equal(vec_cmp, seq)


def test_block_offsets_roundtrip(transcripts):
    """spans must index back into the markdown exactly."""
    texts = transcripts["text"].astype(object).reset_index(drop=True)
    md = parser.extract_markdown_series(texts)
    keys = pd.DataFrame({"rid": range(len(md))})
    blocks = parser.segment_blocks_frame(md, keys)
    for _, r in blocks.sample(min(200, len(blocks)), random_state=0).iterrows():
        assert md[r["rid"]][r["start"]:r["end"]] == r["text"]


def test_tool_json_golden():
    valid = '{"a": 1, "b": ["x", "y"]}'
    out = oracle.extract_tool_json(f"```json\n{valid}\n```")
    assert out == '```json\n{\n  "a": 1,\n  "b": [\n    "x",\n    "y"\n  ]\n}\n```'
    bad = "```json\n{nope\n```"
    out2 = oracle.extract_tool_json(bad)
    assert '"error": "Failed to parse tool JSON output"' in out2
    assert '"raw_output": "{nope"' in out2
    # vectorized agrees
    s = pd.Series([f"```json\n{valid}\n```", bad])
    assert list(parser.extract_tool_json_series(s)) == [out, out2]


def test_html_golden():
    html = (
        '<nav><a href="/">home</a></nav>'
        "<article><h1>Title</h1><p>Hello <b>world</b> &amp; friends.</p>"
        "<ul><li>one</li><li>two</li></ul>"
        "<table><tr><th>a</th><th>b</th></tr><tr><td>1</td><td>2</td></tr></table>"
        "</article><footer>bye</footer>"
    )
    want = (
        "# Title\n\nHello **world** & friends.\n\n- one\n- two\n\n"
        "| a | b |\n| --- | --- |\n| 1 | 2 |"
    )
    assert oracle.extract_html(html) == want
    assert parser.extract_html_series(pd.Series([html]))[0] == want


def test_p2_p3_reference_semantics():
    """P2 (OCR insert) then P3 (link rewrite), per mistralocr_app.py:657-684."""
    md = "# t\n\n![img-0-1.jpeg](img-0-1.jpeg)\n\npara"
    r = oracle.process_turn("conv a", 3, md)
    assert r.image_ids == ["img-0-1.jpeg"]
    # P3 path: stem sanitized, page = turn_idx+1, img ordinal 1-based
    assert "![img-0-1.jpeg](images_conv_a/page_4_img_1.png)" in r.markdown
    # P2 block present with ASCII colon and fenced pretty JSON
    assert "> \U0001F4C4 Image OCR Result:\n\n```json\n{\n  \"unstructured_ocr\"" in r.markdown


def test_duplicate_image_ids_unique_in_order():
    md = "![a](a)\n\nx\n\n![a](a)\n\n![b](b)"
    assert oracle.find_images(md) == ["a", "b"]
