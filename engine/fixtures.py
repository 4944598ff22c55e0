"""Deterministic synthetic transcripts generator (FIXTURES.md §1-2).

Produces the exact input shape mandated by BASELINE.json's input hint:

    transcripts(conv_id: string, turn_idx: int32, role: string,
                text: string, tool: string, ts: timestamp)

All choices derive from zlib.crc32 of stable keys (never Python's
salted ``hash``) + numpy RandomState(seed) — identical across runs,
processes and machines.  Payload kinds per FIXTURES.md §2:
pseudo-PDF page fragments (image placeholders in the reference grammar
``![img-k.jpeg](img-k.jpeg)``, /root/reference/mistralocr_app.py:76-82),
HTML fragments with strip-target boilerplate, plain text, tool-output
JSON (fence-strip semantics, mistralocr_app.py:386-390), and degenerate
cases (empty / whitespace / CJK / duplicate image ids / giant paragraph).
"""

from __future__ import annotations

import os
import zlib
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

SEED = 42

_WORDS = (
    "spark engine query plan shuffle partition arrow batch column row "
    "vector hash join scan filter group window sort merge broadcast skew "
    "salt lineage resume table snapshot turn page image markdown block"
).split()

_CJK = "數據處理引擎分區混洗向量化批次列式雜湊連接掃描過濾視窗排序合併廣播傾斜"

_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _crc(*parts) -> int:
    return zlib.crc32("|".join(str(p) for p in parts).encode("utf-8"))


def _words(key: int, n: int) -> str:
    return " ".join(_WORDS[(key + 7 * i) % len(_WORDS)] for i in range(n))


def _sentence(key: int, n: int = 8) -> str:
    w = _words(key, n)
    return w[0].upper() + w[1:] + "."


# ------------------------------------------------------------------ payloads
def _pdf_page(conv: str, turn: int) -> str:
    """Markdown-ish pseudo-PDF page with 0-3 image placeholders."""
    k = _crc("pdf", conv, turn)
    parts = [f"{'#' * (1 + k % 3)} {_sentence(k, 5)[:-1]}"]
    n_imgs = k % 4
    dup = k % 17 == 0 and n_imgs >= 2  # duplicate image id degenerate case
    for j in range(2 + k % 3):
        kk = _crc("blk", conv, turn, j)
        which = kk % 5
        if which == 0:
            parts.append("\n".join(f"- {_sentence(_crc(kk, i), 4)}" for i in range(3)))
        elif which == 1:
            parts.append(
                "| col_a | col_b |\n| --- | --- |\n"
                f"| {_words(kk, 2)} | {kk % 1000} |\n"
                f"| {_words(kk + 1, 2)} | {(kk >> 3) % 1000} |"
            )
        elif which == 2:
            parts.append(f"```\n{_words(kk, 6)}\n{_words(kk + 3, 6)}\n```")
        else:
            parts.append(_sentence(kk, 12))
        if j < n_imgs:
            img_i = 1 if (dup and j == 1) else j + 1
            img_id = f"img-{turn}-{img_i}.jpeg"
            parts.append(f"![{img_id}]({img_id})")
    return "\n\n".join(parts)


def _html_fragment(conv: str, turn: int) -> str:
    k = _crc("html", conv, turn)
    nav = "".join(f'<li><a href="/p{i}">link {i}</a></li>' for i in range(4))
    rows = "".join(
        f"<tr><td>{_words(_crc(k, r), 2)}</td><td>{(k + r) % 500}</td></tr>"
        for r in range(2)
    )
    lis = "".join(f"<li>{_sentence(_crc(k, 9, i), 4)}</li>" for i in range(3))
    return (
        "<html><body>"
        f"<nav><ul>{nav}</ul></nav>"
        f'<header><h1>Site Header {k % 100}</h1></header>'
        '<div class="cookie-banner">We use cookies. <a href="/consent">OK</a></div>'
        "<article>"
        f"<h1>{_sentence(k, 4)[:-1]}</h1>"
        f"<p>{_sentence(k + 1, 14)} It uses <b>{_words(k + 2, 1)}</b> and "
        f"<code>{_words(k + 3, 1)}</code> with <a href=\"https://example.com/{k % 50}\">a link</a>.</p>"
        f"<h2>{_sentence(k + 4, 3)[:-1]}</h2>"
        f"<ul>{lis}</ul>"
        f"<table><tr><th>name</th><th>value</th></tr>{rows}</table>"
        f"<pre><code>{_words(k + 5, 5)}</code></pre>"
        f"<blockquote>{_sentence(k + 6, 6)}</blockquote>"
        "</article>"
        '<div class="linkfarm">' + "".join(f'<a href="/x{i}">x{i}</a>' for i in range(6)) + "</div>"
        f"<footer><p>Copyright {2020 + k % 6}</p></footer>"
        "<script>var t = 1;</script>"
        "</body></html>"
    )


def _plain_text(conv: str, turn: int) -> str:
    k = _crc("txt", conv, turn)
    paras = [_sentence(_crc(k, i), 10 + (k + i) % 8) for i in range(1 + k % 3)]
    if k % 11 == 0:
        paras.append(_CJK[: 8 + k % 20])
    return "\n\n".join(paras)


def _tool_json(conv: str, turn: int) -> str:
    k = _crc("json", conv, turn)
    body = (
        f'{{"status": "ok", "items": [{k % 100}, {(k >> 2) % 100}], '
        f'"query": "{_words(k, 3)}", "nested": {{"score": {k % 1000}}}}}'
    )
    if k % 3 == 0:
        return f"```json\n{body}\n```"
    if k % 7 == 0:  # invalid JSON → validate-or-wrap path
        return "```json\n{not valid json " + str(k % 100) + "\n```"
    return body


def _degenerate(conv: str, turn: int) -> str:
    k = _crc("degen", conv, turn)
    which = k % 4
    if which == 0:
        return ""
    if which == 1:
        return "   \n\t \n  "
    if which == 2:
        return _CJK * (1 + k % 3)
    return _sentence(k, 200)  # long single paragraph


_PAYLOAD_FNS = [_pdf_page, _html_fragment, _plain_text, _tool_json, _degenerate]
# weights: pdf 30%, html 30%, plain 20%, json 15%, degenerate 5%
_PAYLOAD_PICK = [0] * 6 + [1] * 6 + [2] * 4 + [3] * 3 + [4] * 1


def make_transcripts(
    n_convs: int = 50,
    seed: int = SEED,
    skew_giant: bool = True,
) -> pd.DataFrame:
    """Deterministic transcripts table. ~1% of conversations are
    'skewed long' (100-1000 turns) to exercise salting (FIXTURES.md §1)."""
    rng = np.random.RandomState(seed)
    conv_ids = [f"conv-{i:08d}" for i in range(n_convs)]
    # turn counts: Zipf-ish 2-40, ~1% long 100-1000
    n_turns = 2 + (rng.zipf(1.6, size=n_convs) % 39)
    long_mask = rng.rand(n_convs) < 0.01
    n_turns = np.where(long_mask, 100 + (rng.randint(0, 901, size=n_convs)), n_turns)

    roles = ["user", "assistant", "tool"]
    tools = ["browser", "pdf_reader", ""]

    recs_conv, recs_turn, recs_role, recs_text, recs_tool, recs_ts = (
        [], [], [], [], [], [],
    )
    for ci, conv in enumerate(conv_ids):
        for t in range(int(n_turns[ci])):
            k = _crc(conv, t)
            kind = _PAYLOAD_PICK[k % len(_PAYLOAD_PICK)]
            text = _PAYLOAD_FNS[kind](conv, t)
            if skew_giant and ci == 0 and t == 1:
                text = _sentence(k, 40000)  # ~1MB-ish giant paragraph
            role = roles[(k >> 4) % 3]
            recs_conv.append(conv)
            recs_turn.append(t)
            recs_role.append(role)
            recs_text.append(text)
            recs_tool.append(tools[(k >> 6) % 3] if role == "tool" else "")
            recs_ts.append(_EPOCH + timedelta(seconds=ci * 97 + t * 13))
    df = pd.DataFrame(
        {
            "conv_id": pd.Series(recs_conv, dtype="string"),
            "turn_idx": pd.Series(recs_turn, dtype="int32"),
            "role": pd.Series(recs_role, dtype="string"),
            "text": pd.Series(recs_text, dtype="string"),
            "tool": pd.Series(recs_tool, dtype="string"),
            # microsecond precision: Spark's parquet reader rejects NANOS
            "ts": pd.Series(recs_ts).astype("datetime64[us, UTC]"),
        }
    )
    return df


def write_transcripts_parquet(path: str, n_convs: int, seed: int = SEED,
                              skew_giant: bool = True) -> str:
    df = make_transcripts(n_convs, seed, skew_giant)
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    df.to_parquet(path, index=False)
    return path
