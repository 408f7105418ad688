"""Fused per-turn extraction kernel — the batch API both the golden
oracle (tests) and the Spark pandas UDF call.

Graft of the reference's per-image pipeline (/root/reference
readmeImage/flowchart.png; README.md:18-21): normalize -> fan-out to
3 recognizers -> collect (text, conf) x3 -> majority vote -> validate ->
fixup -> structured record with error channel.

Routing (SURVEY.md §3.4): the ``tool`` column routes which extractors do
real work — 'html' runs A (+C from the same parse pass, B skipped),
'pdf' runs B with A/C as cheap normalization fallbacks, anything else is
the plain route (A/C normalization identity). Every turn still yields
exactly 3 candidates, mirroring the reference's 모델별 결과 array.
"""

from __future__ import annotations

import unicodedata

import pandas as pd

from ocr_spark.kernels.ensemble import vote
from ocr_spark.kernels.html_main import collapse_ws, extract_html
from ocr_spark.kernels.pdf_order import extract_pdf
from ocr_spark.kernels.spans import candidate_c, reanchor_spans

EXTRACTOR_A = "html_main"
EXTRACTOR_B = "pdf_order"
EXTRACTOR_C = "dom_spans"


def _normalize(raw: str) -> str:
    """O4/O5 payload normalization: unicode NFC + newline canon.

    Fast paths (identical output): '\\r' absent skips the CRLF
    rewrites; ASCII input skips NFC (NFC is the identity on ASCII —
    this is the common case and the C-speed isascii check beats the
    unicodedata call on every row)."""
    if not raw:
        return ""
    if "\r" in raw:
        raw = raw.replace("\r\n", "\n").replace("\r", "\n")
    if raw.isascii():
        return raw
    return unicodedata.normalize("NFC", raw)


def extract_one(raw: str, tool: str | None) -> dict:
    """Extract one turn. Returns the EXTRACT_RESULT record as a dict."""
    raw = _normalize(raw if isinstance(raw, str) else "")
    tool = tool if isinstance(tool, str) else ""

    if tool == "pdf":
        b_text, b_score = extract_pdf(raw)
        norm = collapse_ws(raw)
        a_text, a_score = (norm, 0.3 if norm else 0.0)
        c_text, c_score, full_spans = candidate_c(norm, [])
        full_text, main_spans = norm, []
    else:
        # html and plain routes share the parse pass (plain text has no
        # tags: extract_html degrades to normalization identity)
        h = extract_html(raw)
        a_text, a_score = h.main_text, h.score
        full_text, main_spans = h.full_text, h.main_spans
        c_text, c_score, full_spans = candidate_c(h.full_text, h.full_spans)
        b_text, b_score = "", 0.0

    candidates = [
        (EXTRACTOR_A, a_text, float(a_score)),
        (EXTRACTOR_B, b_text, float(b_score)),
        (EXTRACTOR_C, c_text, float(c_score)),
    ]
    text, score, _picked, error = vote(candidates)
    # spans: exact remap when the vote picked A's or C's text verbatim;
    # find-based re-anchor as a fallback when fixups altered the text
    if not text:
        spans = []
    elif text == a_text:
        spans = main_spans
    elif text == full_text:
        spans = full_spans
    else:
        spans = reanchor_spans(full_spans, full_text, text)

    return {
        "candidates": [
            {"extractor": e, "text": t, "score": s} for e, t, s in candidates
        ],
        "text": text,
        "spans": [{"start": s, "end": e, "kind": k} for s, e, k in spans],
        "score": float(score),
        "error": error,
    }


def extract_batch(texts: pd.Series, tools: pd.Series) -> pd.DataFrame:
    """Vectorized batch entry point (one Arrow batch per call).

    The HTML/PDF parse is inherently per-string Python (stdlib parser);
    everything around it is columnar. Returns a DataFrame matching
    schema.EXTRACT_RESULT field order.
    """
    records = [
        extract_one(t, k)
        for t, k in zip(texts.to_numpy(), tools.to_numpy())
    ]
    return pd.DataFrame.from_records(
        records, columns=["candidates", "text", "spans", "score", "error"]
    )
