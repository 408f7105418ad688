"""Property-based kernel tests (hypothesis).

Invariants (SURVEY.md §5.2.4):
- the extraction kernel never raises, whatever bytes arrive;
- extracted main-text words ⊆ source text words (no invented content);
- whitespace-collapse idempotence: plain-route extraction is a fixpoint;
- pdf reading order is invariant to input line order.
"""

import re

from hypothesis import given, settings, strategies as st

from ocr_spark.kernels import extract_one
from ocr_spark.kernels.html_main import collapse_ws, extract_html
from ocr_spark.kernels.pdf_order import extract_pdf

_WORD = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=10
)

_TAGS = ["p", "div", "li", "h1", "pre", "a", "nav", "footer", "article"]


@st.composite
def html_doc(draw):
    """Random tag-soup document from a small grammar (incl. malformed)."""
    parts = []
    for _ in range(draw(st.integers(1, 12))):
        kind = draw(st.integers(0, 5))
        tag = draw(st.sampled_from(_TAGS))
        words = " ".join(draw(st.lists(_WORD, min_size=1, max_size=8)))
        if kind == 0:
            parts.append(f"<{tag}>{words}</{tag}>")
        elif kind == 1:
            parts.append(f"<{tag}>{words}")  # unclosed
        elif kind == 2:
            parts.append(words)
        elif kind == 3:
            parts.append(f"<{tag} attr='x>y'>{words}</{tag}>")
        elif kind == 4:
            # self-closing (incl. the script/style regression class)
            sc = draw(st.sampled_from(["script", "style", tag]))
            parts.append(f"<{sc} src=x/>{words}")
        else:
            parts.append(f"<{tag} href=/a/b>{words}</{tag}>")
    return "".join(parts)


@settings(max_examples=150, deadline=None)
@given(raw=st.text(max_size=400), tool=st.sampled_from(["html", "pdf", None]))
def test_kernel_total_on_arbitrary_text(raw, tool):
    rec = extract_one(raw, tool)
    assert set(rec) == {"candidates", "text", "spans", "score", "error"}
    assert len(rec["candidates"]) == 3
    assert (rec["text"] == "") == (rec["error"] != "") or rec["error"] == ""
    for s in rec["spans"]:
        assert 0 <= s["start"] < s["end"] <= len(rec["text"])


@settings(max_examples=150, deadline=None)
@given(doc=html_doc())
def test_html_extraction_subset_of_source(doc):
    res = extract_html(doc)
    src_words = set(re.findall(r"[a-z0-9]+", doc))
    for w in re.findall(r"[a-z0-9]+", res.main_text):
        assert w in src_words, f"invented token {w!r}"
    for w in re.findall(r"[a-z0-9]+", res.full_text):
        assert w in src_words


@settings(max_examples=100, deadline=None)
@given(words=st.lists(_WORD, min_size=1, max_size=30))
def test_plain_route_is_fixpoint(words):
    text = "  ".join(words)
    once = extract_one(text, None)
    if once["error"]:
        return
    twice = extract_one(once["text"], None)
    assert twice["text"] == once["text"]
    assert collapse_ws(once["text"]) == once["text"]


@settings(max_examples=60, deadline=None)
@given(
    lines=st.lists(
        st.tuples(
            st.integers(0, 1),  # column
            st.integers(0, 20),  # row
            _WORD,
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda t: (t[0], t[1]),
    ),
    seed=st.randoms(),
)
def test_pdf_order_invariant_to_line_shuffle(lines, seed):
    def render(ls):
        return "\n".join(
            f"L 1 {72.0 + c * 260.0:.1f} {800.0 - r * 14.0:.1f} "
            f"{272.0 + c * 260.0:.1f} {812.0 - r * 14.0:.1f} {w}"
            for c, r, w in ls
        )

    a, _ = extract_pdf(render(lines))
    shuffled = list(lines)
    seed.shuffle(shuffled)
    b, _ = extract_pdf(render(shuffled))
    assert a == b
