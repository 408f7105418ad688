"""Extractor A unit tests: boilerplate gallery (SURVEY.md §5.2.2)."""

from ocr_spark.kernels.html_main import collapse_ws, extract_html

PAGE = """
<html><head><title>t</title><script>var x = 1;</script>
<style>.x{color:red}</style></head><body>
<header><p>Site header menu</p></header>
<nav><ul>
  <li><a href="/a">nav one</a></li>
  <li><a href="/b">nav two</a></li>
  <li><a href="/c">nav three</a></li>
</ul></nav>
<article>
  <h1>The Title Here</h1>
  <p>This is the first paragraph of the main article content with
     plenty of running text to dominate the density score.</p>
  <p>Second paragraph continues the argument with more prose and a
     <a href="/ref">reference link</a> inside it.</p>
</article>
<aside><p><a href="#1">promoted story one</a></p>
<p><a href="#2">promoted story two</a></p></aside>
<footer><p>© 2026 corp <a href="/tos">terms</a></p></footer>
</body></html>
"""


def test_article_wins_over_boilerplate():
    r = extract_html(PAGE)
    assert r.main_text.startswith("The Title Here")
    assert "first paragraph" in r.main_text
    assert "nav one" not in r.main_text
    assert "promoted story" not in r.main_text
    assert "corp" not in r.main_text
    assert "Site header" not in r.main_text
    assert 0.0 < r.score <= 1.0


def test_script_style_skipped():
    r = extract_html(PAGE)
    assert "var x" not in r.full_text
    assert "color:red" not in r.full_text


def test_spans_remapped_into_main_text():
    r = extract_html(PAGE)
    kinds = {k for _, _, k in r.main_spans}
    assert "heading" in kinds
    assert "link" in kinds
    for s, e, kind in r.main_spans:
        frag = r.main_text[s:e]
        assert frag and frag == frag.strip()
    heading = next(
        r.main_text[s:e] for s, e, k in r.main_spans if k == "heading"
    )
    assert heading == "The Title Here"


def test_no_markup_is_normalization_identity():
    r = extract_html("Hello   world\n\nagain")
    assert r.main_text == "Hello world again"
    assert r.main_text == r.full_text


def test_empty_and_whitespace():
    assert extract_html("").main_text == ""
    assert extract_html("   \n\t ").score == 0.0


def test_malformed_html_survives():
    broken = "<div><p>unclosed paragraph <b>bold <p>next para</div><ul><li>item"
    r = extract_html(broken)
    assert "unclosed paragraph" in r.full_text
    assert r.main_text != ""


def test_entities_decoded():
    r = extract_html("<p>a &amp; b &lt;c&gt;</p>")
    assert "a & b <c>" in r.full_text


def test_extracted_text_is_subset_of_source_content():
    # property: every whitespace token of the extraction appears in the
    # source document (no invented text)
    r = extract_html(PAGE)
    src = collapse_ws(PAGE)
    for tok in r.main_text.split():
        assert tok in src
