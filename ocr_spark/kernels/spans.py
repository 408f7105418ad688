"""Extractor C — DOM-heuristic span extraction + fallback full text.

Graft of the reference's third recognizer (custom CRNN,
/root/reference/README.md:20): a generalist that always produces *some*
reading of the document. Here: the full rendered text of the DOM with
typed spans (heading / code / list_item / link) located by tag-pattern
heuristics during the single parse pass in ``html_main``.

Also owns the span re-anchoring step: once the ensemble picks a final
text, spans computed against extractor C's full rendering are re-located
inside the chosen text (ordered left-to-right scan with a moving cursor;
spans whose fragment does not survive boilerplate stripping are dropped).
"""

from __future__ import annotations


def candidate_c(
    full_text: str, spans: list[tuple[int, int, str]]
) -> tuple[str, float, list[tuple[int, int, str]]]:
    """Extractor C candidate from the shared parse pass."""
    if not full_text:
        return "", 0.0, []
    mass = min(1.0, len(full_text) / 40.0)
    # generalist prior: always applicable, never dominant over a
    # confident specialist
    return full_text, round(0.5 * mass, 6), spans


def reanchor_spans(
    spans: list[tuple[int, int, str]],
    source_text: str,
    final_text: str,
) -> list[tuple[int, int, str]]:
    """Map spans from ``source_text`` coordinates into ``final_text``.

    Identity when the texts match; otherwise a left-to-right scan that
    finds each span fragment in ``final_text`` after a moving cursor,
    preserving order and dropping fragments removed by boilerplate
    stripping. Deterministic.
    """
    if not spans or not final_text:
        return []
    if source_text == final_text:
        return list(spans)
    out: list[tuple[int, int, str]] = []
    cursor = 0
    for start, end, kind in sorted(spans):
        frag = source_text[start:end]
        if not frag:
            continue
        pos = final_text.find(frag, cursor)
        if pos < 0:
            # fragment may straddle a '\n' the main text introduced
            pos = final_text.replace("\n", " ").find(frag, cursor)
            if pos < 0:
                continue
        out.append((pos, pos + len(frag), kind))
        cursor = pos
    return out
