"""Extractor B unit tests: reading-order reconstruction."""

import random

from ocr_spark.kernels.pdf_order import extract_pdf


def _dump(lines):
    return "\n".join(
        f"L {p} {x:.1f} {y:.1f} {x + 200:.1f} {y + 12:.1f} {t}"
        for p, x, y, t in lines
    )


def test_single_column_top_down():
    lines = [
        (1, 72.0, 700.0, "first line."),
        (1, 72.0, 686.0, "second line."),
        (1, 72.0, 672.0, "third line."),
    ]
    random.Random(0).shuffle(lines)
    text, score = extract_pdf(_dump(lines))
    assert text == "first line. second line. third line."
    assert score == 1.0


def test_two_columns_left_then_right():
    lines = [
        (1, 72.0, 700.0, "left top."),
        (1, 72.0, 686.0, "left bottom."),
        (1, 340.0, 700.0, "right top."),
        (1, 340.0, 686.0, "right bottom."),
    ]
    random.Random(1).shuffle(lines)
    text, _ = extract_pdf(_dump(lines))
    assert text == "left top. left bottom.\nright top. right bottom."


def test_hyphenation_rejoined():
    lines = [
        (1, 72.0, 700.0, "the parti-"),
        (1, 72.0, 686.0, "tion strategy holds."),
    ]
    text, _ = extract_pdf(_dump(lines))
    assert text == "the partition strategy holds."


def test_pages_in_order():
    lines = [
        (2, 72.0, 700.0, "page two."),
        (1, 72.0, 700.0, "page one."),
    ]
    text, _ = extract_pdf(_dump(lines))
    assert text == "page one.\npage two."


def test_partial_garbage_scores_fractionally():
    raw = _dump([(1, 72.0, 700.0, "good line.")]) + "\nnot a layout line"
    text, score = extract_pdf(raw)
    assert text == "good line."
    assert score == 0.5


def test_no_layout_lines():
    text, score = extract_pdf("just plain prose, no L records")
    assert text == "" and score == 0.0
