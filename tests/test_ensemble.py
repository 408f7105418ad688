"""Ensemble vote / validate / fixup unit tests (O9-O12)."""

from ocr_spark.kernels.ensemble import fixup, validate, vote


def test_exact_majority_wins():
    text, score, picked, err = vote(
        [("a", "same text", 0.9), ("b", "same text", 0.8), ("c", "other", 1.0)]
    )
    assert text == "same text" and err == ""
    assert score == round((0.9 + 0.8) / 2, 6)


def test_low_score_candidate_not_eligible():
    # 'b' and 'c' agree but are far below the max score -> specialist wins
    text, _, picked, _ = vote(
        [("a", "confident answer", 1.0), ("b", "noise", 0.1), ("c", "noise", 0.1)]
    )
    assert text == "confident answer" and picked == "a"


def test_highest_score_when_no_majority():
    text, score, picked, _ = vote(
        [("a", "alpha text", 0.7), ("b", "beta text", 0.9), ("c", "gamma text", 0.8)]
    )
    assert text == "beta text" and picked == "b"


def test_all_empty_is_error():
    text, score, _, err = vote([("a", "", 0.0), ("b", "", 0.0), ("c", "", 0.0)])
    assert text == "" and err == "no candidate produced text"


def test_validation_failure_clears_text():
    text, _, _, err = vote(
        [("a", ">>> ~~~ |||", 0.9), ("b", "", 0.0), ("c", "", 0.0)]
    )
    assert text == "" and err.startswith("validation failed")


def test_fixup_rescues_entities():
    # residual entities fail validation? no — they fail nothing; use a
    # CRLF + nbsp candidate that normalizes cleanly
    assert fixup("a&amp;b\r\nc&nbsp;d") == "a&b\nc d"


def test_validate_rules():
    assert validate("") != ""
    assert validate("good plain text") == ""
    assert validate("<div>residual</div>") == "residual markup"
    assert validate("....,,,;;;!!") == "low alnum ratio"


def test_mojibake_pairs_generated_not_hand_typed():
    # every pair must round-trip: encoding the intended char as UTF-8 and
    # misreading it as cp1252 (latin-1 for the holes) yields the source
    from ocr_spark.kernels.ensemble import MOJIBAKE_PAIRS, _mojibake_form

    assert len(MOJIBAKE_PAIRS) >= 20
    for src, dst in MOJIBAKE_PAIRS:
        assert src == _mojibake_form(dst)
        assert len(src) > 1  # mojibake is always multi-char


def test_fixup_repairs_mojibake():
    assert fixup("donâ€™t stop") == "don’t stop"
    assert fixup("cafÃ© rÃ©sumÃ©") == "café résumé"
    assert fixup("em â€” dash and â€¦ ellipsis") == "em — dash and … ellipsis"
    assert fixup("price â‚¬5 Â±1Â°") == "price €5 ±1°"


def test_fixup_longest_pair_wins():
    # 'â€™' (3 bytes of ’) must not be half-eaten by a shorter prefix
    # pair; clean text containing a lone 'â' stays untouched
    assert fixup("â is not mojibake alone") == "â is not mojibake alone"
    assert fixup("itâ€™s") == "it’s"
