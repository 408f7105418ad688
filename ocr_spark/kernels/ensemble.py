"""Ensemble vote + validation + correction (SURVEY.md O9-O12).

Graft of the reference's 3-model fusion chain:
- majority vote over candidates (/root/reference/README.md:21, 다수결),
- regex validation of the selected text (README.md:21),
- confusion-pair second-pass correction (README.md:84, 'B'<->'8' etc.)
  re-expressed as deterministic mojibake/entity fixups,
- error channel: failures keep the row with text="" and a non-empty
  error message, mirroring the 인식 실패 sentinel
  (/root/reference/readmeImage/main3.png) — rows are never dropped.
"""

from __future__ import annotations

import re

# A candidate only participates in the vote if its score is within this
# factor of the best score (an implausible recognizer does not out-vote a
# confident specialist — graft of the reference's 2-model selection rule,
# documents/…13주차.md:56).
ELIGIBLE_FRAC = 0.6

_TAG_RESIDUE_RE = re.compile(r"</?[a-zA-Z][a-zA-Z0-9]*(\s[^<>]*)?>")
_WS_RE = re.compile(r"[ \t\f\v]+")

# Mojibake confusion pairs (O11): the reference corrects known glyph
# confusions ('B'<->'8', /root/reference/README.md:84); this engine's
# text-domain analog is UTF-8-read-as-cp1252 mojibake. The pair table is
# GENERATED from the intended characters (never hand-typed byte soup):
# mojibake(ch) = ch.encode('utf-8').decode('cp1252'), latin-1 fallback
# for the five cp1252 holes. Longest sequences first so a 2-byte pair
# never shadows a 3-byte one (e.g. 'â€' inside 'â€™').
_MOJIBAKE_CHARS = "’‘“”–—…•€™éèêëüöäñçàáíóúÉ °±×µ"


def _mojibake_form(ch: str) -> str:
    out = []
    for byte in ch.encode("utf-8"):
        b = bytes([byte])
        try:
            out.append(b.decode("cp1252"))
        except UnicodeDecodeError:
            out.append(b.decode("latin-1"))
    return "".join(out)


MOJIBAKE_PAIRS: list[tuple[str, str]] = sorted(
    ((_mojibake_form(c), c) for c in _MOJIBAKE_CHARS if c != " "),
    key=lambda p: len(p[0]),
    reverse=True,
)

# Table-driven fixups (O11): the confusion-pair rewrite graft.
FIXUPS: list[tuple[re.Pattern, str]] = [
    *[(re.compile(re.escape(src)), dst) for src, dst in MOJIBAKE_PAIRS],
    (re.compile(r"\r\n?"), "\n"),
    (re.compile(r" |&nbsp;"), " "),
    (re.compile(r"&amp;"), "&"),
    (re.compile(r"&lt;"), "<"),
    (re.compile(r"&gt;"), ">"),
    (re.compile(r"&quot;"), '"'),
    (re.compile(r"&#39;|&apos;"), "'"),
    (re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]"), ""),
]

MIN_ALNUM_RATIO = 0.15

# C-speed alnum mass: \w minus underscore. Equivalent to per-char
# str.isalnum() on this engine's text domain (letters/digits; combining
# marks — where \w and isalnum diverge — don't occur in extracted text);
# the per-char Python loop was 22% of kernel time under profile.
_WORDISH_RE = re.compile(r"[^\W_]+")

# ASCII fast path for the alnum count: bytes.translate with a deletion
# table runs at memcpy speed, vs the sre NFA stepping every position.
# On ASCII, [^\W_] is exactly [A-Za-z0-9], so the counts are identical;
# non-ASCII text falls back to the regex. validate() runs on every
# voted text and the sub was 12% of whole-kernel time.
_ASCII_ALNUM = (
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
)


def validate(text: str) -> str:
    """Structural validation (O10). Returns '' if valid, else a reason."""
    if not text or not text.strip():
        return "empty extraction"
    stripped = text.strip()
    if stripped.isascii():
        b = stripped.encode()
        alnum = len(b) - len(b.translate(None, _ASCII_ALNUM))
    else:
        alnum = len(stripped) - len(_WORDISH_RE.sub("", stripped))
    if alnum / len(stripped) < MIN_ALNUM_RATIO:
        return "low alnum ratio"
    if _TAG_RESIDUE_RE.search(stripped):
        return "residual markup"
    return ""


def fixup(text: str) -> str:
    """Deterministic correction pass (O11)."""
    for pat, repl in FIXUPS:
        text = pat.sub(repl, text)
    text = _WS_RE.sub(" ", text)
    text = re.sub(r" ?\n ?", "\n", text)
    return text.strip()


def vote(
    candidates: list[tuple[str, str, float]],
) -> tuple[str, float, str, str]:
    """Select the final text from [(extractor, text, score)] (O9-O12).

    Returns (text, score, picked_extractor, error). Selection:
    1. exact-match majority among *eligible* candidates (score within
       ELIGIBLE_FRAC of the max) — the 다수결 rule,
    2. else the highest-scoring eligible candidate,
    then validate -> fixup -> revalidate. On terminal failure the text is
    cleared and the error channel is set (row preserved).
    """
    nonempty = [c for c in candidates if c[1]]
    if not nonempty:
        return "", 0.0, "", "no candidate produced text"
    best = max(c[2] for c in nonempty)
    eligible = [c for c in nonempty if c[2] >= ELIGIBLE_FRAC * best]

    by_text: dict[str, list] = {}
    for c in eligible:
        by_text.setdefault(c[1], []).append(c)
    majority = [
        (txt, grp) for txt, grp in by_text.items() if len(grp) >= 2
    ]
    if majority:
        # largest agreeing group; tie -> higher mean score -> first extractor
        txt, grp = max(
            majority,
            key=lambda kv: (
                len(kv[1]),
                sum(c[2] for c in kv[1]) / len(kv[1]),
            ),
        )
        score = round(sum(c[2] for c in grp) / len(grp), 6)
        picked = grp[0][0]
    else:
        c = max(eligible, key=lambda c: c[2])
        txt, score, picked = c[1], round(c[2], 6), c[0]

    err = validate(txt)
    if err:
        txt2 = fixup(txt)
        err2 = validate(txt2)
        if not err2:
            return txt2, score, picked, ""
        return "", 0.0, picked, f"validation failed: {err2}"
    return txt, score, picked, ""
