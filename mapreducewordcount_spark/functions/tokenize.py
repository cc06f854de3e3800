"""Tokenization — the reference's only nontrivial scalar function.

Reference semantics (pinned in SURVEY.md §2.3 from
``src/worker.py:37-53``): ``nltk.word_tokenize`` →
``word.strip(string.punctuation)`` (ASCII punctuation, *ends only*)
→ drop empties → ``word.lower()`` (Unicode-aware).

Two modes, per SURVEY.md §7 step 1:

- **native** (default, fast path): pure column expressions —
  whitespace split + ends-only ASCII-punctuation strip + lower.
  Stays entirely inside whole-stage codegen; zero Python in the hot
  path. Documented delta vs the reference: no Treebank contraction
  splitting (``Don't`` stays one token ``don't`` instead of
  ``do`` + ``n't``).
- **parity** (conformance path): Treebank-style tokenization via an
  Arrow-batched ``mapInPandas`` stage. Uses nltk when importable;
  otherwise a built-in "treebank-lite" pure-Python tokenizer that
  reproduces the golden cases in FIXTURES.md §F2 (contraction and
  possessive splitting, punctuation runs as standalone tokens).
  Python cost is amortized per Arrow batch, not per row — the only
  acceptable shape for a Python tokenizer at 100 TB.
"""

from __future__ import annotations

import re
import string
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

#: ``string.punctuation`` expressed as a Java/RE2 regex char class:
#: ``!``(33)-``/``(47), ``:``(58)-``@``(64), ``[``(91)-backtick(96),
#: ``{``(123)-``~``(126). ASCII-only, same set the reference strips
#: via ``word.strip(string.punctuation)`` (``src/worker.py:50``).
PUNCT_CLASS = r"!-/:-@\[-`{-~"

_STRIP_ENDS = rf"^[{PUNCT_CLASS}]+|[{PUNCT_CLASS}]+$"


def normalize_word(col: Column | str) -> Column:
    """strip ASCII punctuation from both ends, then Unicode-lowercase.

    Mirrors ``src/worker.py:50-52``: ends-only strip (``O.K.`` →
    ``O.K`` → ``o.k``; interior punctuation survives), full Unicode
    ``lower()``. Unicode punctuation is *not* stripped — same as the
    reference.
    """
    return F.lower(F.regexp_replace(col, _STRIP_ENDS, ""))


def tokenize_expr(col: Column | str) -> Column:
    """Native-mode tokenizer: text line → array<string> of clean words.

    Pure column expression (split / transform / filter) so Catalyst
    keeps the whole stage in codegen. Pipeline = whitespace split →
    per-token ends-strip+lower → drop empties, i.e. reference stages
    D4,D5,D6,D7 (SURVEY.md §2.1) minus Treebank contraction rules.
    """
    # (?U) → Unicode-aware \s (NBSP etc.), matching Python str.split()
    words = F.split(F.col(col) if isinstance(col, str) else col, r"(?U)\s+")
    cleaned = F.transform(words, lambda w: F.lower(F.regexp_replace(w, _STRIP_ENDS, "")))
    return F.filter(cleaned, lambda w: F.length(w) > 0)


# --------------------------------------------------------------------------
# parity mode (Treebank semantics)
# --------------------------------------------------------------------------

# Contraction suffixes the Treebank tokenizer splits off; see the
# golden cases in FIXTURES.md §F2 ("Don't" -> ["Do", "n't"],
# "Smith's" -> ["Smith", "'s"]).
_CONTRACTION_RE = re.compile(r"(?i)(?<=\w)(n't|'ll|'re|'ve|'s|'m|'d)$")
# Fixed-word splits from the Treebank rules (CONTRACTIONS2/3 in the
# published tokenizer.sed cascade): measured against a rule-faithful
# reference port over the Gutenberg corpus, these four families were
# the largest source of divergence (see
# tests/test_tokenizer_parity_delta.py).
_WORD_SPLITS = {
    "cannot": ("can", "not"), "d'ye": ("d", "'ye"),
    "gimme": ("gim", "me"), "gonna": ("gon", "na"),
    "gotta": ("got", "ta"), "lemme": ("lem", "me"),
    "mor'n": ("mor", "'n"), "wanna": ("wan", "na"),
}
# A token is a comma-grouped number ("1,000" / "1,000.50" — Treebank
# keeps these whole: its comma rule only splits before non-digits), a
# word-ish run (letters/digits/marks with internal ./'/-; this also
# covers dotted tokens like "O.K." and "1.E.1"), or a run of anything
# else (punctuation cluster). The comma form must be listed first but
# stay narrow: a bare \d+ alternative would steal the lead digits
# from dotted tokens.
_TOKEN_RE = re.compile(
    r"\d+(?:,\d+)+(?:\.\d+)?|[^\W_]+(?:[.'\-/][^\W_]+)*[.']?|[^\s\w]+|_+",
    re.UNICODE)
_TRAILING_PUNCT_RE = re.compile(r"[.']+$")


def treebank_lite_tokenize(text: str) -> list[str]:
    """Pure-Python fallback approximating ``nltk.word_tokenize``.

    Covers the pinned golden semantics (FIXTURES.md §F2): contraction
    and possessive suffixes split into their own tokens, punctuation
    runs become standalone tokens, digits and internal-period tokens
    (``O.K.``) survive as units. The corpus-measured divergence vs a
    rule-faithful Treebank reference port is pinned in
    tests/test_tokenizer_parity_delta.py.
    """
    out: list[str] = []
    for raw in text.split():
        for tok in _TOKEN_RE.findall(raw):
            # peel sentence-final ./' off the candidate before the
            # contraction check ("didn't." must still split — real
            # Treebank splits the final period first); the peeled runs
            # are their own tokens, stripped to nothing downstream
            m_tp = _TRAILING_PUNCT_RE.search(tok)
            trailing = ""
            core = tok
            if m_tp and m_tp.start() > 0:
                core, trailing = tok[: m_tp.start()], m_tp.group(0)
            split = _WORD_SPLITS.get(core.lower())
            if (core.lower() in ("tis", "twas") and out
                    and out[-1].endswith("'")):
                # "'Tis"/"'Twas": the apostrophe was emitted as its own
                # punctuation token just before; Treebank's rule makes
                # ["'t", "is"] — emit ["T", "is"]-style halves, which
                # normalize identically (the apostrophe strips away)
                out.append(core[:1])
                out.append(core[1:])
            elif split is not None:
                a_len = len(split[0])
                out.append(core[:a_len])
                out.append(core[a_len:])
            else:
                m = _CONTRACTION_RE.search(core)
                if m and m.start() > 0:
                    out.append(core[: m.start()])
                    out.append(m.group(0))
                else:
                    out.append(core)
            if trailing:
                out.append(trailing)
    return out


def _parity_tokenizer():
    """Pick nltk when available, else the treebank-lite fallback."""
    try:  # pragma: no cover - nltk not shipped in the test image
        import nltk

        nltk.data.find("tokenizers/punkt")
        return nltk.word_tokenize
    except Exception:
        return treebank_lite_tokenize


def tokenize_parity(df: DataFrame, text_col: str = "value",
                    out_col: str = "word") -> DataFrame:
    """Parity-mode tokenizer as an Arrow-batched ``mapInPandas`` stage.

    One tokenizer instance per Python worker (initialized inside the
    generator, outside the batch loop) — per-executor amortization,
    the mapInPandas analog of the reference loading its nltk model
    once per worker process (``src/worker.py:12-13``).

    Emits one row per token with reference normalization applied
    (ends-strip ASCII punctuation, drop empties, lowercase —
    ``src/worker.py:50-52``).
    """
    punct = string.punctuation

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        tokenize = _parity_tokenizer()

        for pdf in batches:
            words: list[str] = []
            for line in pdf[text_col]:
                if not isinstance(line, str):
                    continue  # null text -> no tokens (astype(str)
                    # would turn None into the literal token "none")
                for tok in tokenize(line):
                    w = tok.strip(punct)
                    if w:
                        words.append(w.lower())
            yield pd.DataFrame({out_col: words})

    return df.mapInPandas(run, schema=f"{out_col} string")
