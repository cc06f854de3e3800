"""Test-side reference port of the Penn Treebank word tokenizer.

nltk is not installable in this image (no network, no pip), so true
``nltk.word_tokenize`` parity cannot be executed here. This module is
the next-best instrument: a faithful reimplementation of the
*published* Treebank tokenization algorithm — Robert MacIntyre's
``tokenizer.sed`` rules as exposed by ``nltk.tokenize.treebank.
TreebankWordTokenizer`` (regex cascade: quote rewriting, punctuation
splitting, final-period handling, contraction families) — used by
``tests/test_tokenizer_parity_delta.py`` to MEASURE how far the
engine's ``treebank_lite_tokenize`` fallback diverges from real
Treebank semantics over the reference's own corpus, instead of
asserting parity only on a handful of golden cases.

Deliberate approximation, stated up front: ``nltk.word_tokenize``
first splits text into sentences with the *trained* Punkt model,
then tokenizes per sentence; Punkt cannot be reproduced without its
pickle, so ``word_tokenize_reference`` uses a regex sentence
splitter (terminal [.!?] + closing quotes, followed by whitespace
and an upper-case/quote opener). For the reference pipeline this is
a second-order effect: sentence boundaries only influence the
final-period rule, and the worker strips ASCII punctuation off token
ends afterwards (``/root/reference/src/worker.py:48-53``), so
``dog.`` → [``dog``, ``.``] vs [``dog.``] normalize identically.
The measured residual is pinned in the companion test.
"""

from __future__ import annotations

import re

# --- TreebankWordTokenizer rule cascade (public algorithm) -----------------

_STARTING_QUOTES = [
    (re.compile(r"^\""), r"``"),
    (re.compile(r"(``)"), r" \1 "),
    (re.compile(r"([ \(\[{<])(\"|\'{2})"), r"\1 `` "),
]

_PUNCTUATION = [
    (re.compile(r"([:,])([^\d])"), r" \1 \2"),
    (re.compile(r"([:,])$"), r" \1 "),
    (re.compile(r"\.\.\."), r" ... "),
    (re.compile(r"[;@#$%&]"), r" \g<0> "),
    # final period: split a sentence-terminal "." (with optional
    # closing brackets/quotes) off the last word
    (re.compile(r'([^\.])(\.)([\]\)}>"\']*)\s*$'), r"\1 \2\3 "),
    (re.compile(r"[?!]"), r" \g<0> "),
    (re.compile(r"([^'])' "), r"\1 ' "),
]

_PARENS_BRACKETS = (re.compile(r"[\]\[\(\)\{\}\<\>]"), r" \g<0> ")

_DOUBLE_DASHES = (re.compile(r"--"), r" -- ")

_ENDING_QUOTES = [
    (re.compile(r'"'), " '' "),
    (re.compile(r"(\S)(\'\')"), r"\1 \2 "),
    (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') "), r"\1 \2 "),
    (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r"\1 \2 "),
]

_CONTRACTIONS2 = [
    re.compile(pat, re.IGNORECASE) for pat in (
        r"\b(can)(not)\b", r"\b(d)('ye)\b", r"\b(gim)(me)\b",
        r"\b(gon)(na)\b", r"\b(got)(ta)\b", r"\b(lem)(me)\b",
        r"\b(mor)('n)\b", r"\b(wan)(na)(?=\s)",
    )
]
_CONTRACTIONS3 = [
    re.compile(pat, re.IGNORECASE) for pat in (r" ('t)(is)\b", r" ('t)(was)\b")
]


def treebank_word_tokenize(text: str) -> list[str]:
    """One sentence → Treebank tokens (the TreebankWordTokenizer rules)."""
    for regexp, substitution in _STARTING_QUOTES:
        text = regexp.sub(substitution, text)
    for regexp, substitution in _PUNCTUATION:
        text = regexp.sub(substitution, text)
    regexp, substitution = _PARENS_BRACKETS
    text = regexp.sub(substitution, text)
    regexp, substitution = _DOUBLE_DASHES
    text = regexp.sub(substitution, text)
    text = " " + text + " "
    for regexp, substitution in _ENDING_QUOTES:
        text = regexp.sub(substitution, text)
    for regexp in _CONTRACTIONS2:
        text = regexp.sub(r" \1 \2 ", text)
    for regexp in _CONTRACTIONS3:
        text = regexp.sub(r" \1 \2 ", text)
    return text.split()


# Punkt stand-in: break after terminal punctuation (+ optional closing
# quotes/brackets) when followed by whitespace and an upper-case or
# quote-led opener. See module docstring for why this is sufficient
# for the strip-normalized pipeline.
_SENT_BOUNDARY = re.compile(r"(?<=[.!?])(['\")\]]*)\s+(?=[\"'`\(\[]?[A-Z])")


def sent_split_reference(text: str) -> list[str]:
    pieces = _SENT_BOUNDARY.split(text)
    # re.split with one capture group interleaves the captured closers;
    # reattach each closer to the sentence before it
    sents: list[str] = []
    for i in range(0, len(pieces), 2):
        sent = pieces[i]
        if i + 1 < len(pieces) and pieces[i + 1]:
            sent += pieces[i + 1]
        if sent.strip():
            sents.append(sent.strip())
    return sents


def word_tokenize_reference(text: str) -> list[str]:
    """``nltk.word_tokenize`` shape: sentence-split, then Treebank."""
    return [tok for sent in sent_split_reference(text)
            for tok in treebank_word_tokenize(sent)]
