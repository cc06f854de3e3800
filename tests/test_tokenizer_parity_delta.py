"""Quantified treebank-lite ↔ Treebank divergence (VERDICT r1 missing#2).

Real ``nltk.word_tokenize`` cannot run in this image (nltk absent, no
network), so parity-mode claims previously rested on golden cases
alone. This test replaces that with a *measured* corpus-level bound:
tokenize the reference's entire Gutenberg corpus with the engine's
``treebank_lite_tokenize`` AND with a rule-faithful port of the
published Treebank tokenizer cascade (tests/treebank_reference.py),
push both through the reference's normalization
(``strip(string.punctuation)`` → drop empties → ``lower``,
``/root/reference/src/worker.py:48-53``), and pin the word-count
delta exactly.

Measured residual (2026-08-13, corpus = 3,301,104 bytes, 8 books):

- 619,865 vs 619,749 normalized tokens (0.019% total-count delta);
- 135 of ~21,300 distinct words differ in count; Σ|Δcount| = 350
  (0.056% of tokens).

The dominant residual class is the Punkt gray zone: ``didn't.``
mid-line where the regex sentence-splitter (no trained Punkt model)
keeps the token whole in the port while treebank-lite splits the
contraction — real nltk with Punkt usually *does* split there, so
treebank-lite is likely closer to real nltk than this bound implies.
The deterministic rule families that used to dominate (cannot/gonna
splits, 'tis/'twas, comma-grouped numbers, trailing-period-blocked
contractions, slash-joined tokens) are now implemented in
treebank-lite and verified here.
"""

from __future__ import annotations

import os
import string
from collections import Counter

import pytest

from mapreducewordcount_spark.functions.tokenize import treebank_lite_tokenize
from tests.conftest import REFERENCE_CORPUS
from tests.treebank_reference import (
    treebank_word_tokenize,
    word_tokenize_reference,
)

CORPUS_AVAILABLE = os.path.isdir(REFERENCE_CORPUS)


def _normalized_counts(tokenize) -> Counter:
    counts: Counter = Counter()
    for name in sorted(os.listdir(REFERENCE_CORPUS)):
        if not name.endswith(".txt"):
            continue
        with open(os.path.join(REFERENCE_CORPUS, name),
                  encoding="utf-8") as f:
            for line in f:
                for tok in tokenize(line):
                    w = tok.strip(string.punctuation)
                    if w:
                        counts[w.lower()] += 1
    return counts


def test_treebank_port_golden_cases():
    """The reference port itself reproduces canonical Treebank
    behaviors (so the delta below is measured against a trustworthy
    instrument)."""
    assert treebank_word_tokenize("Don't do that.") == \
        ["Do", "n't", "do", "that", "."]
    assert treebank_word_tokenize("Smith's dog") == ["Smith", "'s", "dog"]
    assert treebank_word_tokenize("I cannot go") == ["I", "can", "not", "go"]
    assert treebank_word_tokenize("gonna rain") == ["gon", "na", "rain"]
    assert treebank_word_tokenize('"Hello," she said.') == \
        ["``", "Hello", ",", "''", "she", "said", "."]
    assert treebank_word_tokenize("worth $1,000.50 today") == \
        ["worth", "$", "1,000.50", "today"]
    assert treebank_word_tokenize("wait... what?") == \
        ["wait", "...", "what", "?"]


@pytest.mark.skipif(not CORPUS_AVAILABLE, reason="reference corpus absent")
def test_corpus_divergence_pinned():
    lite = _normalized_counts(treebank_lite_tokenize)
    ref = _normalized_counts(word_tokenize_reference)

    diff = {w: (lite.get(w, 0), ref.get(w, 0))
            for w in set(lite) | set(ref)
            if lite.get(w, 0) != ref.get(w, 0)}
    sum_abs = sum(abs(a - b) for a, b in diff.values())

    # exact pins: any tokenizer change re-measures or fails loudly
    assert sum(lite.values()) == 619_865
    assert sum(ref.values()) == 619_749
    assert len(diff) == 135
    assert sum_abs == 350
    # the headline bound: <0.1% of tokens diverge from the Treebank
    # rule cascade after reference normalization
    assert sum_abs / sum(ref.values()) < 0.001


# --- real-nltk golden hook (FIXTURES.md F2 open item) -----------------------

NLTK_GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures",
                           "nltk_golden.json")


@pytest.mark.skipif(
    not os.path.exists(NLTK_GOLDEN),
    reason="real-nltk golden not generated yet — needs one offline run "
           "on an nltk-enabled machine (see FIXTURES.md F2); this test "
           "activates the moment the fixture lands")
def test_real_nltk_golden_parity():
    """Token-for-token comparison against output captured from REAL
    ``nltk.word_tokenize``. Fixture format: a JSON list of
    {"text": ..., "tokens": [...]} objects, where ``tokens`` is the
    raw nltk output (pre-normalization). Generate with:

        import json, nltk
        nltk.download("punkt_tab")
        cases = [{"text": t, "tokens": nltk.word_tokenize(t)}
                 for t in TEXTS]
        json.dump(cases, open("nltk_golden.json", "w"))
    """
    import json

    with open(NLTK_GOLDEN) as fh:
        cases = json.load(fh)
    assert cases, "golden fixture exists but is empty"
    mismatches = [(c["text"], treebank_lite_tokenize(c["text"]), c["tokens"])
                  for c in cases
                  if treebank_lite_tokenize(c["text"]) != c["tokens"]]
    # exact parity is the goal; record the measured delta loudly if
    # a future fixture exposes residual Punkt edge cases
    assert not mismatches, mismatches[:5]
