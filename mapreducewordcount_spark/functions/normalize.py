"""Unicode NFC normalization — the one text-hygiene pass that
genuinely needs the Python escape hatch.

Spark SQL has no Unicode-normalization builtin (tokenizer, regexp,
case-folding all exist JVM-side; canonical composition does not), so
this is the documented exception to the "built-ins first" rule: an
Arrow-batched ``pandas_udf`` over ``unicodedata.normalize`` — the
vectorized slow path, never a row-at-a-time Python UDF. Both engines
implement the same Unicode canonical-composition algorithm
(CPython's unicodedata and DuckDB's utf8proc ``nfc_normalize``), so
the outputs hash-match across engines on real text; the pipeline9
gate query pins that.

Why a pipeline needs it at all: exact dedup, fingerprints, shingles
and BPE all hash BYTES — the composed and decomposed spellings of
the same text ("café" vs "cafe" + U+0301) hash differently, so a
corpus mixing sources that emit different forms silently under-dedups
until a normalization pass runs in front.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


@F.pandas_udf("string")
def nfc_normalize(s: pd.Series) -> pd.Series:
    import unicodedata

    return s.map(lambda x: unicodedata.normalize("NFC", x)
                 if x is not None else None)
