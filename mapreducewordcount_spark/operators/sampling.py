"""Deterministic bottom-k-by-hash sampling primitives shared by the
batch query (``queries/pipeline11.doc_reservoir_sample``) and its
streaming twin (``streaming/jobs.start_reservoir_maintenance``).

The ONE source of truth for the sample's hash stream: both sides
must rank by exactly the same ``md5(salt‖id)`` expression or the
pytest-pinned stream/batch boundary parity silently breaks (ADVICE
r12). Keeping the salt and the expression here — an operators
module neither side owns — is what makes "edit one, break the
other" impossible.

Reference parity: none — extension surface (SURVEY.md §2.5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: salt namespacing the reservoir's hash stream (the repo-wide rule:
#: every hash-consumer salts, so adding one can never correlate with
#: another consumer's bucketing of the same ids)
RSV_SALT = "rsv:"


def reservoir_hash(id_col: str = "doc_id") -> Column:
    """The uniform ranking key: ``md5(RSV_SALT ‖ id)``. Cross-engine
    stable (DuckDB computes the identical string), replay-stable
    (the hash IS the randomness), and mergeable (bottom-k over any
    union of partial bottom-k's equals bottom-k over the union)."""
    return F.md5(F.concat(F.lit(RSV_SALT), F.col(id_col).cast("string")))
