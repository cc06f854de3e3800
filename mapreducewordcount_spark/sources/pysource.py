"""Custom Python DataSource: the reference's corpus scan as a
pluggable connector (Spark 4 Python Data Source API).

The built-in text scan (sources/text.py) is the production path for
the word-count pipeline — JVM-side, byte-range-splittable, the right
choice whenever the data is *files Spark can already read*. This
module exists for the other case a 100 TB platform must cover:
wrapping a system Spark has no native connector for. It re-expresses
the reference's driver-side planning stages as a first-class source
so the parity is structural, not incidental:

- directory listing + ``*.txt`` filter (reference ``src/driver.py:93``)
  → ``CorpusReader.__init__`` (driver-side, once);
- file-size stats → N size-balanced splits (``src/driver.py:41-68``,
  longest-processing-time bin-packing) → ``partitions()``, which
  Spark distributes one-per-task exactly like the reference hands
  splits to workers;
- per-file filter pushdown → ``pushFilters()``: equality/prefix/IN
  predicates on the ``file`` column prune files BEFORE split
  planning, so pruned files are never opened, never even packed —
  the Python-source analog of partition pruning.

Unlike the reference, a split here is a *list of whole files* only
because the wrapped "system" is whole-file-oriented; the LPT packing
bounds skew (max bin ≤ mean + largest file). Executors import this
module via the session's addPyFile shipping (see get_spark).
"""

from __future__ import annotations

import fnmatch
import heapq
import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    StringStartsWith,
)


@dataclass
class CorpusPartition(InputPartition):
    #: (absolute path, basename) pairs — basename is the ``file``
    #: column value, carried so executors need no extra listing
    files: tuple


def lpt_pack(sized: list[tuple[str, int]], n: int) -> list[list[str]]:
    """Longest-processing-time bin-packing: items (name, size) into
    ``n`` bins, largest first into the currently lightest bin.
    Deterministic (ties broken by name, then bin index); classic
    guarantee: max bin ≤ mean + largest item."""
    bins: list[list[str]] = [[] for _ in range(n)]
    heap = [(0, i) for i in range(n)]
    heapq.heapify(heap)
    for name, size in sorted(sized, key=lambda t: (-t[1], t[0])):
        load, i = heapq.heappop(heap)
        bins[i].append(name)
        heapq.heappush(heap, (load + size, i))
    return bins


class CorpusReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("corpus source requires a 'path' option")
        glob = options.get("glob", "*.txt")
        self.n_splits = int(options.get("splits", "8"))
        if self.n_splits < 1:
            raise ValueError(f"splits must be >= 1, got {self.n_splits}")
        # driver-side listing, once (the reference driver does the
        # same); at real scale a wrapped system would expose its own
        # listing endpoint here
        self.files = sorted(
            (os.path.join(path, f), f)
            for f in os.listdir(path)
            if fnmatch.fnmatch(f, glob)
            and os.path.isfile(os.path.join(path, f)))

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Prune the file list with any ``file``-column predicate we
        understand; everything else (including every ``line``
        predicate) is returned for Spark to re-apply post-scan —
        accepted filters MUST be fully enforced here, partial
        application would drop rows."""
        for f in filters:
            keep = None
            if isinstance(f, (EqualTo, In, StringStartsWith)) \
                    and f.attribute == ("file",):
                if isinstance(f, EqualTo):
                    keep = lambda b, v=f.value: b == v
                elif isinstance(f, In):
                    keep = lambda b, vs=set(f.value): b in vs
                else:
                    keep = lambda b, p=f.value: b.startswith(p)
            if keep is None:
                yield f  # unsupported → Spark evaluates it
            else:
                self.files = [(p, b) for p, b in self.files if keep(b)]

    def partitions(self) -> list[CorpusPartition]:
        sized = [(p, os.path.getsize(p)) for p, _ in self.files]
        base = {p: b for p, b in self.files}
        bins = lpt_pack(sized, self.n_splits)
        # empty bins are planned away (the reference instead crashed
        # its reducer on empty buckets — SURVEY §2.1 D10; not a
        # behavior worth replicating)
        return [CorpusPartition(tuple((p, base[p]) for p in bin_))
                for bin_ in bins if bin_]

    def read(self, partition: CorpusPartition) -> Iterator[tuple]:
        for path, basename in partition.files:
            with open(path, encoding="utf-8", errors="replace") as fh:
                for line in fh:
                    yield basename, line.rstrip("\r\n")


class CorpusDataSource(DataSource):
    """``spark.read.format("corpus").option("path", dir)`` →
    ``DataFrame[file: string, line: string]``."""

    @classmethod
    def name(cls) -> str:
        return "corpus"

    def schema(self) -> str:
        return "file string, line string"

    def reader(self, schema) -> CorpusReader:
        return CorpusReader(dict(self.options))


def register_corpus_source(spark) -> None:
    spark.dataSource.register(CorpusDataSource)
