#!/usr/bin/env python
"""Basket-pair mining stress: pair_affinity growth on synthetic
basket tables 10x-100x beyond the gate testdata, with and without
the mega-basket cap binding.

The operator's scale claim is that per-basket pair fanout is bounded
by ``max_basket`` (cap²/2) and that pair counts partial-aggregate
map-side; this measures it. Synthesizes ``n_baskets`` baskets whose
sizes are zipf-ish (real co-occurrence data is heavy-tailed: most
baskets are small, a few are huge), items drawn zipf-ish from a
vocabulary (hot items co-occur everywhere), plants 50 high-lift item
pairs (always bought together in dedicated baskets), then measures:

- baskets dropped by the cap (and the pair volume they WOULD have
  contributed: sum sz²/2 over dropped vs kept),
- wall-clock of the full affinity report and surviving pair count,
- planted recall (every planted pair must surface with n_both >=
  min_support and lift > 1).

Results feed SCALE.md's round-10 section.

Usage: python tools/itemsets_stress.py [n_baskets ...]
Default: 100000 1000000.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np

from mapreducewordcount_spark.operators.itemsets import pair_affinity

PLANTED = 50
PLANTED_BASKETS = 5   # each planted pair co-occurs in this many
SEED = 11
MAX_BASKET = 64
MIN_SUPPORT = 3


def synth_baskets(spark, n_baskets: int):
    """(basket, item) rows: zipf basket sizes (clipped at 4·cap so
    some baskets EXCEED the cap and exercise the drop path), zipf
    item draws, plus planted always-together pairs."""
    rng = np.random.default_rng(SEED)
    vocab = max(1000, n_baskets // 10)
    sizes = np.minimum(rng.zipf(1.6, size=n_baskets) + 1,
                       4 * MAX_BASKET)
    basket_ids = np.repeat(np.arange(n_baskets, dtype=np.int64), sizes)
    items = np.minimum(rng.zipf(1.3, size=sizes.sum()), vocab) - 1
    # planted: items (vocab + 2i, vocab + 2i + 1) appear together in
    # PLANTED_BASKETS dedicated 2-item baskets (lift >> 1)
    pb_ids, pb_items = [], []
    for i in range(PLANTED):
        for k in range(PLANTED_BASKETS):
            b = n_baskets + i * PLANTED_BASKETS + k
            pb_ids.extend([b, b])
            pb_items.extend([vocab + 2 * i, vocab + 2 * i + 1])
    all_b = np.concatenate([basket_ids, np.array(pb_ids, dtype=np.int64)])
    all_i = np.concatenate([items.astype(np.int64),
                            np.array(pb_items, dtype=np.int64)])
    import pandas as pd
    pdf = pd.DataFrame({"basket": all_b, "item": all_i})
    dropped = int((sizes > MAX_BASKET).sum())
    dropped_pairs = int((sizes[sizes > MAX_BASKET].astype(np.int64) ** 2
                         // 2).sum())
    kept_pairs = int((sizes[sizes <= MAX_BASKET].astype(np.int64) ** 2
                      // 2).sum())
    return (spark.createDataFrame(pdf).repartition(32),
            dropped, dropped_pairs, kept_pairs, vocab)


def run(spark, n_baskets: int) -> None:
    df, dropped, dropped_pairs, kept_pairs, vocab = synth_baskets(
        spark, n_baskets)
    df = df.persist()
    n_rows = df.count()
    t0 = time.time()
    rep = pair_affinity(df, "basket", "item",
                        min_support=MIN_SUPPORT, max_basket=MAX_BASKET)
    planted = {(vocab + 2 * i, vocab + 2 * i + 1) for i in range(PLANTED)}
    rows = rep.collect()
    wall = time.time() - t0
    got = {(r["item_a"], r["item_b"]) for r in rows}
    hit = {(r["item_a"], r["item_b"]) for r in rows
           if (r["item_a"], r["item_b"]) in planted
           and r["n_both"] >= MIN_SUPPORT and r["lift"] > 1.0}
    print(f"n_baskets={n_baskets} rows={n_rows} "
          f"capped_baskets={dropped} "
          f"pair_volume_dropped={dropped_pairs} kept={kept_pairs} "
          f"pairs_out={len(got)} wall={wall:.1f}s "
          f"planted_recall={len(hit)}/{PLANTED}")
    df.unpersist()


def main() -> None:
    from mapreducewordcount_spark.session import get_spark

    spark = get_spark("itemsets-stress")
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    for n in sizes:
        run(spark, n)


if __name__ == "__main__":
    main()
