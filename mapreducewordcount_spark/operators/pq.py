"""Product quantization (PQ) for embedding ANN — the memory-scale path.

At 100 TB of embeddings the limiting resource is bytes per vector:
a 64-dim float32 vector is 256 B; PQ with m=8 subspaces × 256
centroids stores 8 B — a 32× compression that turns a cluster-sized
corpus into a per-executor-cache-sized one. This is the standard
trade (public method: Jégou et al. 2011, *Product Quantization for
Nearest Neighbor Search*; the FAISS IndexPQ design):

- **Train** (write-time, once): k-means per subspace on a BOUNDED
  deterministic corpus sample, driver-side — exactly how FAISS
  trains (sampled, central). The sample is the n_train smallest ids
  by ``xxhash64`` (stable across runs/retries); the collect is
  bounded by construction, not a data-path collect.
- **Encode** (write-time, once): every vector → m uint8 codes via a
  vectorized Arrow batch pass (numpy argmin over the codebook —
  the classic case where a Pandas UDF beats a 128-term codegen
  expression). Map-side, zero shuffle.
- **Query** (read-time): ADC — per query, an m×k lookup table of
  subspace distances is computed driver-side (tiny), broadcast via
  closure, and each encoded vector scores as m table lookups. The
  ADC pass prefilters to ``refine`` candidates per query; exact
  cosine re-ranks only those, so the output contract matches
  ``cosine_topk`` (query_id, neighbor_id, rank, cos).

Approximate by design → no SQL oracle (rows-only gate row); recall
vs the exact scan is pinned in tests like LSH/IVF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapreducewordcount_spark.functions.vectors import cosine


def _train_codebooks(samples, m: int, k: int, iters: int, seed: int = 13):
    """Driver-side per-subspace Lloyd k-means on the sampled vectors.

    numpy is vectorized and the sample is bounded (n_train rows), so
    this is milliseconds — the same central training FAISS does.
    Deterministic: seeded shuffle-free init (first k distinct sample
    rows per subspace), argmin ties to the lowest index.
    """
    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    n, dim = x.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    books = []
    for j in range(m):
        sub = x[:, j * d:(j + 1) * d]
        # init: k distinct-ish rows in hash-sample order
        cent = sub[:k].copy()
        if len(cent) < k:  # degenerate tiny corpus: pad by repetition
            reps = -(-k // max(len(cent), 1))
            cent = np.tile(cent, (reps, 1))[:k]
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cent[c] = sub[mask].mean(axis=0)
        books.append(cent.tolist())
    return books


def pq_build(corpus: DataFrame, id_col: str = "vec_id",
             vec_col: str = "embedding", m: int = 8, k: int = 16,
             n_train: int = 1024, kmeans_iters: int = 3
             ) -> tuple[DataFrame, list]:
    """→ (codes, codebooks): per-vector uint8 code arrays + the
    m×k×(dim/m) codebook (plain Python lists — the model artifact).

    ``codes`` carries (id, codes array<int>); persist it partitioned
    however the serving layer wants — it is ~m bytes/vector.
    """
    sample = [r[0] for r in
              (corpus.orderBy(F.xxhash64(F.col(id_col).cast("string")),
                              id_col)
               .limit(n_train)
               .select(vec_col)
               .collect())]
    books = _train_codebooks(sample, m, k, kmeans_iters)

    def encode(batches):
        import numpy as np
        import pandas as pd

        cents = [np.asarray(b, dtype=np.float64) for b in books]
        d = cents[0].shape[1]
        for pdf in batches:
            vecs = np.asarray(list(pdf["__vec"]), dtype=np.float64)
            out = np.empty((len(vecs), len(cents)), dtype=np.int32)
            for j, cent in enumerate(cents):
                sub = vecs[:, j * d:(j + 1) * d]
                d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
                out[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame({"neighbor_id": pdf["__id"],
                                "codes": list(out)})

    codes = (corpus
             .select(F.col(id_col).alias("__id"),
                     F.col(vec_col).alias("__vec"))
             .mapInPandas(encode, schema="neighbor_id long, codes array<int>"))
    return codes, books


def pq_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
            id_col: str = "vec_id", vec_col: str = "embedding",
            query_id_col: str = "query_id", m: int = 8, n_cent: int = 16,
            refine: int = 32) -> DataFrame:
    """One-shot PQ ANN: build + ADC prefilter + exact cosine re-rank.

    Anything serving repeated query batches should ``pq_build`` once,
    persist the codes, and run only the ADC+refine read path. The ADC
    pass touches codes only (m ints/vector); the exact re-rank joins
    back the ``refine`` surviving candidate vectors per query.
    """
    codes, books = pq_build(corpus, id_col, vec_col, m=m, k=n_cent)
    qrows = queries.select(F.col(query_id_col).alias("query_id"),
                           F.col(vec_col).alias("q_vec")).collect()
    import numpy as np

    cents = [np.asarray(b, dtype=np.float64) for b in books]
    d = cents[0].shape[1]
    # per-query ADC tables: table[q][j][c] = ||q_sub_j - cent_jc||²
    tables = {}
    for r in qrows:
        q = np.asarray(r.q_vec, dtype=np.float64)
        tables[r.query_id] = [
            (((q[j * d:(j + 1) * d])[None, :] - cents[j]) ** 2).sum(axis=1)
            for j in range(len(cents))]

    def adc(batches):
        import pandas as pd

        qids = list(tables)
        tabs = {qid: np.stack(tables[qid]) for qid in qids}  # m×k
        for pdf in batches:
            code_mat = np.stack(pdf["codes"].to_list())  # rows×m
            rows_idx = np.arange(code_mat.shape[1])
            out_q, out_n, out_d = [], [], []
            for qid in qids:
                dist = tabs[qid][rows_idx, code_mat].sum(axis=1)
                out_q.extend([qid] * len(dist))
                out_n.extend(pdf["neighbor_id"])
                out_d.extend(dist)
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n,
                                "adc": out_d})

    scored = codes.mapInPandas(
        adc, schema="query_id long, neighbor_id long, adc double")
    wa = (Window.partitionBy("query_id")
          .orderBy(F.col("adc"), F.col("neighbor_id")))
    cand = (scored
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("__r", F.row_number().over(wa))
            .filter(F.col("__r") <= refine)
            .select("query_id", "neighbor_id"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("c_vec"))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("cos").desc(), F.col("neighbor_id")))
    return (F.broadcast(cand)
            .join(c, "neighbor_id").join(F.broadcast(q), "query_id")
            .withColumn("cos", F.round(cosine("q_vec", "c_vec"), 6))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos"))
