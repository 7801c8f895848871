"""Product quantization (PQ) for embedding compression + ADC search
(Jegou, Douze, Schmid 2011, "Product Quantization for Nearest Neighbor
Search" — the FAISS `PQx` index family).

Why this is the 100 TB embedding story: a 64-dim float32 vector is
256 B; its PQ code (m=8 subspaces x 16 centroids) is 8 SMALL INTS —
a ~32-64x storage cut with the codebooks held as ~4 KB of plain
literals. Search never touches raw vectors: each query builds an m x ks
lookup table once, and scoring a corpus vector is m table lookups + an
m-term sum (asymmetric distance computation, ADC). At cluster scale the
codes table is the only thing scanned — it fits in page cache where the
raw embeddings never could.

Design mirrors the IVF operator (operators/similarity.py): codebooks
train driver-side on a bounded deterministic sample (the FAISS
contract), ship as literals, and replay in SQL as VALUES tables so the
whole encode + search path is DuckDB-oracle-checkable (q59's merged
'pq' rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.operators.similarity import _half_up, _lloyd


def train_pq_codebooks(
    sample,
    m: int = 8,
    ks: int = 16,
    iters: int = 5,
    round_dp: int = 6,
) -> list[list[list[float]]]:
    """Per-subspace codebooks: split the dim into ``m`` contiguous
    subspaces and run the SAME deterministic fixed-iteration Lloyd's
    k-means (similarity._lloyd) on each subspace's sample slice.
    Returns ``m`` lists of ``ks`` centroids of dim/m floats, rounded to
    ``round_dp`` so they replay bit-identically as SQL VALUES."""
    import numpy as np

    sample = np.asarray(sample, dtype=np.float64)
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return [
        _lloyd(sample[:, s * sub : (s + 1) * sub].copy(), ks, iters, round_dp)
        for s in range(m)
    ]


_DIR_CODEBOOKS: dict[tuple, list[list[list[float]]]] = {}


def pq_codebooks_for_dir(
    sf_dir: str,
    m: int = 8,
    ks: int = 16,
    iters: int = 5,
    sample_cap: int = 4096,
    round_dp: int = 6,
) -> list[list[list[float]]]:
    """Train codebooks straight off ``{sf_dir}/embeddings.parquet`` with
    pyarrow (no Spark session) — the ivf_centroids_for_dir idiom, so the
    DuckDB oracle embeds IDENTICAL literals. Memoized per (dir, params)."""
    key = (sf_dir, m, ks, iters, sample_cap, round_dp)
    got = _DIR_CODEBOOKS.get(key)
    if got is None:
        import numpy as np
        import pyarrow.parquet as pq_

        t = pq_.read_table(
            f"{sf_dir.rstrip('/')}/embeddings.parquet",
            columns=["vec_id", "embedding"],
        )
        order = np.argsort(t.column("vec_id").to_numpy(), kind="stable")[
            :sample_cap
        ]
        embs = t.column("embedding").to_pylist()
        sample = np.array([embs[i] for i in order], dtype=np.float64)
        got = _DIR_CODEBOOKS[key] = train_pq_codebooks(
            sample, m, ks, iters, round_dp
        )
    return got


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, codes) — each vector compressed to ``m`` codebook
    indices. Per subspace the code is the nearest centroid by the
    argmax identity (v_s . c - |c|^2/2), ties to the LOWER code
    (np.argmax first-wins), matching the oracle's ORDER BY score DESC,
    code ASC. One BLAS matmul per (subspace, Arrow batch) in a single
    narrow mapInPandas stage — no shuffle, the codes column rides along
    with the scan (write it partitioned/sorted however the corpus
    already is; this is the column a 100 TB deployment persists
    INSTEAD of the embeddings)."""
    import numpy as np
    import pandas as pd

    books = [np.array(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    sub = books[0].shape[1]
    src = df.select(F.col(id_col).alias("_i"), F.col(vec_col).alias("_v"))

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in pdf["_v"]]
            )
            codes = np.empty((len(mat), m), dtype=np.int32)
            for s, B in enumerate(books):
                scores = mat[:, s * sub : (s + 1) * sub] @ B.T - 0.5 * (
                    B * B
                ).sum(axis=1)[None, :]
                codes[:, s] = np.argmax(scores, axis=1)
            yield pd.DataFrame({"_i": pdf["_i"], "codes": list(codes)})

    return src.mapInPandas(encode, "_i long, codes array<int>").select(
        F.col("_i").alias(id_col), "codes"
    )


def pq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rank_dp: int = 4,
    local_margin: int = 32,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: rank corpus vectors by
    the approximate inner product  sum_s q_s . codeword_s(code_s),
    computed as m lookups into the query's (m x ks) LUT. Returns
    (query_id, neighbor_id, approx_ip, rank), rank by
    (round(approx_ip, rank_dp) desc, neighbor_id asc) — the q58/q67
    ordering contract, so the whole search replays in SQL.

    Plan shape (100 TB): the corpus side scans ONLY the codes table
    (never embeddings) in one narrow mapInPandas stage — LUT lookups +
    the local top-(k+margin) cut fused into the scan; the corpus never
    shuffles and only O(partitions x queries x (k+margin)) survivor
    rows reach the final window. The local cut uses _half_up (exact
    JVM HALF_UP parity), so it shares ONE total order with the final
    window's F.round — real pruning, not a prune-disabled huge k
    (ivf_topk's rank_dp mechanism). Queries are the bounded collected
    side by contract (q58)."""
    import numpy as np
    import pandas as pd

    books = [np.array(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    sub = books[0].shape[1]

    qrows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    if not qrows:
        raise ValueError("queries is empty")
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    # luts[j, s, c] = q_j's subvector s dotted with codeword c
    luts = np.stack(
        [qmat[:, s * sub : (s + 1) * sub] @ books[s].T for s in range(m)],
        axis=1,
    )

    src = codes.select(F.col(id_col).alias("_i"), F.col("codes"))
    keep = k + local_margin

    def local_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.vstack(
                [np.asarray(c, dtype=np.int64) for c in pdf["codes"]]
            )
            nids = pdf["_i"].to_numpy()
            # scores[i, j] = sum_s luts[j, s, cm[i, s]]; accumulate in
            # FIXED subspace order 0..m-1 (the oracle sums the same m
            # sub-dots), float64 throughout
            scores = np.zeros((len(cm), len(qids)), dtype=np.float64)
            for s in range(m):
                scores += luts[:, s, cm[:, s]].T
            allowed = nids[:, None] != qids[None, :]
            out_q, out_n, out_s = [], [], []
            for j in range(len(qids)):
                idx = np.nonzero(allowed[:, j])[0]
                if not len(idx):
                    continue
                sel = _half_up(scores[idx, j], rank_dp)
                take = idx[np.lexsort((nids[idx], -sel))[:keep]]
                out_q.extend([int(qids[j])] * len(take))
                out_n.extend(nids[take])
                out_s.extend(scores[take, j])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "approx_ip": out_s}
            )

    survivors = src.mapInPandas(
        local_topk, "query_id long, neighbor_id long, approx_ip double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("approx_ip", rank_dp)), F.asc("neighbor_id")
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "approx_ip", "rank")
    )


def pq_books_values_sql(codebooks: list[list[list[float]]]) -> str:
    """The codebooks as a SQL VALUES body (s, c, j, w) with j 1-based
    WITHIN the subspace — embedding[s*sub + j] addresses the right
    coordinate (the q59 hyperplane / q67 centroid replay idiom)."""
    return ",\n".join(
        f"({s},{c},{j + 1},{w!r})"
        for s, book in enumerate(codebooks)
        for c, cent in enumerate(book)
        for j, w in enumerate(cent)
    )


# --- IVF + PQ: partition pruning x compression (the FAISS IVFPQ layout) ------

def ivfpq_assign_encode(
    df: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes, list_id) in ONE narrow mapInPandas pass: nearest IVF
    list (argmax v.c - |c|^2/2, low-list ties — similarity.ivf_assign's
    rule) and the m PQ codes, both BLAS. The raw embedding is read once
    here and then never again: the IVFPQ store keeps only this row."""
    import numpy as np
    import pandas as pd

    cents = np.array(centroids, dtype=np.float64)
    books = [np.array(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    sub = books[0].shape[1]
    src = df.select(F.col(id_col).alias("_i"), F.col(vec_col).alias("_v"))

    def assign_encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in pdf["_v"]]
            )
            lists = np.argmax(
                mat @ cents.T - 0.5 * (cents * cents).sum(axis=1)[None, :],
                axis=1,
            )
            codes = np.empty((len(mat), m), dtype=np.int32)
            for s, B in enumerate(books):
                scores = mat[:, s * sub : (s + 1) * sub] @ B.T - 0.5 * (
                    B * B
                ).sum(axis=1)[None, :]
                codes[:, s] = np.argmax(scores, axis=1)
            yield pd.DataFrame(
                {
                    "_i": pdf["_i"],
                    "codes": list(codes),
                    "list_id": lists.astype(np.int32),
                }
            )

    return src.mapInPandas(
        assign_encode, "_i long, codes array<int>, list_id int"
    ).select(F.col("_i").alias(id_col), "codes", "list_id")


def write_ivfpq_store(
    df: DataFrame,
    path: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Persist the corpus as the IVFPQ index: codes partitioned by
    list_id, NO raw embeddings. This is the 100 TB serving layout — the
    two I/O savings multiply: probing nprobe/n_lists of the partitions
    (pruning, the write_ivf_store win) of a table that is itself
    ~32-64x smaller per row (compression, the pq_encode win). bench.py
    measures the product as ivfpq_io."""
    # r17 (guide §6): cluster by the partition key before the write —
    # the assign+encode is a narrow map, so a multi-partition input
    # would otherwise write input_parts x n_lists small files (see
    # write_ivf_store).
    ivfpq_assign_encode(
        df, centroids, codebooks, id_col, vec_col
    ).repartition("list_id").write.partitionBy("list_id").mode(mode).parquet(
        path
    )


def ivfpq_topk(
    store: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rank_dp: int = 4,
    local_margin: int = 32,
) -> DataFrame:
    """ADC top-k over an IVFPQ store: each query scans only its
    ``nprobe`` nearest lists' code partitions. ``store`` must carry
    (id_col, codes, list_id) — the write_ivfpq_store layout; the isin
    filter on the probed-list union becomes partition pruning at the
    scan (the ivf_topk mechanism), and scoring is pq_adc_topk's LUT
    sum restricted to each query's own probed lists (probe_mask_for —
    the SAME selection rule ivf_topk and the bench I/O accounting use).
    Output schema matches pq_adc_topk.
    """
    import numpy as np
    import pandas as pd

    from solarpaneldatawrangler_spark.operators.similarity import (
        probe_mask_for,
    )

    cents = np.array(centroids, dtype=np.float64)
    books = [np.array(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    sub = books[0].shape[1]

    qrows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    if not qrows:
        raise ValueError("queries is empty")
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    luts = np.stack(
        [qmat[:, s * sub : (s + 1) * sub] @ books[s].T for s in range(m)],
        axis=1,
    )
    probe_mask = probe_mask_for(qmat, cents, nprobe)
    probed_union = [int(l) for l in np.nonzero(probe_mask.any(axis=1))[0]]

    cands = store.select(
        F.col(id_col).alias("_i"), "codes", "list_id"
    ).filter(F.col("list_id").isin(probed_union))
    keep = k + local_margin

    def local_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.vstack(
                [np.asarray(c, dtype=np.int64) for c in pdf["codes"]]
            )
            nids = pdf["_i"].to_numpy()
            lists = pdf["list_id"].to_numpy()
            scores = np.zeros((len(cm), len(qids)), dtype=np.float64)
            for s in range(m):
                scores += luts[:, s, cm[:, s]].T
            allowed = probe_mask[lists]  # (n, nq)
            allowed &= nids[:, None] != qids[None, :]
            out_q, out_n, out_s = [], [], []
            for j in range(len(qids)):
                idx = np.nonzero(allowed[:, j])[0]
                if not len(idx):
                    continue
                sel = _half_up(scores[idx, j], rank_dp)
                take = idx[np.lexsort((nids[idx], -sel))[:keep]]
                out_q.extend([int(qids[j])] * len(take))
                out_n.extend(nids[take])
                out_s.extend(scores[take, j])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "approx_ip": out_s}
            )

    survivors = cands.mapInPandas(
        local_topk, "query_id long, neighbor_id long, approx_ip double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("approx_ip", rank_dp)), F.asc("neighbor_id")
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "approx_ip", "rank")
    )
