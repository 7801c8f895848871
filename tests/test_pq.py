"""Product quantization (operators/pq): quantization properties,
ADC-vs-exact recall and score fidelity on the driver embeddings, plan
shape (encode is map-only)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.operators.pq import (
    pq_adc_topk,
    pq_codebooks_for_dir,
    pq_encode,
    train_pq_codebooks,
)
from solarpaneldatawrangler_spark.sources.star import load_table


@pytest.fixture(scope="module")
def books(sf_dir):
    return pq_codebooks_for_dir(sf_dir)


def _emb_matrix(sf_dir):
    import pyarrow.parquet as pq_

    t = pq_.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.asarray(t.column("vec_id").to_numpy())
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    return ids[order], mat[order]


def test_codebook_shape_and_determinism(sf_dir, books):
    assert len(books) == 8
    assert all(len(b) == 16 for b in books)
    assert all(len(c) == 8 for b in books for c in b)
    # memoized AND retrain-deterministic
    ids, mat = _emb_matrix(sf_dir)
    again = train_pq_codebooks(mat[:4096], m=8, ks=16)
    assert again == books


def test_identical_vectors_get_identical_codes(spark, books):
    ids, mat = _emb_matrix("/root/testdata/sf0.01")
    rows = [(1, mat[0].tolist()), (2, mat[0].tolist()), (3, mat[1].tolist())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: list(r["codes"]) for r in pq_encode(df, books).collect()}
    assert got[1] == got[2]
    assert len(got[1]) == 8 and all(0 <= c < 16 for c in got[1])


def test_adc_score_fidelity_and_recall(spark, sf_dir, books):
    """ADC approximates the exact inner product well enough that (a)
    scores are close in absolute terms and (b) top-10 recall vs the
    exact-IP ranking clears a floor — the PQ usefulness contract."""
    ids, mat = _emb_matrix(sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = pq_adc_topk(pq_encode(emb, books), queries, books, k=10).collect()

    qmat = mat[np.isin(ids, range(5))]
    exact_ip = qmat @ mat.T  # (5, N)
    scale = float(np.abs(exact_ip).mean())
    recalls = []
    for q in range(5):
        ip = exact_ip[q].copy()
        ip[ids == q] = -np.inf  # self-match excluded
        exact_top = set(ids[np.argsort(-ip, kind="stable")[:10]].tolist())
        got_rows = [r for r in out if r["query_id"] == q]
        assert len(got_rows) == 10
        got_top = {r["neighbor_id"] for r in got_rows}
        recalls.append(len(exact_top & got_top) / 10)
        for r in got_rows:
            true = float(
                (mat[ids == q] @ mat[ids == r["neighbor_id"]].T).item()
            )
            assert abs(r["approx_ip"] - true) < 2.0 * scale
    assert np.mean(recalls) >= 0.3, recalls


def test_pq_encode_is_map_only(spark, sf_dir, books):
    emb = load_table(spark, sf_dir, "embeddings")
    plan = (
        pq_encode(emb, books)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # codes ride along with the scan


def test_ivfpq_store_search_and_pruning(spark, sf_dir, books, tmp_path):
    """The IVFPQ store drops raw embeddings, the probed-list filter
    prunes partitions at the scan, and the search equals an exact
    driver-side numpy replay of the same semantics."""
    from solarpaneldatawrangler_spark.operators.pq import (
        ivfpq_topk,
        write_ivfpq_store,
    )
    from solarpaneldatawrangler_spark.operators.similarity import (
        _half_up,
        ivf_centroids_for_dir,
        probe_mask_for,
    )
    from solarpaneldatawrangler_spark.sources.star import load_table

    cents = ivf_centroids_for_dir(sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivfpq")
    write_ivfpq_store(emb, path, cents, books)
    store = spark.read.parquet(path)
    assert "embedding" not in store.columns  # codes-only layout

    queries = emb.filter(F.col("vec_id") < 5)
    got = ivfpq_topk(store, queries, cents, books, k=10, nprobe=2).collect()

    # partition pruning: the probed-list filter reads fewer files
    ids, mat = _emb_matrix(sf_dir)
    qmat = mat[np.isin(ids, range(5))]
    mask = probe_mask_for(qmat, np.array(cents), nprobe=2)
    probed = [int(l) for l in np.nonzero(mask.any(axis=1))[0]]
    import glob

    all_files = glob.glob(f"{path}/list_id=*/*.parquet")
    probed_files = [
        f
        for l in probed
        for f in glob.glob(f"{path}/list_id={l}/*.parquet")
    ]
    assert 0 < len(probed_files) < len(all_files), (
        len(probed_files),
        len(all_files),
    )

    # exact numpy replay: same assignment, codes, LUT sum, ordering
    cents_np = np.array(cents, dtype=np.float64)
    books_np = [np.array(b, dtype=np.float64) for b in books]
    m, sub = len(books_np), books_np[0].shape[1]
    lists = np.argmax(
        mat @ cents_np.T - 0.5 * (cents_np * cents_np).sum(axis=1)[None, :],
        axis=1,
    )
    codes = np.empty((len(mat), m), dtype=np.int64)
    for s, B in enumerate(books_np):
        codes[:, s] = np.argmax(
            mat[:, s * sub : (s + 1) * sub] @ B.T
            - 0.5 * (B * B).sum(axis=1)[None, :],
            axis=1,
        )
    for qj, qid in enumerate(range(5)):
        lut = np.stack(
            [qmat[qj, s * sub : (s + 1) * sub] @ books_np[s].T for s in range(m)]
        )
        scores = np.zeros(len(mat))
        for s in range(m):
            scores += lut[s, codes[:, s]]
        ok = mask[lists, qj] & (ids != qid)
        idx = np.nonzero(ok)[0]
        order = idx[np.lexsort((ids[idx], -_half_up(scores[idx], 4)))[:10]]
        want = [(int(ids[i]), round(float(_half_up(scores[i], 4)), 4)) for i in order]
        got_rows = sorted(
            (r for r in got if r["query_id"] == qid), key=lambda r: r["rank"]
        )
        have = [
            (r["neighbor_id"], round(float(_half_up(r["approx_ip"], 4)), 4))
            for r in got_rows
        ]
        assert have == want, f"query {qid}"
