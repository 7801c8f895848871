"""CI coverage for the sf1 sweep's data-generation recipe (r12): drive
scripts.sf1_sweep.generate — the EXACT production code path — from
sf0.001 into a tmp dir and assert the invariants the sweep's evidence
rests on. DuckDB-only, no Spark session."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from sf1_sweep import COPY_VERBATIM, ID_COLS, K, generate  # noqa: E402

BASE = "/root/testdata/sf0.001"
N_REP = 3


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf1gen") / "out")
    generate(base_dir=BASE, out_dir=out, replicas=N_REP)
    return out


def _con(gen_dir):
    con = duckdb.connect()
    for t in list(ID_COLS) + COPY_VERBATIM + ["documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW base_{t} AS SELECT * FROM read_parquet('{BASE}/{t}.parquet')"
        )
        con.execute(
            f"CREATE VIEW gen_{t} AS SELECT * FROM read_parquet('{gen_dir}/{t}.parquet')"
        )
    return con


def test_row_counts_and_dims(gen_dir):
    con = _con(gen_dir)
    for t in list(ID_COLS) + ["documents", "embeddings"]:
        nb = con.execute(f"SELECT count(*) FROM base_{t}").fetchone()[0]
        ng = con.execute(f"SELECT count(*) FROM gen_{t}").fetchone()[0]
        assert ng == N_REP * nb, t
    for t in COPY_VERBATIM:  # dims don't scale (TPC-H semantics)
        b = con.execute(f"SELECT * FROM base_{t} ORDER BY 1").fetchall()
        g = con.execute(f"SELECT * FROM gen_{t} ORDER BY 1").fetchall()
        assert b == g, t


def test_replica_zero_is_verbatim_and_keys_disjoint(gen_dir):
    con = _con(gen_dir)
    for t, cols in {
        **ID_COLS, "documents": ["doc_id"], "embeddings": ["vec_id"],
    }.items():
        key = cols[0]
        # replica 0 rows == base rows, byte-for-byte
        diff = con.execute(
            f"SELECT count(*) FROM ((SELECT * FROM gen_{t} WHERE {key} < {K})"
            f" EXCEPT (SELECT * FROM base_{t}))"
        ).fetchone()[0]
        assert diff == 0, f"{t}: replica 0 drifted from base"
        # primary-ish keys stay unique per replica band (no collisions)
        if t in ("customer", "orders", "part", "supplier", "documents",
                 "embeddings", "events"):
            n, d = con.execute(
                f"SELECT count(*), count(DISTINCT {key}) FROM gen_{t}"
            ).fetchone()
            assert n == d, f"{t}.{key} collided across replicas"


def test_fk_joins_scale_exactly(gen_dir):
    con = _con(gen_dir)
    pairs = [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ]
    for ft, fk, dt, dk in pairs:
        nb = con.execute(
            f"SELECT count(*) FROM base_{ft} f JOIN base_{dt} d ON f.{fk} = d.{dk}"
        ).fetchone()[0]
        ng = con.execute(
            f"SELECT count(*) FROM gen_{ft} f JOIN gen_{dt} d ON f.{fk} = d.{dk}"
        ).fetchone()[0]
        assert ng == N_REP * nb, (
            f"{ft}->{dt}: uniform shift broke FK scaling ({ng} != "
            f"{N_REP}x{nb})"
        )


def test_documents_transform_invariants(gen_dir):
    con = _con(gen_dir)
    # n_chars == length(text) everywhere in the generated data
    bad = con.execute(
        "SELECT count(*) FROM gen_documents WHERE n_chars != length(text)"
    ).fetchone()[0]
    assert bad == 0
    # the word map is injective per replica: distinct-token count per
    # replica equals the base distinct-token count (suffix collisions
    # would merge tokens and shrink it)
    base_distinct = con.execute(
        r"""SELECT count(DISTINCT t) FROM (
            SELECT unnest(string_split_regex(text, '\s+')) AS t
            FROM base_documents) WHERE len(t) > 0"""
    ).fetchone()[0]
    for r in range(N_REP):
        lo, hi = r * K, (r + 1) * K
        d = con.execute(
            rf"""SELECT count(DISTINCT t) FROM (
                SELECT unnest(string_split_regex(text, '\s+')) AS t
                FROM gen_documents WHERE doc_id >= {lo} AND doc_id < {hi})
                WHERE len(t) > 0"""
        ).fetchone()[0]
        assert d == base_distinct, f"replica {r}: token map not injective"
    # replicas don't share tokens (no fabricated cross-replica near-dups)
    shared = con.execute(
        rf"""WITH tok AS (
            SELECT doc_id // {K} AS rep,
                   unnest(string_split_regex(text, '\s+')) AS t
            FROM gen_documents)
        SELECT count(*) FROM (
            SELECT t FROM tok WHERE len(t) > 0
            GROUP BY t HAVING count(DISTINCT rep) > 1)"""
    ).fetchone()[0]
    assert shared == 0


def test_generate_skips_existing_and_rejects_oversize_keys(
    gen_dir, tmp_path, capsys
):
    # idempotency: second call without force is a loud no-op
    generate(base_dir=BASE, out_dir=gen_dir, replicas=N_REP)
    assert "skipping" in capsys.readouterr().out
    # a base table with keys >= K must refuse to generate
    big = tmp_path / "badbase"
    big.mkdir()
    con = duckdb.connect()
    for t in list(ID_COLS) + COPY_VERBATIM + ["documents", "embeddings"]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{BASE}/{t}.parquet')) "
            f"TO '{big}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.execute(
        f"""COPY (
            SELECT doc_id + {K} AS doc_id, text, lang, source, n_chars
            FROM read_parquet('{BASE}/documents.parquet')
        ) TO '{big}/documents.parquet' (FORMAT PARQUET)"""
    )
    with pytest.raises(AssertionError, match="doc_id"):
        generate(base_dir=str(big), out_dir=str(tmp_path / "badout"),
                 replicas=N_REP)


def test_embeddings_transform_invariants(gen_dir):
    """r13 (the sf10 probe's clone-artifact fix): replica r>0 vectors
    are component sign-flips of the base — diag(±1) is orthogonal, so
    every intra-replica cosine/norm/dot is EXACTLY preserved, while
    cross-replica exact clones are gone (no fabricated near-dup
    clusters growing quadratically in replicas)."""
    con = _con(gen_dir)
    # schema preserved: element type stays FLOAT
    typ = con.execute(
        "DESCRIBE SELECT embedding FROM gen_embeddings"
    ).fetchall()[0][1]
    assert typ == "FLOAT[]"
    # per-replica: |component| pattern identical to base (sign flip
    # only), so norms are bit-identical
    bad = con.execute(
        f"""SELECT count(*) FROM gen_embeddings g
        JOIN base_embeddings b ON b.vec_id = g.vec_id % {K}
        WHERE list_transform(g.embedding, x -> abs(x))
              != list_transform(b.embedding, x -> abs(x))"""
    ).fetchone()[0]
    assert bad == 0, "sign-flip transform changed a component magnitude"
    # replica 0 verbatim
    drift = con.execute(
        f"""SELECT count(*) FROM gen_embeddings g
        JOIN base_embeddings b ON b.vec_id = g.vec_id
        WHERE g.vec_id < {K} AND g.embedding != b.embedding"""
    ).fetchone()[0]
    assert drift == 0
    # cross-replica clones are decorrelated: no identical embedding
    # spans two replicas (within-replica base duplicates are preserved
    # by design). 64 md5-seeded signs per replica -> accidental
    # identical-pattern odds ~2^-64 per replica pair.
    dup = con.execute(
        f"""SELECT count(*) FROM (
            SELECT embedding FROM gen_embeddings
            GROUP BY embedding
            HAVING count(DISTINCT vec_id // {K}) > 1)"""
    ).fetchone()[0]
    assert dup == 0, "an embedding is cloned verbatim across replicas"
