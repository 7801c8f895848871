"""Streaming ingest admission (streaming/admission.py): within-batch
dedup, store rejection, cross-RUN rejection via the appended store, and
the near-dup gate."""

from __future__ import annotations

from solarpaneldatawrangler_spark.operators.dedup import (
    compact_fingerprint_store,
    write_fingerprint_store,
)
from solarpaneldatawrangler_spark.streaming.admission import (
    admit_batch,
    streaming_admission,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_admit_batch_chain(spark, tmp_path):
    store = str(tmp_path / "store")
    write_fingerprint_store(
        _docs(spark, [(0, "seed corpus document")]), store
    )
    batch = _docs(
        spark,
        [
            (10, "seed corpus document"),   # corpus dup -> rejected
            (11, "brand new document"),     # admitted
            (12, "brand new document"),     # within-batch dup -> dropped
            (13, "another new one"),        # admitted
        ],
    )
    got = sorted(r.doc_id for r in admit_batch(batch, store).collect())
    assert got == [11, 13]


def test_admit_batch_near_dup_gate(spark, tmp_path):
    store = str(tmp_path / "store")
    corpus = _docs(
        spark,
        [(0, "the quick brown fox jumps over the lazy dog every day")],
    )
    write_fingerprint_store(corpus, store)
    batch = _docs(
        spark,
        [
            # near-twin of the corpus doc (one token changed): exact
            # probe misses it, the MinHash gate must reject it
            (20, "the quick brown fox jumps over the lazy cat every day"),
            (21, "completely unrelated text about spark physical plans"),
        ],
    )
    got = sorted(
        r.doc_id
        for r in admit_batch(
            batch,
            store,
            near_dup_corpus=corpus,
            jaccard_threshold=0.4,
            # 1-row bands: a candidate needs only ONE matching minhash,
            # so the J~0.5 twin collides deterministically; the exact
            # Jaccard verify then separates twin from unrelated
            num_hashes=16,
            bands=16,
        ).collect()
    )
    assert got == [21]


def test_streaming_admission_two_runs(spark, tmp_path):
    """Run 1 admits new content; run 2 (new files, same checkpoint +
    store) rejects content admitted in run 1."""
    src = tmp_path / "incoming"
    src.mkdir()
    store = str(tmp_path / "store")
    accepted = str(tmp_path / "accepted")
    chk = str(tmp_path / "chk")

    write_fingerprint_store(_docs(spark, [(0, "preexisting doc")]), store)

    _docs(
        spark,
        [(1, "alpha doc"), (2, "preexisting doc"), (3, "alpha doc")],
    ).coalesce(1).write.parquet(str(src / "b1"))
    streaming_admission(
        spark, str(src / "*"), store, accepted, chk
    )
    got1 = sorted(r.doc_id for r in spark.read.parquet(accepted).collect())
    assert got1 == [1]  # min-id winner of the alpha pair; preexisting out

    # run 2: redelivers alpha (now in the store via the append) + new
    _docs(
        spark, [(4, "alpha doc"), (5, "beta doc")]
    ).coalesce(1).write.parquet(str(src / "b2"))
    streaming_admission(
        spark, str(src / "*"), store, accepted, chk
    )
    got2 = sorted(r.doc_id for r in spark.read.parquet(accepted).collect())
    assert got2 == [1, 5]

    # compaction keeps the store probe-able and the verdicts identical
    compact_fingerprint_store(spark, store)
    streaming_admission(
        spark, str(src / "*"), store, accepted, chk
    )  # nothing new pending: no-op
    assert sorted(
        r.doc_id for r in spark.read.parquet(accepted).collect()
    ) == [1, 5]


def test_streaming_admission_durable_signature_store(spark, tmp_path):
    """The durable near-dup gate: run 1 bootstraps the signature store
    from its admitted batch; run 2 rejects a NEAR-twin (suffix tweak —
    invisible to the exact fingerprint store) of run-1 content, while
    genuinely new content passes. Both stores carry state across runs."""
    src = tmp_path / "incoming"
    src.mkdir()
    store = str(tmp_path / "store")
    sig_store = str(tmp_path / "sig_store")
    accepted = str(tmp_path / "accepted")
    chk = str(tmp_path / "chk")

    base = "the solar panel array converts sunlight into power " * 4
    _docs(spark, [(1, base)]).coalesce(1).write.parquet(str(src / "b1"))
    streaming_admission(
        spark, str(src / "*"), store, accepted, chk,
        signature_store=sig_store, jaccard_threshold=0.6,
        num_hashes=16, bands=16,
    )
    assert sorted(
        r.doc_id for r in spark.read.parquet(accepted).collect()
    ) == [1]

    # run 2: a near-twin (new fingerprint!) + a novel doc
    _docs(
        spark,
        [(2, base + "extra"), (3, "completely different topic entirely " * 4)],
    ).coalesce(1).write.parquet(str(src / "b2"))
    streaming_admission(
        spark, str(src / "*"), store, accepted, chk,
        signature_store=sig_store, jaccard_threshold=0.6,
        num_hashes=16, bands=16,
    )
    assert sorted(
        r.doc_id for r in spark.read.parquet(accepted).collect()
    ) == [1, 3]


def test_rejected_near_dup_content_is_fingerprinted(spark, tmp_path):
    """Content the near-dup gate rejected was still SEEN: its exact
    fingerprint lands in the store, so a later exact re-delivery is
    cut by the cheap exact gate (and a retry that lost the race
    between the two store appends can always complete — the
    fingerprint append keys off stage-2 survivors, which self-matching
    signatures cannot empty)."""
    src = tmp_path / "incoming"
    src.mkdir()
    store = str(tmp_path / "store")
    sig_store = str(tmp_path / "sig_store")
    accepted = str(tmp_path / "accepted")
    chk = str(tmp_path / "chk")

    base = "the solar panel array converts sunlight into power " * 4
    _docs(spark, [(1, base)]).coalesce(1).write.parquet(str(src / "b1"))
    streaming_admission(
        spark, str(src / "*"), store, accepted, chk,
        signature_store=sig_store, jaccard_threshold=0.6,
        num_hashes=16, bands=16,
    )
    # run 2: a near-twin -> rejected by the signature gate, but its
    # fingerprint must still be recorded
    twin = base + "extra"
    _docs(spark, [(2, twin)]).coalesce(1).write.parquet(str(src / "b2"))
    streaming_admission(
        spark, str(src / "*"), store, accepted, chk,
        signature_store=sig_store, jaccard_threshold=0.6,
        num_hashes=16, bands=16,
    )
    assert sorted(
        r.doc_id for r in spark.read.parquet(accepted).collect()
    ) == [1]
    from solarpaneldatawrangler_spark.operators.dedup import (
        incremental_new_docs,
    )

    redelivery = _docs(spark, [(3, twin)])
    # the EXACT gate alone rejects the re-delivered twin text
    assert incremental_new_docs(redelivery, store).count() == 0
