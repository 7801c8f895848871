"""Streaming ingest admission: the batch admission operators glued to a
Structured Streaming source.

A 100 TB training-data pipeline ingests continuously; admission (don't
re-admit content the corpus already has) must therefore run per
micro-batch against DURABLE state, not a static corpus snapshot. The
batch operators already define the semantics — incremental_new_docs
(exact, partition-pruned fingerprint store) and near_dup_new_docs
(MinHash cross-corpus) — so the stream side is a foreachBatch
composition: Structured Streaming owns WHICH files have been ingested
(checkpoint), the fingerprint store owns WHAT content exists.

State stays bounded by construction: the fingerprint store is ~32
bytes/doc of md5 partitioned into n_buckets, the stream checkpoint
holds file names only, and nothing is collected driver-side except the
batch's bucket set (incremental_new_docs' one contractual collect).
foreachBatch is at-least-once on failure; re-processing a batch is
harmless here because re-admitted fingerprints are already in the store
by then (the admission filter itself makes the sink idempotent — the
same property the reference's ON CONFLICT IGNORE loop relied on,
/root/reference/solardb.py:50-51).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.operators.dedup import (
    _store_fingerprint,
    incremental_new_docs,
    near_dup_new_docs,
    near_dup_new_docs_store,
    write_fingerprint_store,
    write_minhash_store,
)
from solarpaneldatawrangler_spark.operators.relational import dedup_by_key


def admit_batch(
    batch: DataFrame,
    store_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    near_dup_corpus: DataFrame | None = None,
    jaccard_threshold: float = 0.5,
    signature_store: str | None = None,
    with_exact_new: bool = False,
    **minhash_kwargs,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """One micro-batch through the full admission chain, cheapest gate
    first (the curate_corpus ordering contract):

    1. within-batch exact dedup — keep the min-id row per normalized
       fingerprint (a batch carrying the same doc twice must admit it
       once, which the store probe alone can't see);
    2. store probe — drop rows whose fingerprint the corpus already
       has (incremental_new_docs: bucket-pruned, O(batch) file reads);
    3. optional MinHash near-dup gate: against a corpus FRAME
       (``near_dup_corpus`` — exact-Jaccard verify, re-shingles the
       corpus each call) or against a persisted SIGNATURE STORE
       (``signature_store`` — near_dup_new_docs_store, estimator
       verify, the corpus text is never re-read; the scale path).

    Pure function of (batch, store): callers decide what to do with
    the admitted rows; streaming_admission writes them + appends their
    fingerprints (and signatures, when a signature store is in play).
    ``with_exact_new=True`` returns (admitted, exact_new) — exact_new
    is the stage-2 output, which streaming_admission fingerprints (the
    content was SEEN and decided even when the near-dup gate rejected
    it; see the retry analysis there).
    """
    if near_dup_corpus is not None and signature_store is not None:
        raise ValueError(
            "pass either near_dup_corpus (frame, exact verify) or "
            "signature_store (durable, estimator verify), not both"
        )
    b = dedup_by_key(
        batch.withColumn("_afp", _store_fingerprint(text_col)),
        ["_afp"],
        order_col=id_col,
    ).drop("_afp")
    exact_new = incremental_new_docs(
        b, store_path, text_col=text_col, id_col=id_col, n_buckets=n_buckets
    )
    fresh = exact_new
    if near_dup_corpus is not None:
        fresh = near_dup_new_docs(
            fresh,
            near_dup_corpus,
            text_col=text_col,
            id_col=id_col,
            jaccard_threshold=jaccard_threshold,
            **minhash_kwargs,
        )
    elif signature_store is not None:
        fresh = near_dup_new_docs_store(
            fresh,
            signature_store,
            text_col=text_col,
            id_col=id_col,
            sim_threshold=jaccard_threshold,
            max_bucket=minhash_kwargs.get("max_bucket"),
        )
    if with_exact_new:
        return fresh, exact_new
    return fresh


def streaming_admission(
    spark: SparkSession,
    source_dir: str,
    store_path: str,
    accepted_dir: str,
    checkpoint_dir: str,
    schema=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    near_dup_corpus: DataFrame | None = None,
    jaccard_threshold: float = 0.5,
    signature_store: str | None = None,
    **minhash_kwargs,
) -> None:
    """Run admission over everything pending in ``source_dir`` and stop
    (Trigger.AvailableNow — re-running picks up only new files; swap the
    trigger for a continuous ingest stream). Each micro-batch is
    admitted via admit_batch, the survivors are appended to
    ``accepted_dir`` as parquet, and their fingerprints are appended to
    the store so LATER batches (and later runs) reject them. Run
    compact_fingerprint_store periodically to keep probe cost at one
    file per bucket (its docstring has the file-rot math).

    ``signature_store`` enables the DURABLE near-dup gate: batches are
    probed against the persisted banded signatures
    (near_dup_new_docs_store) and each admitted batch's signatures are
    appended, so later batches reject near-twins of earlier admissions
    without the corpus text ever being re-read — the full O(batch)
    admission pair (exact fingerprints + MinHash signatures) as durable
    state. An absent store bootstraps on the first admitted batch.
    """
    if schema is None:
        schema = spark.read.parquet(source_dir).schema

    def handle(batch: DataFrame, batch_id: int) -> None:
        fresh, exact_new = admit_batch(
            batch,
            store_path,
            text_col=text_col,
            id_col=id_col,
            n_buckets=n_buckets,
            near_dup_corpus=near_dup_corpus,
            jaccard_threshold=jaccard_threshold,
            signature_store=signature_store,
            with_exact_new=True,
            **minhash_kwargs,
        )
        # multiple actions follow: checkpoint so admission computes once
        fresh = fresh.localCheckpoint()
        exact_new = exact_new.localCheckpoint()
        fresh.write.mode("append").parquet(accepted_dir)
        # RETRY ANALYSIS (at-least-once foreachBatch). Fingerprints are
        # appended for exact_new (stage-2 survivors), not just the
        # accepted rows: content the near-dup gate rejected was still
        # SEEN AND DECIDED, and marking it lets the cheap exact gate
        # short-circuit its future copies. Ordering: signatures (of the
        # accepted rows) append BEFORE fingerprints. Crash cases:
        # - before the signature append: retry reprocesses fully (the
        #   exact gate still admits), accepted rows append twice — the
        #   inherent at-least-once append-sink caveat;
        # - between the two appends: retry's exact gate still admits
        #   (no fingerprints yet), the near-dup gate drops the rows
        #   against their own just-written signatures, exact_new stays
        #   NONEMPTY, so the fingerprint append completes on retry and
        #   only duplicate signature rows remain (compaction collapses
        #   them; probes max over them);
        # - after both: the retried batch probes as fully known, no-op.
        # Nothing is ever skipped forever.
        if exact_new.limit(1).count():
            if signature_store is not None and fresh.limit(1).count():
                # _require_sig_meta: None = genuinely absent (bootstrap
                # with overwrite); data-without-meta RAISES — deciding
                # 'overwrite' there would wipe the accumulated store
                from solarpaneldatawrangler_spark.operators.dedup import (
                    _require_sig_meta,
                )

                mode = (
                    "append"
                    if _require_sig_meta(spark, signature_store) is not None
                    else "overwrite"
                )
                sig_kwargs = {
                    k: v
                    for k, v in minhash_kwargs.items()
                    if k in ("num_hashes", "bands", "shingle_k", "reproducible")
                }
                write_minhash_store(
                    fresh,
                    signature_store,
                    mode=mode,
                    text_col=text_col,
                    id_col=id_col,
                    **sig_kwargs,
                )
            write_fingerprint_store(
                exact_new,
                store_path,
                text_col=text_col,
                id_col=id_col,
                n_buckets=n_buckets,
                mode="append",
            )

    (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(handle)
        .start()
        .awaitTermination()
    )
