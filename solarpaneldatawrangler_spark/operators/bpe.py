"""Learned byte-pair-encoding subword tokenizer (Sennrich, Haddow,
Birch 2016, "Neural Machine Translation of Rare Words with Subword
Units") — train on a bounded sample driver-side, apply distributed.

The reference pipeline counts whitespace/regex tokens; a training-data
engine also needs the REAL thing models train on: a learned subword
vocabulary. Same deployment contract as the IVF/PQ quantizers: the
merge table trains once on a bounded deterministic sample (tokenizer
training corpora are samples by construction), ships as ~N small string
pairs, and the distributed encode is a map-only stage over the scan.

Merge-application semantics (shared EXACTLY by the trainer, the Spark
encoder, and the SQL oracle): a word is the string
``' ' + ' '.join(chars) + ' '``; each merge (a, b) is applied as the
plain (non-regex) replacement ``' a b ' -> ' ab '`` REPEATED until the
pattern no longer occurs, merges in learned order. The boundary spaces
make cross-token false matches impossible ('ab c' cannot match pattern
' b c '), and the repeat-until-fixpoint rule recovers the occurrences
a single left-to-right replacement pass loses to consumed separator
spaces. Plain string replacement exists identically in Python, Spark,
and DuckDB, which is what makes the encode SQL-replayable (q51's
merged bpe columns replay it with a recursive CTE over the merge
index).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_state(word: str) -> str:
    return " " + " ".join(word) + " "


def _apply_merge(s: str, pat: str, rep: str) -> str:
    while pat in s:
        s = s.replace(pat, rep)
    return s


def train_bpe_merges(
    texts: Iterable[str], n_merges: int = 64
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from an in-memory sample.

    Deterministic: word frequencies via the same lowercase-whitespace
    tokenizer as functions.text.tokens; each round merges the
    (count DESC, pair lexicographically ASC) best adjacent symbol pair;
    application uses the shared fixpoint-replace rule, so training and
    encoding can never disagree about segmentation. Stops early if no
    pair occurs twice (nothing left worth merging)."""
    freq: Counter[str] = Counter()
    for t in texts:
        for w in (t or "").lower().split():
            freq[w] += 1
    return _train_from_counts(freq, n_merges)


def _train_from_counts(
    freq: Counter, n_merges: int
) -> list[tuple[str, str]]:
    """The trainer's core over a (word -> count) table — shared by the
    in-memory sample trainer above and the distributed trainer's
    small-vocabulary fast path (the word table IS the model input;
    where it came from doesn't change a single tie-break)."""
    states = {w: _word_state(w) for w in freq}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for w, s in states.items():
            toks = s.split()
            n = freq[w]
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best, cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        a, b = best
        pat, rep = f" {a} {b} ", f" {a}{b} "
        merges.append((a, b))
        states = {
            w: (_apply_merge(s, pat, rep) if pat in s else s)
            for w, s in states.items()
        }
    return merges


# vocabulary-size cutoff for the driver-local training fast path in
# train_bpe_merges_distributed — the size-aware strategy shared with
# clustering.LOCAL_CC_MAX_NODES: 200k distinct (word, n) rows collect
# as a few MB; below it the 24-iteration pair-count loop is pure
# scheduler overhead vs one in-memory solve with identical tie-breaks.
LOCAL_BPE_MAX_WORDS = 200_000


def train_bpe_merges_distributed(
    df: DataFrame,
    n_merges: int = 64,
    text_col: str = "text",
    local_max_words: int = LOCAL_BPE_MAX_WORDS,
) -> list[tuple[str, str]]:
    """Learn BPE merges from the WHOLE corpus — the 100 TB trainer that
    removes ``bpe_merges_for_dir``'s sample bound, in the
    kmeans_fit / train_hashed_linear loop shape (similarity.py:932,
    curation.py:133): bounded model state lives on the DRIVER, each
    iteration is one narrow partial-aggregate pass, the corpus text is
    read exactly once.

    Plan shape:
    - ONE corpus pass builds the word-frequency table (mapInPandas
      partial (word, n) counts per Arrow batch — the Zipf head
      collapses inside each task — then a combinable SUM groupBy on
      the word key). The table is localCheckpoint'ed: every training
      iteration reads cached (word, n) rows, never the corpus. Its
      size is the DISTINCT vocabulary, orders of magnitude below the
      corpus.
    - Per iteration (r16-opt, see _bpe_merge_loop): one pure-JVM pass
      over the MATERIALIZED word-state table applies the newly learned
      merge (literal replace-all passes, _apply_merge's exact
      semantics, residual-checked) and emits map-side-combined
      (a, b, count) adjacent-pair sums; the driver merges partials and
      picks the (count DESC, pair lex ASC) best, exactly
      train_bpe_merges' tie-break. Partial rows are bounded by
      distinct symbol pairs (~symbol-vocab^2), not corpus size. The
      evolving states ARE materialized (localCheckpoint per round, the
      CC-loop idiom) so iteration i applies 1 merge, not i —
      O(vocab x n_merges) total work, and no Python boundary inside
      the loop (a measured ~0.19 s fixed cost per mapInPandas job that
      the old re-encode-from-scratch loop paid every iteration).

    Word counting runs through Python's ``str.lower().split()`` — the
    SAME tokenizer as train_bpe_merges and bpe_encode (NOT the JVM
    tokens(), whose Java \\s is ASCII-only) — so the distributed and
    driver trainers produce IDENTICAL merge tables on any corpus
    (pinned by tests/test_bpe.py's consistency test), and integer
    counts make the partial-aggregation order irrelevant (no float-Z
    concern).

    Stops early when no pair occurs twice, like the driver trainer.
    """
    import pandas as pd

    def word_counts(batches):
        agg: Counter[str] = Counter()
        for pdf in batches:
            for t in pdf["_t"]:
                agg.update((t or "").lower().split())
        if agg:
            yield pd.DataFrame(
                {"w": list(agg.keys()), "n": list(agg.values())}
            )

    words = (
        df.select(F.col(text_col).alias("_t"))
        .mapInPandas(word_counts, "w string, n long")
        .groupBy("w")
        .agg(F.sum("n").alias("n"))
        .localCheckpoint()
    )

    try:
        # size-aware routing (the clustering LOCAL_CC_MAX_NODES
        # analogy, r11): the word table — not the corpus — is the
        # model input, so when the DISTINCT vocabulary fits the driver
        # the whole training runs in memory via the exact same
        # _train_from_counts core the sample trainer uses; tie-breaks,
        # early-stop, everything identical (consistency-tested). At
        # 100 TB vocabularies (URL/typo heavy tails) the iterative
        # pair-count loop runs unchanged; pass local_max_words=0 to
        # pin it (the bench extra does, to keep the loop measured).
        if local_max_words and words.count() <= local_max_words:
            from solarpaneldatawrangler_spark.operators.guards import (
                assert_bounded_collect,
            )

            rows = assert_bounded_collect(
                words.collect(), local_max_words, "BPE vocab"
            )
            freq: Counter[str] = Counter({r["w"]: int(r["n"]) for r in rows})
            return _train_from_counts(freq, n_merges)
        return _bpe_merge_loop(words, n_merges)
    finally:
        # the checkpointed word table is loop-internal state: release
        # its blocks so a long-lived session (bench, notebook) doesn't
        # carry them past training
        words.unpersist()


def _pair_count_rows(states: DataFrame, residual_pat: str | None):
    """One distributed pass: adjacent symbol-pair counts (weighted by
    word frequency) over the materialized state strings, as pure JVM
    expressions — split / transform / explode / map-side-combined SUM.

    r16-opt (guide §4): the previous loop body was a mapInPandas that
    re-encoded every word from scratch each iteration. The Python
    boundary costs a measured ~0.19 s of fixed latency per job on this
    box (worker handshake + Arrow stream setup; the 31-row payload
    itself is microseconds) — 24 iterations paid it 24 times. The JVM
    pass runs the same count in ~0.06 s/job.

    ``residual_pat``: when set, any state still containing the pattern
    appends a (NULL, NULL) marker pair — the driver's signal that the
    bounded literal-replace chain has not reached the fixpoint
    ``_apply_merge``'s while-loop would (rare: only chains like
    ' a b a b ' that re-form the pattern across a consumed separator
    need more passes). Real pairs can never be NULL, so the marker
    cannot collide."""
    # ONE selectExpr string, parsed JVM-side in a single py4j call (the
    # r15 minhash chatter lesson: composing this tree from Column ops
    # measured ~0.12 s of driver build time PER ITERATION — half the
    # loop's cost). The token array is let-bound via the transform-of-
    # array trick (the q52 O(m^2) class): element_at(tk, i) inside the
    # per-pair lambda must reference a bound variable, not re-split s.
    empty = "cast(array() as array<struct<a:string,b:string>>)"
    pairs_sql = (
        "transform(array(split(trim(s), ' ')), tk -> "
        "case when size(tk) >= 2 then "
        "transform(sequence(1, size(tk) - 1), i -> "
        "struct(element_at(tk, i) as a, element_at(tk, i + 1) as b)) "
        f"else {empty} end)[0]"
    )
    base = states.selectExpr("n", "s", f"{pairs_sql} as _pairs")
    if residual_pat is not None:
        # the pattern is corpus-derived — keep it OUT of the SQL string
        # (no escaping risk); a handful of Column calls is cheap
        marker = F.when(
            F.col("s").contains(F.lit(residual_pat)),
            F.array(
                F.struct(
                    F.lit(None).cast("string").alias("a"),
                    F.lit(None).cast("string").alias("b"),
                )
            ),
        ).otherwise(F.expr(empty))
        base = base.withColumn("_pairs", F.concat(F.col("_pairs"), marker))
    return (
        base.select(F.explode("_pairs").alias("p"), F.col("n"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("n").alias("c"))
        .collect()
    )


# literal-replace passes applied per merge before the driver checks the
# residual marker; 3 covers every observed chain, and the check makes
# more passes a correctness non-event (just another cheap job)
_BPE_FIX_PASSES = 3


def _bpe_merge_loop(
    words: DataFrame, n_merges: int
) -> list[tuple[str, str]]:
    """Distributed BPE merge loop over the (w, n) word table.

    r16-opt rewrite — two changes, outputs bit-identical (consistency
    test + adversarial fixpoint tests):

    - **Incremental states instead of re-encoding.** The word states
      (' a b c '-style symbol strings) are materialized with
      localCheckpoint; iteration i applies ONLY the newly learned merge
      (JVM literal replace, the same replace-all-pass semantics as
      ``_apply_merge``) instead of re-applying all i merges per word —
      O(vocab x n_merges) total work instead of O(vocab x n_merges^2),
      exactly the incremental update the driver-local
      ``_train_from_counts`` does with its states dict.
    - **No Python boundary in the loop.** Pair counting is pure JVM
      expressions (see ``_pair_count_rows``); each iteration is one job
      that materializes the new state checkpoint and returns the
      bounded (a, b, count) partials. Fixpoint safety: the bounded
      replace chain is re-extended whenever the residual marker fires,
      so the composition of replace-all passes equals ``_apply_merge``'s
      while-loop for every word.
    """
    if n_merges <= 0:
        return []
    merges: list[tuple[str, str]] = []
    spark = words.sparkSession
    # initial states: ' '-joined code points. F.split(w, '') yields one
    # element per code point exactly like Python's str iteration
    # (verified on astral/combining/NUL chars in test_bpe.py)
    states = words.select(
        "w",
        F.concat(
            F.lit(" "), F.array_join(F.split(F.col("w"), ""), " "), F.lit(" ")
        ).alias("s"),
        "n",
    ).localCheckpoint(eager=False)
    dead: list[DataFrame] = []

    def count(st: DataFrame, pat: str | None) -> Counter:
        total: Counter[tuple[str, str]] = Counter()
        residual = False
        for r in _pair_count_rows(st, pat):
            if r["a"] is None and r["b"] is None:
                residual = True
            else:
                total[(r["a"], r["b"])] += r["c"]
        return total, residual

    # loop-conf right-sizing (the CC _min_label_loop idiom, guide §2.2):
    # the loop shuffles the SAME small pair relation n_merges times, so
    # per-partition fixed cost is multiplied by rounds. Derive the
    # reduce-partition count from the word table's own partitioning
    # (known without a job: the RDD is checkpointed) — 1 for a coalesced
    # small vocab, the session conf for a 100 TB vocabulary. AQE is off
    # only in the single-partition degenerate geometry, where it has
    # nothing to coalesce and only adds a replanning pause per job.
    conf_key = "spark.sql.shuffle.partitions"
    aqe_key = "spark.sql.adaptive.enabled"
    orig_parts = spark.conf.get(conf_key)
    orig_aqe = spark.conf.get(aqe_key)
    try:
        orig_num = int(orig_parts)
    except (TypeError, ValueError):
        orig_num = spark.sparkContext.defaultParallelism
    loop_parts = max(1, min(orig_num, words.rdd.getNumPartitions()))
    try:
        spark.conf.set(conf_key, str(loop_parts))
        if loop_parts == 1:
            spark.conf.set(aqe_key, "false")
        total, _ = count(states, None)
        while True:
            if not total:
                break
            best, cnt = min(
                total.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            if cnt < 2:
                break
            merges.append(best)
            if len(merges) >= n_merges:
                break
            a, b = best
            pat, rep = f" {a} {b} ", f" {a}{b} "
            new_s = F.col("s")
            for _ in range(_BPE_FIX_PASSES):
                new_s = F.replace(new_s, F.lit(pat), F.lit(rep))
            while True:
                nxt = states.select(
                    "w", new_s.alias("s"), "n"
                ).localCheckpoint(eager=False)
                total, residual = count(nxt, pat)  # materializes nxt
                dead.append(states)
                states = nxt
                if not residual:
                    break
                # fixpoint not reached within the bounded passes for
                # some word: extend by one more replace-all pass
                new_s = F.replace(F.col("s"), F.lit(pat), F.lit(rep))
    finally:
        spark.conf.set(conf_key, orig_parts)
        spark.conf.set(aqe_key, orig_aqe)
        for df in (*dead, states):
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001 — best-effort block release
                pass
    return merges


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Encode one (lowercased) word with the learned merges — the
    reference implementation of the shared semantics."""
    s = _word_state(word)
    for a, b in merges:
        s = _apply_merge(s, f" {a} {b} ", f" {a}{b} ")
    return s.split()


_DIR_MERGES: dict[tuple, list[tuple[str, str]]] = {}


def bpe_merges_for_dir(
    sf_dir: str, n_merges: int = 64, sample_cap: int = 2048
) -> list[tuple[str, str]]:
    """Train merges straight off ``{sf_dir}/documents.parquet`` with
    pyarrow (no Spark session) — the ivf_centroids_for_dir idiom, so the
    DuckDB oracle embeds the IDENTICAL merge table. Sample = the first
    ``sample_cap`` docs by doc_id. Memoized per (dir, params)."""
    key = (sf_dir, n_merges, sample_cap)
    got = _DIR_MERGES.get(key)
    if got is None:
        import numpy as np
        import pyarrow.parquet as pq_

        t = pq_.read_table(
            f"{sf_dir.rstrip('/')}/documents.parquet",
            columns=["doc_id", "text"],
        )
        order = np.argsort(t.column("doc_id").to_numpy(), kind="stable")[
            :sample_cap
        ]
        # take() the sampled rows BEFORE materializing to Python —
        # to_pylist() on the full column would copy every doc's text
        # driver-side just to keep sample_cap of them
        texts = t.column("text").take(order).to_pylist()
        got = _DIR_MERGES[key] = train_bpe_merges(texts, n_merges)
    return got


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, bpe_text, n_bpe): each doc's learned-BPE segmentation.
    ``bpe_text`` joins each word's subword tokens with ' ' and words
    with ' | ' (so the full segmentation is pinned by one string);
    ``n_bpe`` is the total subword-token count — the number a training
    cost estimate actually needs.

    Plan shape (100 TB): map-only — one mapInPandas stage fused with
    the scan, no shuffle. The merge table rides the UDF closure (a few
    KB). A per-TASK word cache (iterator closure, shared across that
    task's Arrow batches) collapses the Zipf head: each distinct word
    is encoded once per task, not once per occurrence."""
    import pandas as pd

    frozen = list(merges)
    src = df.select(F.col(id_col).alias("_i"), F.col(text_col).alias("_t"))

    def encode(batches):
        cache: dict[str, str] = {}

        def enc_word(w: str) -> str:
            got = cache.get(w)
            if got is None:
                got = cache[w] = " ".join(encode_word(w, frozen))
            return got

        for pdf in batches:
            if not len(pdf):
                continue
            outs, counts = [], []
            for t in pdf["_t"]:
                words = (t or "").lower().split()
                encoded = [enc_word(w) for w in words]
                outs.append(" | ".join(encoded))
                counts.append(sum(e.count(" ") + 1 for e in encoded) if encoded else 0)
            yield pd.DataFrame(
                {"_i": pdf["_i"], "bpe_text": outs, "n_bpe": counts}
            )

    return src.mapInPandas(
        encode, "_i long, bpe_text string, n_bpe long"
    ).select(F.col("_i").alias(id_col), "bpe_text", "n_bpe")


def bpe_merges_values_sql(merges: list[tuple[str, str]]) -> str:
    """The merge table as a SQL VALUES body (idx, pat, rep) for the
    recursive-CTE replay: idx is 1-based learned order, pat/rep are the
    literal fixpoint-replace strings."""
    rows = []
    for i, (a, b) in enumerate(merges):
        pat = f" {a} {b} ".replace("'", "''")
        rep = f" {a}{b} ".replace("'", "''")
        rows.append(f"({i + 1}, '{pat}', '{rep}')")
    return ",\n".join(rows)
