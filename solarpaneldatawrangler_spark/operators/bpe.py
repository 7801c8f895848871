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
    - Per iteration: one mapInPandas pass over the word table emits
      per-batch PARTIAL (a, b, count) adjacent-symbol-pair sums —
      each word re-segmented with the merges learned so far via the
      shared encode_word (per-task memo, same fixpoint-replace rule
      as every other path) — and the driver merges the partials and
      picks the (count DESC, pair lex ASC) best, exactly
      train_bpe_merges' tie-break. Partial rows are bounded by
      distinct symbol pairs (~symbol-vocab^2), not corpus size.
    - The merge list is the rebroadcast driver state; iteration i
      re-applies i-1 merges per word, so total work is
      O(vocab x n_merges^2) worst case — with the per-task word memo
      and a vocabulary far smaller than the corpus, this is the
      standard trade for never materializing evolving word states.

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


def _bpe_merge_loop(
    words: DataFrame, n_merges: int
) -> list[tuple[str, str]]:
    import pandas as pd

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        frozen = list(merges)

        def pair_counts(batches, _m=frozen):
            memo: dict[str, list[str]] = {}
            agg: Counter[tuple[str, str]] = Counter()
            for pdf in batches:
                for w, n in zip(pdf["w"], pdf["n"]):
                    toks = memo.get(w)
                    if toks is None:
                        toks = memo[w] = encode_word(w, _m)
                    for a, b in zip(toks, toks[1:]):
                        agg[(a, b)] += int(n)
            if agg:
                yield pd.DataFrame(
                    {
                        "a": [p[0] for p in agg],
                        "b": [p[1] for p in agg],
                        "c": list(agg.values()),
                    }
                )

        total: Counter[tuple[str, str]] = Counter()
        for r in words.mapInPandas(
            pair_counts, "a string, b string, c long"
        ).collect():
            total[(r["a"], r["b"])] += r["c"]
        if not total:
            break
        best, cnt = min(
            total.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        merges.append(best)
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
