"""Extension operators for large-scale training-data pipelines
(SURVEY.md §2.12, driver mandate): dedup (exact / MinHash-LSH / SimHash
/ n-gram Jaccard), embedding similarity search, text analysis, and
multimodal binary-column plumbing — over the documents / embeddings
tables, each with a DuckDB oracle where SQL can express it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.functions.rounding import (
    round_ratio_half_away,
    round_ratio_half_away_sql,
)
from solarpaneldatawrangler_spark.functions.text import (
    gopher_flags_sql,
    quality_score,
    tokens,
)
from solarpaneldatawrangler_spark.operators.curation import (
    hashed_linear_score_r6_sql,
    hashed_linear_score_sql,
)
from solarpaneldatawrangler_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dup_pairs,
)
from solarpaneldatawrangler_spark.operators.similarity import (
    brute_force_topk,
    lsh_bucketed_topk,
)
from solarpaneldatawrangler_spark.functions.text import EN_STOPWORDS, word_shingles
from solarpaneldatawrangler_spark.plans.catalog import register
from solarpaneldatawrangler_spark.sources.star import load_table

# DuckDB fragment: whitespace tokens of lowercased text, empties dropped
_SQL_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0)"

# the eight gopher_flags struct fields, in declaration order (shared
# with the q53 merge and its oracle columns)
_GOPHER_RULES = [
    "words_ok", "mwl_ok", "hash_ok", "ellipsis_sym_ok",
    "bullet_ok", "ellipsis_ok", "alpha_ok", "stopword_ok",
]


# --- exact dedup (hash-groupBy) + paragraph dedup (merged r7) ----------------

# The driver documents are single-line, so the paragraph-dedup half runs
# on a DERIVED two-paragraph corpus built identically in both engines
# (doc i = text_i + blank line + text_{i+7}: every source text occurs as
# a paragraph in two docs — real cross-doc duplication). Same derivation
# as tests/test_paragraph_mixture.py and bench's x_paragraph_dedup.
# the paragraph split/normalize regexes interpolate from dedup.py's
# explicit-whitespace constants (Java \s vs RE2 \s diverge on \x0B) —
# the oracle replays the EXACT strings the Spark splitter compiles
from solarpaneldatawrangler_spark.operators.dedup import (  # noqa: E402
    PARA_SEP_RE,
    PARA_WS_RE,
)

# q81-absorption fragment (r10): the corpus-diff content fingerprint —
# identical to the exact-dedup store fingerprint, NULL->'' first
# (normalization via the ONE shared builder so spellings can't drift)
from solarpaneldatawrangler_spark.functions.text import (  # noqa: E402
    norm_text_sql,
    norm_toks_sql,
)

_DIFF_FP = f"md5({norm_text_sql()})"

_PARA_CTES = f"""
    built AS (
        SELECT a.doc_id,
               a.text || chr(10) || chr(10) || COALESCE(b.text, '') AS text
        FROM documents a LEFT JOIN documents b ON b.doc_id = a.doc_id + 7
    ),
    paras0 AS (
        SELECT doc_id,
               generate_subscripts(l, 1) - 1 AS pos,
               unnest(l) AS para
        FROM (SELECT doc_id,
                     string_split_regex(text, '{PARA_SEP_RE}') AS l
              FROM built)
    ),
    paras AS (
        SELECT doc_id, pos, para,
               md5(regexp_replace(trim(lower(para)), '{PARA_WS_RE}', ' ', 'g')) AS fp
        FROM paras0
        WHERE regexp_replace(trim(lower(para)), '{PARA_WS_RE}', ' ', 'g') <> ''
    ),
    pranked AS (
        SELECT doc_id, pos, para,
               ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id, pos) AS rn
        FROM paras
    ),
    rebuilt AS (
        SELECT doc_id,
               COUNT(*) AS n_kept,
               string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text
        FROM pranked WHERE rn = 1
        GROUP BY doc_id
    ),
    ptotals AS (SELECT doc_id, COUNT(*) AS n_paras FROM paras GROUP BY doc_id),
    para AS (
        SELECT d.doc_id AS keep_id,
               md5(COALESCE(r.text, '')) AS para_fp,
               CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS para_kept,
               CAST(COALESCE(t.n_paras, 0) - COALESCE(r.n_kept, 0) AS BIGINT)
                   AS para_dropped
        FROM built d
        LEFT JOIN ptotals t USING (doc_id)
        LEFT JOIN rebuilt r USING (doc_id)
    )
"""


@register(
    "q50_exact_dedup",
    oracle=f"""
    WITH {_PARA_CTES},
    bpdocs AS (SELECT fp, doc_id FROM paras GROUP BY fp, doc_id),
    bpset AS (SELECT fp FROM bpdocs GROUP BY fp HAVING COUNT(*) >= 3),
    bpkept AS (
        SELECT p.doc_id, p.pos, p.para
        FROM paras p LEFT JOIN bpset s USING (fp)
        WHERE s.fp IS NULL
    ),
    bprebuilt AS (
        SELECT doc_id, COUNT(*) AS n_kept,
               string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text
        FROM bpkept GROUP BY doc_id
    ),
    bp AS (
        SELECT d.doc_id AS keep_id,
               md5(COALESCE(r.text, '')) AS bp_fp,
               CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS bp_kept,
               CAST(COALESCE(t.n_paras, 0) - COALESCE(r.n_kept, 0) AS BIGINT)
                   AS bp_dropped
        FROM built d
        LEFT JOIN ptotals t USING (doc_id)
        LEFT JOIN bprebuilt r USING (doc_id)
    ),
    ex AS (
        SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint,
               MIN(doc_id) AS keep_id,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY 1
    ),
    cdo AS (
        SELECT {_DIFF_FP} AS fingerprint, MIN(source) AS source
        FROM documents WHERE doc_id % 3 != 0 GROUP BY 1
    ),
    cdn AS (
        SELECT {_DIFF_FP} AS fingerprint, MIN(source) AS source
        FROM documents WHERE doc_id % 4 != 0 GROUP BY 1
    ),
    cdd AS (
        SELECT COALESCE(cdn.source, cdo.source) AS source,
               CASE WHEN cdo.fingerprint IS NULL THEN 'added'
                    WHEN cdn.fingerprint IS NULL THEN 'removed'
                    ELSE 'kept' END AS status
        FROM cdo FULL OUTER JOIN cdn ON cdn.fingerprint = cdo.fingerprint
    )
    SELECT 'doc' AS tag, ex.fingerprint, ex.keep_id, ex.n_copies,
           p.para_fp, p.para_kept, p.para_dropped,
           bp.bp_fp, bp.bp_kept, bp.bp_dropped
    FROM ex JOIN para p USING (keep_id) JOIN bp USING (keep_id)
    UNION ALL
    SELECT 'diff' AS tag, source AS fingerprint,
           CAST(NULL AS BIGINT) AS keep_id,
           COUNT(*) AS n_copies,
           status AS para_fp,
           CAST(NULL AS BIGINT) AS para_kept,
           CAST(NULL AS BIGINT) AS para_dropped,
           CAST(NULL AS VARCHAR) AS bp_fp,
           CAST(NULL AS BIGINT) AS bp_kept,
           CAST(NULL AS BIGINT) AS bp_dropped
    FROM cdd GROUP BY source, status
    """,
    doc="Exact dedup (md5 fingerprint of normalized text, deterministic "
    "min-id representative; one shuffle on a 32-byte key, map-side "
    "combinable) MERGED (r7) with corpus-level paragraph dedup "
    "(operators/dedup.paragraph_dedup, the Dolma/RefinedWeb recipe) over "
    "a derived two-paragraph corpus: each representative row carries the "
    "md5 of its rebuilt text (pins reassembly order + separator), kept "
    "and dropped paragraph counts. The keeper selection is a map-side-"
    "combinable groupBy(fp).min(struct) — never a window over the hot "
    "fingerprint. MERGED (r7b) with boilerplate paragraph removal over "
    "the same derived corpus (operators/dedup.remove_boilerplate_"
    "paragraphs, min_df=3): unlike dedup's keep-first, paragraphs in "
    ">= 3 distinct docs are removed EVERYWHERE; bp_fp pins the rebuilt "
    "text, bp_kept/bp_dropped the counts (the document-frequency agg is "
    "two-level groupBy — (fp,id) then (fp) — map-side combinable, no "
    "Window). ALSO MERGED (r10, absorbing retired q81): 'diff'-tagged "
    "rows carry the release-to-release corpus diff (operators/dedup."
    "corpus_diff — two overlapping snapshots, doc_id % 3 != 0 vs "
    "% 4 != 0, compared by the SAME content fingerprint): added/"
    "removed/kept counts per source, the what-changed report next to a "
    "release's data card; ONE full-outer join on 32-byte fingerprints, "
    "text never shuffles. Hashed surfaces ('doc' rows): exact "
    "(fingerprint, keep_id, n_copies); paragraph (para_fp, para_kept, "
    "para_dropped); boilerplate (bp_fp, bp_kept, bp_dropped). 'diff' "
    "rows: (source, status, count) packed into (fingerprint, para_fp, "
    "n_copies). Bench keeps timing the pure exact_dedup half (headline "
    "pin), x_paragraph_dedup the paragraph half, x_boilerplate_para "
    "the removal half, x_corpus_diff the diff half.",
)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.operators.dedup import (
        corpus_diff,
        paragraph_dedup,
        remove_boilerplate_paragraphs,
    )

    docs = load_table(spark, sf_dir, "documents")
    ex = exact_dedup(docs)
    b = docs.select(
        (F.col("doc_id") - 7).alias("doc_id"), F.col("text").alias("_t2")
    )
    built = (
        docs.select("doc_id", "text")
        .join(b, "doc_id", "left")
        .select(
            "doc_id",
            F.concat(
                F.col("text"), F.lit("\n\n"), F.coalesce("_t2", F.lit(""))
            ).alias("text"),
        )
    )
    para = paragraph_dedup(built).select(
        F.col("doc_id").alias("keep_id"),
        F.md5("text").alias("para_fp"),
        F.col("n_kept").alias("para_kept"),
        F.col("n_dropped").alias("para_dropped"),
    )
    bp = remove_boilerplate_paragraphs(built, min_df=3).select(
        F.col("doc_id").alias("keep_id"),
        F.md5("text").alias("bp_fp"),
        F.col("n_kept").alias("bp_kept"),
        F.col("n_dropped").alias("bp_dropped"),
    )
    doc_rows = (
        ex.join(para, "keep_id")
        .join(bp, "keep_id")
        .select(
            F.lit("doc").alias("tag"),
            "fingerprint", "keep_id", "n_copies",
            "para_fp", "para_kept", "para_dropped",
            "bp_fp", "bp_kept", "bp_dropped",
        )
    )
    old = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 4 != 0)
    diff_rows = (
        corpus_diff(old, new, group_cols=["source"])
        .groupBy("source", "status")
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .select(
            F.lit("diff").alias("tag"),
            F.col("source").alias("fingerprint"),
            F.lit(None).cast("long").alias("keep_id"),
            "n_copies",
            F.col("status").alias("para_fp"),
            F.lit(None).cast("long").alias("para_kept"),
            F.lit(None).cast("long").alias("para_dropped"),
            F.lit(None).cast("string").alias("bp_fp"),
            F.lit(None).cast("long").alias("bp_kept"),
            F.lit(None).cast("long").alias("bp_dropped"),
        )
    )
    return doc_rows.unionByName(diff_rows)


# --- token counting + BM25 probe --------------------------------------------

# the fixed bag-of-terms query the BM25 probe scores the corpus against
# (terms chosen to have non-trivial df in the synthetic corpus — the
# same list tests/test_ranking.py oracles against)
_BM25_TERMS = ["vector", "hash", "spark"]
_BM25_K1, _BM25_B = 1.2, 0.75


def _bm25_oracle_fragment(terms: list[str], k1: float, b: float) -> str:
    """DuckDB replay of operators/ranking.bm25_scores: per-term tf and
    dl per doc, ONE global stats row (N, avgdl, per-term df), score
    summed in term order with the same operand sequence as the Spark
    expression tree (idf * tf * (k1+1) / (tf + k1*(1-b + b*dl/avgdl)))
    so the 6dp rounding sees identical doubles."""
    tf_cols = ",\n".join(
        f"len(list_filter({_SQL_TOKS}, t -> t = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    score = " + ".join(
        f"ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * tf_{i} * {k1 + 1.0} / (tf_{i} + {k1} * (1.0 - {b}"
        f" + CASE WHEN avgdl > 0 THEN {b} * dl / avgdl ELSE 0.0 END))"
        for i in range(len(terms))
    )
    return f"""
    bmbase AS (
        SELECT doc_id, len({_SQL_TOKS}) AS dl, {tf_cols} FROM documents
    ),
    bmstats AS (
        SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl, {df_cols} FROM bmbase
    ),
    bm AS (SELECT doc_id, ROUND({score}, 6) AS bm25_r FROM bmbase, bmstats)
    """


# chunking params for the merged q51 column set: small window so the
# sf0.01 docs (a few hundred tokens) produce several chunks each — the
# same (40, 8) probe tests/test_paragraph_mixture.py oracles
_CHUNK_MAX, _CHUNK_OVERLAP = 40, 8

_CHUNK_CTES = f"""
    chtoked AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    chstarts AS (
        SELECT doc_id, toks,
               unnest(list_filter(
                   generate_series(0, len(toks) - 1, {_CHUNK_MAX - _CHUNK_OVERLAP}),
                   s -> s = 0 OR s + {_CHUNK_OVERLAP} < len(toks))) AS start
        FROM chtoked WHERE len(toks) > 0
    ),
    chnum AS (
        SELECT doc_id, toks, start,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY start) - 1
                   AS chunk_id
        FROM chstarts
    ),
    chrows AS (
        SELECT doc_id, chunk_id,
               len(toks[start + 1 : start + {_CHUNK_MAX}]) AS n_chunk_tokens,
               array_to_string(toks[start + 1 : start + {_CHUNK_MAX}], ' ') AS text
        FROM chnum
    ),
    chagg AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(n_chunk_tokens) AS BIGINT) AS chunk_tok_sum,
               md5(string_agg(text, chr(31) ORDER BY chunk_id)) AS chunks_fp
        FROM chrows GROUP BY doc_id
    )
"""


def _q51_oracle_or_none() -> str | None:
    """q51's oracle with the r7 learned-BPE columns: the merge table
    (bpe_merges_for_dir at ORACLE_SF_DIR — the function the Spark query
    also calls, the q67 trained-quantizer contract) replays as VALUES
    and the distributed encode replays as a recursive CTE stepping
    through the merges with the shared fixpoint-replace rule. Degrades
    to rows-only if the testdata is absent at import time."""
    try:
        from solarpaneldatawrangler_spark.operators.bpe import (
            bpe_merges_for_dir,
            bpe_merges_values_sql,
        )
        from solarpaneldatawrangler_spark.plans.catalog import ORACLE_SF_DIR

        merges = bpe_merges_for_dir(ORACLE_SF_DIR, n_merges=_BPE_MERGES)
        values = bpe_merges_values_sql(merges)
        n = len(merges)
    except Exception:
        return None
    return f"""
    WITH RECURSIVE {_bm25_oracle_fragment(_BM25_TERMS, _BM25_K1, _BM25_B)},
    {_CHUNK_CTES},
    bm_merge(idx, pat, rep) AS (VALUES {values}),
    bwords AS (
        SELECT t.doc_id, CAST(u.i AS BIGINT) AS wpos,
               ' ' || array_to_string(
                   string_split_regex(t.toks[CAST(u.i AS INT)], ''), ' ')
                 || ' ' AS s
        FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents) t,
             LATERAL UNNEST(range(1, len(t.toks) + 1)) AS u(i)
    ),
    benc AS (
        SELECT doc_id, wpos, s, 1 AS i FROM bwords
        UNION ALL
        SELECT e.doc_id, e.wpos,
               CASE WHEN contains(e.s, m.pat)
                    THEN replace(e.s, m.pat, m.rep) ELSE e.s END,
               CASE WHEN contains(e.s, m.pat) THEN e.i ELSE e.i + 1 END
        FROM benc e JOIN bm_merge m ON m.idx = e.i
    ),
    bfin AS (SELECT doc_id, wpos, trim(s) AS s FROM benc WHERE i = {n} + 1),
    bagg AS (
        SELECT doc_id,
               md5(string_agg(s, ' | ' ORDER BY wpos)) AS bpe_fp,
               CAST(SUM(len(string_split(s, ' '))) AS BIGINT)
                   AS n_bpe_learned
        FROM bfin GROUP BY doc_id
    )
    SELECT d.doc_id,
           len({_SQL_TOKS}) AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
           length(text) AS n_chars_actual,
           {round_ratio_half_away_sql(
               "COALESCE(list_sum(list_transform("
               + _SQL_TOKS + ", t -> len(t))), 0)",
               "GREATEST(len(" + _SQL_TOKS + "), 1)",
               6, assume_nonneg=True)} AS mean_word_len,
           bm.bm25_r,
           COALESCE(ch.n_chunks, 0) AS n_chunks,
           COALESCE(ch.chunk_tok_sum, 0) AS chunk_tok_sum,
           COALESCE(ch.chunks_fp, '') AS chunks_fp,
           COALESCE(ba.bpe_fp, md5('')) AS bpe_fp,
           COALESCE(ba.n_bpe_learned, 0) AS n_bpe_learned
    FROM documents d
    JOIN bm USING (doc_id)
    LEFT JOIN chagg ch USING (doc_id)
    LEFT JOIN bagg ba USING (doc_id)
    """


_BPE_MERGES = 64


@register(
    "q51_token_stats",
    oracle=_q51_oracle_or_none(),
    doc="Token counting for LLM-cost estimation as pure array expressions "
    "in the scan stage, zero corpus shuffle: whitespace tokens, GPT-2-"
    "pre-tokenizer-style BPE-ish segmentation (letter runs / digit runs "
    "/ punctuation, RE2-compatible regexp_extract_all), mean word "
    "length, PLUS the BM25 relevance probe (operators/ranking.py) "
    "against a fixed term query — all riding ONE documents pass via "
    "bm25_scores' extras pass-through; the only non-scan work is the "
    "1-row corpus-stats aggregate broadcast back (the documented "
    "1-row BroadcastNestedLoopJoin). MERGED (r7): sliding-window "
    "document chunking (operators/packing.chunk_documents, max_tokens="
    "40/overlap=8) aggregated per doc — n_chunks, chunk_tok_sum, and "
    "chunks_fp = md5 of the chunk texts joined in chunk order, which "
    "pins every chunk's exact token content and boundaries. ALSO "
    "MERGED (r7): LEARNED BPE (operators/bpe — Sennrich et al. 2016): "
    "merges train driver-side on a bounded deterministic sample "
    "(bpe_merges_for_dir, the IVF/PQ trained-quantizer contract), the "
    "map-only distributed encode segments every doc, and the oracle "
    "replays the encode with a recursive CTE stepping the shared "
    "fixpoint-replace rule through the merge VALUES. Hashed surfaces: "
    "token stats + bm25_r; chunking (n_chunks, chunk_tok_sum, "
    "chunks_fp); learned BPE (bpe_fp = md5 of the full segmentation, "
    "n_bpe_learned).",
)
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.operators.packing import chunk_documents
    from solarpaneldatawrangler_spark.operators.ranking import bm25_scores

    docs = load_table(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all(
        F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
    )
    base = bm25_scores(
        docs,
        _BM25_TERMS,
        k1=_BM25_K1,
        b=_BM25_B,
        extras={
            "n_tokens": F.size(tokens(F.col("text"))),
            "n_bpe_tokens": F.size(bpe),
            "n_chars_actual": F.length("text"),
            # r13: sum(token chars)/max(n_tokens,1) is an exact
            # rational — 6dp rounds in pure integer arithmetic
            "mean_word_len": round_ratio_half_away(
                F.aggregate(
                    tokens(F.col("text")),
                    F.lit(0).cast("long"),
                    lambda acc, t: acc + F.length(t).cast("long"),
                ),
                F.greatest(F.size(tokens(F.col("text"))), F.lit(1)).cast(
                    "long"
                ),
                6,
            ),
        },
    )
    chagg = (
        chunk_documents(docs, max_tokens=_CHUNK_MAX, overlap=_CHUNK_OVERLAP)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_chunk_tokens").cast("long").alias("chunk_tok_sum"),
            F.md5(
                F.concat_ws(
                    "\x1f",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("chunk_id", "text"))),
                        lambda s: s["text"],
                    ),
                )
            ).alias("chunks_fp"),
        )
    )
    from solarpaneldatawrangler_spark.operators.bpe import (
        bpe_encode,
        bpe_merges_for_dir,
    )

    bpe_df = bpe_encode(
        docs, bpe_merges_for_dir(sf_dir, n_merges=_BPE_MERGES)
    ).select(
        "doc_id",
        F.md5("bpe_text").alias("bpe_fp"),
        F.col("n_bpe").alias("n_bpe_learned"),
    )
    return (
        base.join(chagg, "doc_id", "left")
        .join(bpe_df, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "n_bpe_tokens",
            "n_chars_actual",
            "mean_word_len",
            "bm25_r",
            F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
            F.coalesce("chunk_tok_sum", F.lit(0)).alias("chunk_tok_sum"),
            F.coalesce("chunks_fp", F.lit("")).alias("chunks_fp"),
            "bpe_fp",
            "n_bpe_learned",
        )
    )


# --- quality scoring ---------------------------------------------------------

_SW_LIST = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"

# PII-injected derived text for the merged q52 scrub columns (the
# driver documents carry no PII, so both engines inject a synthetic
# email + IPv4 whose shape varies with doc_id, then redact with the
# RE2-safe patterns — identical Java-regex/RE2 semantics).
_PII_TEXT_SQL = (
    "text || ' contact u' || doc_id || '@mail' || (doc_id % 4)"
    " || '.net from 10.' || (doc_id % 200) || '.3.' || (doc_id % 250)"
)
_PII_EMAIL_RE2 = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IP_RE2 = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

# URL-injected derived text + blocklist for the merged q54 URL-gate
# columns (the driver documents cite no URLs; subdomain depth varies
# with doc_id so the suffix-chain match is exercised at several depths).
_URL_TEXT_SQL = (
    "text || ' see https://www' || (doc_id % 7) || '.blog' || (doc_id % 5)"
    " || '.example' || (doc_id % 3) || '.com/p and https://ok' || (doc_id % 2)"
    " || '.org/q'"
)
_URL_BLOCKLIST = ["example1.com", "blog2.example0.com", "www3.blog4.example2.com"]
_URL_BL_SQL = ", ".join(f"'{b}'" for b in _URL_BLOCKLIST)

# tracking-decorated derived URL for the merged q54 canonicalization
# columns (r10b): mixed-case host, trailing path slash, utm/fbclid
# tracking params, a real param, and a fragment — 105 canonical keys
# over the corpus, so the first-seen dedup verdict has real collisions
_CANON_URL_SQL = (
    "'https://Track' || (doc_id % 3) || '.Example.com/p' || (doc_id % 5)"
    " || '/?utm_source=x&id=' || (doc_id % 7) || '&fbclid=abc#frag'"
    " || (doc_id % 2)"
)


# markup-wrapped derived text for the merged q52 strip columns (the
# driver documents carry no HTML, so both engines wrap the text in the
# same deterministic tag/script/entity/comment scaffolding and hash
# what strip_markup recovers)
_MARKUP_TEXT_SQL = (
    "'<div class=\"c\"><p>' || text || '</p><script>var i=' || doc_id"
    " || ';</script>&amp; <!-- x --></div>'"
)


# derived multi-line corpus for the C4 columns: each doc gains a mix of
# keepable/droppable lines plus doc_id-dependent brace / lorem-ipsum
# injections, replayed literally in the oracle
def _c4_ltext_spark():
    d = F.col("doc_id")
    return F.concat(
        F.col("text"), F.lit(".\n"),
        F.lit("too short.\n"),
        F.lit("no terminal punctuation on this line at all\n"),
        F.lit("this line mentions javascript rules and files today.\n"),
        F.when(
            d % 4 == 0,
            F.lit("extra sentence one! extra sentence two? and three."),
        ).otherwise(F.lit("plain extra line without terminal punct")),
        F.lit("\n"),
        F.when(d % 3 == 0, F.lit("has a { brace")).otherwise(
            F.lit("no brace on this line")
        ),
        F.when(d % 5 == 0, F.lit(" lorem ipsum")).otherwise(F.lit("")),
    )


_C4_LTEXT_SQL = (
    "text || '.' || chr(10) || 'too short.' || chr(10) || "
    "'no terminal punctuation on this line at all' || chr(10) || "
    "'this line mentions javascript rules and files today.' || chr(10) || "
    "CASE WHEN doc_id % 4 = 0 THEN "
    "'extra sentence one! extra sentence two? and three.' "
    "ELSE 'plain extra line without terminal punct' END || chr(10) || "
    "CASE WHEN doc_id % 3 = 0 THEN 'has a { brace' "
    "ELSE 'no brace on this line' END || "
    "CASE WHEN doc_id % 5 = 0 THEN ' lorem ipsum' ELSE '' END"
)


_DSIR_B = 512
_DSIR_K = 100
_DSIR_SEED = "0"
_DSIR_T = 0.0


def _q52_oracle_or_none() -> str | None:
    """q52's oracle with the r10 C4 + DSIR merge columns. The DSIR
    ratio table (dsir_ratios_for_dir at ORACLE_SF_DIR — the function
    the Spark query also calls, the q67 trained-model contract)
    replays as VALUES. Degrades to rows-only ONLY when the testdata
    parquet is genuinely absent at import — narrowly caught and
    announced on stderr (the q72/q53 demotion contract)."""
    from solarpaneldatawrangler_spark.functions.text import (
        MARKUP_TAG_RE,
        c4_flags_sql,
        c4_kept_lines_sql,
        dup_char_fraction_sql,
        dup_fraction_sql,
        lines_sql,
        paragraphs_sql,
        quality_score_sql,
        strip_markup_sql,
        top_ngram_char_fraction_sql,
    )
    from solarpaneldatawrangler_spark.operators.curation import (
        gopher_dup_ngram_sql,
    )
    from solarpaneldatawrangler_spark.operators.dsir import (
        dsir_features_sql,
        dsir_ratios_for_dir,
        dsir_ratios_values_sql,
    )
    from solarpaneldatawrangler_spark.plans.catalog import ORACLE_SF_DIR

    try:
        ratios = dsir_ratios_for_dir(ORACLE_SF_DIR, n_buckets=_DSIR_B)
    except FileNotFoundError as ex:
        import sys

        print(
            "WARNING: q52_quality_score oracle demoted to rows-only — "
            f"testdata absent at import ({ex})",
            file=sys.stderr,
        )
        return None
    dvalues = dsir_ratios_values_sql(ratios)
    dfeats = dsir_features_sql("text", _DSIR_B)

    rtext = (
        "text || ' ' || substr(text, 1,"
        " CAST(FLOOR(length(text) / 2) AS INT))"
    )
    ltext = (
        "text || chr(10) || text || chr(10) || chr(10) ||"
        " substr(text, 1, 25)"
    )
    rep_lines, rep_paras = lines_sql(ltext), paragraphs_sql(ltext)

    return f"""
    WITH feats AS (
        SELECT doc_id,
            {quality_score_sql("text", _SQL_TOKS, _SW_LIST)} AS quality,
            {hashed_linear_score_r6_sql("text")} AS clf,
            {dup_fraction_sql(rep_lines)} AS rep_lf,
            {dup_char_fraction_sql(rep_lines)} AS rep_lcf,
            {dup_fraction_sql(rep_paras)} AS rep_pf,
            {dup_char_fraction_sql(rep_paras)} AS rep_pcf,
            {top_ngram_char_fraction_sql(rtext, 2)} AS rep_top2,
            {top_ngram_char_fraction_sql(rtext, 3)} AS rep_top3,
            {_PII_TEXT_SQL} AS ptext,
            {_MARKUP_TEXT_SQL} AS mtext
        FROM documents
    ),
    kwtoks AS (SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents),
    kwft AS (SELECT doc_id, term FROM kwtoks
             WHERE NOT list_contains({_SW_LIST}, term)),
    kwtf AS (SELECT doc_id, term, COUNT(*) AS tf FROM kwft GROUP BY 1, 2),
    kwdf AS (SELECT term, COUNT(*) AS df FROM kwtf GROUP BY 1),
    kwn AS (SELECT COUNT(DISTINCT doc_id) AS n FROM kwtf),
    kwsc AS (
        SELECT kwtf.doc_id, kwtf.term,
               ROUND(kwtf.tf * ln((kwn.n + 1.0) / (kwdf.df + 1.0)), 6) AS s
        FROM kwtf JOIN kwdf USING (term), kwn
    ),
    kwrk AS (
        SELECT doc_id, term, s,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY s DESC, term ASC) AS rk
        FROM kwsc
    ),
    kwagg AS (
        SELECT doc_id, string_agg(term, '|' ORDER BY rk) AS kw,
               MAX(CASE WHEN rk = 1 THEN s END) AS kw_score_r
        FROM kwrk WHERE rk <= 3 GROUP BY doc_id
    ),
    c4f AS (
        SELECT doc_id,
               {c4_flags_sql(f"({_C4_LTEXT_SQL})")},
               md5(array_to_string(
                   {c4_kept_lines_sql(f"({_C4_LTEXT_SQL})")}, chr(10)))
                 AS clean_fp
        FROM documents
    ),
    dratios(b, r) AS (VALUES {dvalues}),
    dfeats AS (
        SELECT doc_id, unnest({dfeats}) AS b FROM documents
    ),
    dw AS (
        SELECT f.doc_id,
               CAST(SUM(CAST(dratios.r AS DECIMAL(27,6))) AS DOUBLE) AS w,
               COUNT(*) AS n
        FROM dfeats f JOIN dratios USING (b) GROUP BY f.doc_id
    ),
    dkeys AS (
        SELECT d.doc_id,
               COALESCE(dw.n, 0) AS dsir_n,
               COALESCE(dw.w, 0.0) AS dsir_w_r,
               ROUND(COALESCE(dw.w, 0.0) + -ln(-ln(
                   ((('0x' || substr(md5('{_DSIR_SEED}:' ||
                        CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT + 0.5)
                    / 4294967296.0))), 6) AS dsir_key_r,
               (d.text IS NOT NULL AND COALESCE(dw.w, 0.0) >= {_DSIR_T})
                   AS dsir_thr_kept
        FROM documents d LEFT JOIN dw ON dw.doc_id = d.doc_id
    ),
    drk AS (
        SELECT *, RANK() OVER (ORDER BY dsir_key_r DESC, doc_id) AS rnk
        FROM dkeys
    )
    SELECT f.doc_id,
           f.quality,
           f.rep_lf, f.rep_lcf, f.rep_pf, f.rep_pcf,
           f.rep_top2, f.rep_top3,
           COALESCE(rep.d5, 0.0) AS rep_d5,
           COALESCE(rep.d6, 0.0) AS rep_d6,
           COALESCE(rep.d7, 0.0) AS rep_d7,
           COALESCE(rep.d8, 0.0) AS rep_d8,
           COALESCE(rep.d9, 0.0) AS rep_d9,
           COALESCE(rep.d10, 0.0) AS rep_d10,
           clf AS clf_r,
           CAST(len(regexp_extract_all(ptext, '{_PII_EMAIL_RE2}'))
                + len(regexp_extract_all(ptext, '{_PII_IP_RE2}')) AS BIGINT)
             AS pii_n,
           md5(regexp_replace(regexp_replace(ptext, '{_PII_EMAIL_RE2}',
                   '<EMAIL>', 'g'), '{_PII_IP_RE2}', '<IP>', 'g')) AS red_fp,
           CAST(len(regexp_extract_all(mtext, '{MARKUP_TAG_RE}')) AS BIGINT)
             AS tag_n,
           md5({strip_markup_sql("mtext")}) AS strip_fp,
           COALESCE(k.kw, '') AS kw,
           COALESCE(k.kw_score_r, 0.0) AS kw_score_r,
           c4.has_brace, c4.has_lorem, c4.n_kept_lines, c4.n_sentences,
           c4.c4_ok, c4.clean_fp,
           dk.dsir_n, dk.dsir_w_r, dk.dsir_key_r,
           dk.rnk <= {_DSIR_K} AS dsir_sel,
           dk.dsir_thr_kept
    FROM feats f LEFT JOIN kwagg k USING (doc_id)
    LEFT JOIN ({gopher_dup_ngram_sql(rtext)}) rep ON rep.doc_id = f.doc_id
    JOIN c4f c4 ON c4.doc_id = f.doc_id
    JOIN drk dk ON dk.doc_id = f.doc_id
    """


@register(
    "q52_quality_score",
    oracle=_q52_oracle_or_none(),
    doc="Gopher/C4-style quality score: stopword ratio + punctuation ratio "
    "+ word-length gate, combined deterministically. Expression-only. "
    "MERGED (r7) with more curation gates on the same rows: "
    "clf_r = operators.curation.hashed_linear_score_r6 (the fastText "
    "hashed-bag-of-words linear architecture, pseudo-weights in exact "
    "binary fractions so the fold is order-independent, with the 6dp "
    "rounding done in pure integer arithmetic — r12, after the sf1 "
    "sweep caught a rounding-tie where BigDecimal HALF_UP and DuckDB's "
    "double ROUND disagree); "
    "a PII scrub audit over a PII-injected derived text — pii_n match "
    "count plus red_fp = md5 of the redacted text (pins every redaction "
    "span; functions.text.redact_pii with the RE2-safe pattern set); "
    "a markup-strip audit over a markup-wrapped derived text — tag_n + "
    "strip_fp = md5(functions.text.strip_markup(mtext)), pinning block "
    "removal, tag spacing, and single-pass entity decode; and per-doc "
    "tf-idf keywords — kw (top-3 '|'-joined) + kw_score_r from "
    "operators.ranking.tfidf_keywords (score rounded to 6dp BEFORE "
    "ranking, term-asc tiebreak, so both engines rank identical "
    "doubles). Hashed surfaces: quality (quality_score), clf_r "
    "(hashed_linear_score), pii_n + red_fp (redact_pii/pii_count), "
    "tag_n + strip_fp (strip_markup/markup_tag_count), kw + kw_score_r "
    "(tfidf_keywords). ALSO MERGED (r8): the full Gopher REPETITION "
    "battery over repetition-derived texts — rep_lf/rep_lcf/rep_pf/"
    "rep_pcf (duplicate line/paragraph count+char fractions), "
    "rep_top2/rep_top3 (top-n-gram char fractions, O(m) sorted-run "
    "fold), rep_d5..rep_d10 (dup-n-gram union char coverage via the "
    "Arrow-batched gopher_dup_ngram_char_fracs — the documented "
    "pandas-UDF exception), each oracle-replayed through the shared "
    "SQL builders. ALSO MERGED (r10, absorbing retired q71 + q72 + "
    "q73 — the remaining document-quality gates): the C4 cleaning "
    "battery (Raffel et al. 2020 §2.2) over a derived multi-line "
    "corpus — has_brace / has_lorem / n_kept_lines / n_sentences / "
    "c4_ok (functions.text.c4_doc_flags) and clean_fp = md5 of the "
    "rebuilt cleaned text, pinning every line keep/drop decision "
    "(zero shuffle, zero Python; shared c4_*_sql builders); and DSIR "
    "importance resampling (Xie et al. 2023) — hashed unigram+bigram "
    "features against a dir-fitted target-vs-raw ratio table (target "
    "= doc_id % 7 == 0, the trained-model contract, replayed as "
    "VALUES): dsir_n, dsir_w_r (exact decimal weight fold, projected "
    "ONCE — the double-eval guard), dsir_key_r (6dp md5-Gumbel key), "
    "dsir_sel (Gumbel-top-100 membership), and dsir_thr_kept (the "
    "q73 threshold mode: the streaming `weight >= t` scan-side "
    "verdict, derived from the same weight column so the fold never "
    "runs twice; operator parity with operators.dsir."
    "dsir_select_threshold is pinned in test_dsir).",
)
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.functions.text import (
        PII_PATTERNS_RE2,
        dup_char_fraction_of_array,
        dup_fraction_of_array,
        markup_tag_count,
        nonempty_lines,
        paragraphs_array,
        pii_count,
        redact_pii,
        strip_markup,
    )
    from solarpaneldatawrangler_spark.operators.curation import (
        gopher_rep_battery_fracs,
        hashed_linear_score_r6,
    )
    from solarpaneldatawrangler_spark.operators.ranking import tfidf_keywords

    docs = load_table(spark, sf_dir, "documents")
    ptext = F.concat(
        F.col("text"),
        F.lit(" contact u"), F.col("doc_id").cast("string"),
        F.lit("@mail"), (F.col("doc_id") % 4).cast("string"),
        F.lit(".net from 10."), (F.col("doc_id") % 200).cast("string"),
        F.lit(".3."), (F.col("doc_id") % 250).cast("string"),
    )
    mtext = F.concat(
        F.lit('<div class="c"><p>'),
        F.col("text"),
        F.lit("</p><script>var i="),
        F.col("doc_id").cast("string"),
        F.lit(";</script>&amp; <!-- x --></div>"),
    )
    # repetition-derived texts (r8): rtext plants token repetition
    # (text + its first half), ltext plants line/paragraph repetition —
    # both replayed literally in the oracle
    rtext = F.concat_ws(
        " ",
        F.col("text"),
        F.col("text").substr(
            F.lit(1), F.floor(F.length("text") / 2).cast("int")
        ),
    )
    ltext = F.concat(
        F.col("text"), F.lit("\n"), F.col("text"), F.lit("\n\n"),
        F.col("text").substr(F.lit(1), F.lit(25)),
    )
    # r17 (guide §4.1 + §1.2): the line/paragraph arrays are projected
    # ONCE as multi-referenced aliases (CollapseProject refuses to
    # inline a non-cheap alias referenced more than once — the
    # c4_filter_workload idiom), so the split+trim+filter chains run
    # once per row instead of once per fraction; the top-2/3-gram
    # fractions are FUSED into the dup-n-gram Arrow pass over the same
    # rtext (gopher_rep_battery_fracs — one tokenize, C-speed dict
    # counting, replacing the interpreted sort+fold). Values identical:
    # the oracle below still replays the component-form SQL.
    step = docs.select(
        "doc_id",
        "text",
        nonempty_lines(ltext).alias("_lines"),
        paragraphs_array(ltext).alias("_paras"),
        gopher_rep_battery_fracs(rtext).alias("_rep"),
        ptext.alias("_ptext"),
        mtext.alias("_mtext"),
    )
    base = step.select(
        "doc_id",
        quality_score(F.col("text")).alias("quality"),
        dup_fraction_of_array(F.col("_lines")).alias("rep_lf"),
        dup_char_fraction_of_array(F.col("_lines")).alias("rep_lcf"),
        dup_fraction_of_array(F.col("_paras")).alias("rep_pf"),
        dup_char_fraction_of_array(F.col("_paras")).alias("rep_pcf"),
        F.col("_rep.top2").alias("rep_top2"),
        F.col("_rep.top3").alias("rep_top3"),
        F.col("_rep").alias("_rep"),
        # r12: integer-exact 6dp rounding (sf1 sweep caught a 6dp
        # rounding-tie where BigDecimal HALF_UP and DuckDB's double
        # ROUND disagree by one ulp-of-1e-6)
        hashed_linear_score_r6(F.col("text"), impl="pandas").alias("clf_r"),
        pii_count(F.col("_ptext"), patterns=PII_PATTERNS_RE2)
        .cast("long")
        .alias("pii_n"),
        F.md5(redact_pii(F.col("_ptext"), patterns=PII_PATTERNS_RE2)).alias(
            "red_fp"
        ),
        markup_tag_count(F.col("_mtext")).cast("long").alias("tag_n"),
        F.md5(strip_markup(F.col("_mtext"))).alias("strip_fp"),
    )
    kw = tfidf_keywords(docs, k=3, stopwords=EN_STOPWORDS)
    c4 = c4_filter_workload(spark, sf_dir)
    # dsir_thr_kept is derived from the ALREADY-COMPUTED weight column
    # instead of a second dsir_select_threshold scan: the O(features)
    # fold runs once per row total (the q72 double-eval guard, applied
    # across operators). Null text scores a NULL weight -> kept=false,
    # exactly dsir_select_threshold's conservative-admission rule —
    # operator parity is pinned by tests/test_dsir.py::
    # test_threshold_select_matches_filter_semantics and the merged
    # oracle's (text IS NOT NULL AND w >= t) replay.
    dsir = dsir_workload(spark, sf_dir).withColumn(
        "dsir_thr_kept",
        F.coalesce(F.col("dsir_w_r") >= F.lit(_DSIR_T), F.lit(False)),
    )
    return (
        base.join(kw, "doc_id", "left")
        .join(c4, "doc_id")
        .join(dsir, "doc_id")
        .select(
            "doc_id",
            "quality",
            "rep_lf",
            "rep_lcf",
            "rep_pf",
            "rep_pcf",
            "rep_top2",
            "rep_top3",
            *[F.col(f"_rep.d{n}").alias(f"rep_d{n}") for n in (5, 6, 7, 8, 9, 10)],
            "clf_r",
            "pii_n",
            "red_fp",
            "tag_n",
            "strip_fp",
            F.coalesce("kw", F.lit("")).alias("kw"),
            F.coalesce("kw_score_r", F.lit(0.0)).alias("kw_score_r"),
            "has_brace",
            "has_lorem",
            "n_kept_lines",
            "n_sentences",
            "c4_ok",
            "clean_fp",
            "dsir_n",
            "dsir_w_r",
            "dsir_key_r",
            F.col("sel").alias("dsir_sel"),
            "dsir_thr_kept",
        )
    )


# --- language ID + temperature mixture membership (merged r7) ---------------

# temperature_resample params for the merged q53 columns: stratum = the
# documents lang column, the same (alpha, frac) point the pytest oracle
# checks first
_TEMP_ALPHA, _TEMP_FRAC = 0.5, 0.5


def _lang_rates_values_or_none(mass_sql: str = "COUNT(*)") -> str | None:
    """The per-lang temperature rate table as a SQL VALUES body —
    computed at import time from ORACLE_SF_DIR's documents with the
    SAME pure-Python temperature_rate_table the Spark operator uses, so
    both engines compare literal-identical doubles (the q67 trained-
    centroid idiom: data-dependent constants replayed as VALUES; only
    meaningful when the gate runs at ORACLE_SF_DIR). ``mass_sql``
    selects the stratum mass: COUNT(*) for document-count rates, a
    token-sum expression for the weighted (token-budget) rates. None if
    the testdata is absent in this environment (degrade to rows-only)."""
    try:
        import duckdb

        from solarpaneldatawrangler_spark.operators.sampling import (
            temperature_rate_table,
        )
        from solarpaneldatawrangler_spark.plans.catalog import ORACLE_SF_DIR

        counts = (
            duckdb.connect()
            .execute(
                f"SELECT lang, {mass_sql} FROM read_parquet("
                f"'{ORACLE_SF_DIR}/documents.parquet') GROUP BY lang"
            )
            .fetchall()
        )
        rows = temperature_rate_table(counts, _TEMP_ALPHA, _TEMP_FRAC)
        return ",\n".join(
            f"({s!r}, {int(n)}, CAST({r!r} AS DOUBLE))" for s, n, r in rows
        )
    except Exception:
        return None


def _and_all(cols):
    out = cols[0]
    for c in cols[1:]:
        out = out & c
    return out


# q76-absorption fragment (r10): tokens with NULL text normalized —
# the exact item relation the retired q76 sketched (shared builder)
_HLL_TOKS_SQL = norm_toks_sql()


# the deterministic train/valid/test carve the merged q53 split column
# uses — the leakage-safe 90/5/5 standard; q55's 'leak' audit rows use
# the SAME carve, so the two surfaces can never disagree on membership
from solarpaneldatawrangler_spark.operators.sampling import (  # noqa: E402
    split_assign_sql,
)

_SPLIT_FRACTIONS = {"train": 0.9, "valid": 0.05, "test": 0.05}


def _q53_oracle_or_none() -> str | None:
    from solarpaneldatawrangler_spark.operators.sketches import hll_sql

    values = _lang_rates_values_or_none()
    wvalues = _lang_rates_values_or_none(f"SUM(len({_SQL_TOKS}))")
    if values is None or wvalues is None:
        return None
    split = split_assign_sql("s.doc_id", _SPLIT_FRACTIONS)
    hll_toks = f"""(
        SELECT lang, unnest({_HLL_TOKS_SQL}) AS tok FROM documents
    ) t"""
    hll_est = hll_sql("tok", hll_toks, ["lang"])
    return f"""
    WITH trates(lang, lang_n, lang_rate) AS (VALUES {values}),
    hll AS ({hll_est}),
    hexact AS (
        SELECT lang, COUNT(DISTINCT tok) AS lang_distinct_tok
        FROM (SELECT lang, unnest({_HLL_TOKS_SQL}) AS tok FROM documents)
        GROUP BY lang
    ),
    twrates(lang, lang_wn, lang_wrate) AS (VALUES {wvalues}),
    scores AS (
        SELECT doc_id, lang,
            len(list_filter({_SQL_TOKS}, t -> list_contains(['the','and','of','to','a'], t))) AS s_en,
            len(list_filter({_SQL_TOKS}, t -> list_contains(['el','la','de','que','y'], t))) AS s_es,
            len(list_filter({_SQL_TOKS}, t -> list_contains(['le','la','et','les','des'], t))) AS s_fr,
            len(list_filter({_SQL_TOKS}, t -> list_contains(['der','die','und','das','ist'], t))) AS s_de
        FROM documents
    ),
    btoks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    brows AS (
        SELECT doc_id, toks[CAST(u.i AS INT)] AS w1,
               toks[CAST(u.i AS INT) + 1] AS w2
        FROM btoks, LATERAL UNNEST(range(1, len(toks))) AS u(i)
    ),
    bctx AS (SELECT w1, COUNT(*) AS c_ctx FROM brows GROUP BY w1),
    bbig AS (SELECT w1, w2, COUNT(*) AS c_big FROM brows GROUP BY w1, w2),
    bv AS (SELECT COUNT(DISTINCT t) AS v
           FROM (SELECT unnest(toks) AS t FROM btoks)),
    bsc AS (
        SELECT r.doc_id,
               ROUND(ln(COALESCE(b.c_big, 0) + 1)
                     - ln(COALESCE(c.c_ctx, 0) + bv.v), 6) AS logp
        FROM brows r
        LEFT JOIN bbig b USING (w1, w2)
        LEFT JOIN bctx c USING (w1), bv
    ),
    blm AS (
        SELECT doc_id,
               CAST(SUM(CAST(logp AS DECIMAL(27,6))) AS DOUBLE) AS lm_sum_r,
               COUNT(*) AS lm_n
        FROM bsc GROUP BY doc_id
    ),
    gflags AS (
        SELECT doc_id, {gopher_flags_sql()} FROM documents
    )
    SELECT s.doc_id, s.lang,
           CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
                WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
                WHEN s_fr >= s_de THEN 'fr'
                ELSE 'de' END AS pred_lang,
           CAST(t.lang_n AS BIGINT) AS lang_n,
           t.lang_rate,
           (('0x' || substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 8))::BIGINT
              / 4294967296.0) < t.lang_rate AS kept,
           CAST(w.lang_wn AS BIGINT) AS lang_wn,
           w.lang_wrate,
           (('0x' || substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 8))::BIGINT
              / 4294967296.0) < w.lang_wrate AS wkept,
           COALESCE(l.lm_sum_r, 0.0) AS lm_sum_r,
           COALESCE(l.lm_n, 0) AS lm_n,
           g.words_ok, g.mwl_ok, g.hash_ok, g.ellipsis_sym_ok,
           g.bullet_ok, g.ellipsis_ok, g.alpha_ok, g.stopword_ok,
           (g.words_ok AND g.mwl_ok AND g.hash_ok AND g.ellipsis_sym_ok
            AND g.bullet_ok AND g.ellipsis_ok AND g.alpha_ok
            AND g.stopword_ok) AS gopher_ok,
           h.hll_zeros, h.hll_est_r, hx.lang_distinct_tok,
           {split} AS split,
           GREATEST(s_en, s_es, s_fr, s_de)
             - GREATEST(LEAST(s_en, s_es), LEAST(s_en, s_fr),
                        LEAST(s_en, s_de), LEAST(s_es, s_fr),
                        LEAST(s_es, s_de), LEAST(s_fr, s_de))
             AS lang_margin
    FROM scores s
    JOIN trates t USING (lang)
    JOIN twrates w USING (lang)
    LEFT JOIN blm l ON l.doc_id = s.doc_id
    JOIN gflags g ON g.doc_id = s.doc_id
    LEFT JOIN hll h ON h.lang = s.lang
    LEFT JOIN hexact hx ON hx.lang = s.lang
    """


@register(
    "q53_lang_id",
    oracle=_q53_oracle_or_none(),
    doc="Language-ID heuristic (marker-token counts per language, "
    "deterministic argmax, ties break en>es>fr>de) MERGED (r7) with "
    "temperature mixture resampling membership (operators/sampling."
    "temperature_resample, alpha=0.5, target_frac=0.5, stratum=lang): "
    "each doc row carries its stratum count, the driver-side "
    "deterministic keep rate (temperature_rate_table — sorted-stratum "
    "Z sum, replayed in SQL as literal VALUES), and its md5-hash-bucket "
    "membership verdict. The corpus never shuffles: rates broadcast "
    "back, membership is expression-only in the scan. ALSO MERGED (r7): "
    "bigram language-model log-likelihood (operators/curation."
    "bigram_lm_score — the CCNet KenLM-perplexity quality signal as a "
    "Spark-native add-one bigram LM): lm_sum_r = exact decimal sum of "
    "6dp-rounded per-position ln P(w|prev), lm_n = bigram positions. "
    "ALSO MERGED (r7b): the token-weighted rate table (weight_col="
    "token_count — the TOKEN-budget mixture a training pipeline "
    "actually runs; same α/frac, mass = per-lang token sums, replayed "
    "as a second VALUES table) with its own membership verdict. "
    "Hashed surfaces: lang-ID (doc_id, lang, pred_lang); temperature "
    "(lang_n, lang_rate, kept); weighted temperature (lang_wn, "
    "lang_wrate, wkept); LM (lm_sum_r, lm_n — pins tokenizer, "
    "count tables, vocab size, smoothing, and the summation contract). "
    "ALSO MERGED (r8): the full Gopher rule battery (functions.text."
    "gopher_flags — Rae et al. 2021 Appendix A, hash and ellipsis "
    "symbol classes gated SEPARATELY per the paper) as eight boolean "
    "columns plus the conjunction gopher_ok, oracle via the shared "
    "gopher_flags_sql builder. ALSO MERGED (r10, absorbing retired "
    "q76): per-lang HyperLogLog distinct-token cardinality "
    "(operators.sketches, Flajolet et al. 2007 — md5-derived "
    "bucket/rho, registers as ONE bounded groupBy-max so <= n_langs x "
    "4096 rows ever shuffle at ANY corpus size, EXACT scaled-integer "
    "harmonic fold making the approx sketch hash-checkable) riding "
    "each doc row as hll_zeros / hll_est_r via the same per-lang "
    "broadcast join the rate columns use; lang_distinct_tok (the "
    "exact count) rides along so every row shows the sketch error. "
    "Oracle via the shared hll_sql builder. ALSO MERGED (r10b): the "
    "deterministic train/valid/test split label (operators.sampling."
    "split_assign, 90/5/5): the [0,1) hash line carved into sorted-"
    "label intervals, a pure function of (seed, id) — leakage-safe, "
    "rerun/engine-invariant, join-stable with any derived table; "
    "oracle via the shared split_assign_sql builder. AND lang_margin "
    "— the lang-ID CONFIDENCE gate signal (top marker score minus "
    "runner-up; low margin = ambiguous doc, the rows a production "
    "pipeline routes to a heavier classifier): runner-up computed as "
    "the max of pairwise mins, a pure 4-way expression identical in "
    "both engines.",
)
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.operators.curation import bigram_lm_score
    from solarpaneldatawrangler_spark.operators.sampling import (
        hash_bucket,
        split_assign,
        temperature_rates,
    )

    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    # r17 (guide §1.2 + the c4_filter_workload multi-ref-alias idiom,
    # measured in bench_out/r17_q52_decomp_testdata_sf1.json): the
    # token and line arrays are bound ONCE as projected columns, and
    # every O(doc) scalar that pred/margin/gopher_ok referenced
    # repeatedly (the four marker scores: ~16 references, each of which
    # re-ran the tokenize+filter subtree; the gopher rules: the _g
    # struct's GetStructField(CreateNamedStruct) extraction is rewritten
    # by SimplifyExtractValueOps into per-field COPIES, so all 16 field
    # references re-evaluated their full rule subtrees) is projected
    # exactly once. Values identical — same expressions, shared instead
    # of copied; the oracle replays the unshared SQL form every run.
    from solarpaneldatawrangler_spark.functions.text import (
        GOPHER_BULLETS,
        GOPHER_STOPWORDS,
        LANG_MARKERS,
        nonempty_lines,
    )

    bound = docs.select(
        "doc_id",
        "lang",
        "text",
        tokens(t).alias("_toks"),
        nonempty_lines(t).alias("_lines"),
    )
    toks_c, lines_c = F.col("_toks"), F.col("_lines")

    def _mscore(lang: str) -> Column:
        m = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        return F.size(F.filter(toks_c, lambda tk: F.array_contains(m, tk)))

    ntok = F.size(toks_c)
    nz = F.greatest(ntok, F.lit(1)).cast("double")
    nl = F.greatest(F.size(lines_c), F.lit(1)).cast("double")
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = F.size(
        F.regexp_extract_all(t, F.lit(r"\.\.\.|…"), F.lit(0))
    )
    is_bullet = lambda l: (  # noqa: E731
        F.startswith(l, F.lit(GOPHER_BULLETS[0]))
        | F.startswith(l, F.lit(GOPHER_BULLETS[1]))
        | F.startswith(l, F.lit(GOPHER_BULLETS[2]))
        | F.startswith(l, F.lit(GOPHER_BULLETS[3]))
    )
    mwl = (
        F.aggregate(
            toks_c, F.lit(0.0), lambda acc, tk: acc + F.length(tk).cast("double")
        )
        / nz
    )
    scored_docs = bound.select(
        "doc_id",
        "lang",
        _mscore("en").alias("_s_en"),
        _mscore("es").alias("_s_es"),
        _mscore("fr").alias("_s_fr"),
        _mscore("de").alias("_s_de"),
        mwl.alias("_mwl"),
        ((ntok >= 50) & (ntok <= 100_000)).alias("words_ok"),
        ((n_hash.cast("double") / nz) <= 0.1).alias("hash_ok"),
        ((n_ellipsis.cast("double") / nz) <= 0.1).alias("ellipsis_sym_ok"),
        (
            (F.size(F.filter(lines_c, is_bullet)).cast("double") / nl) <= 0.9
        ).alias("bullet_ok"),
        (
            (
                F.size(
                    F.filter(
                        lines_c,
                        lambda l: F.endswith(l, F.lit("..."))
                        | F.endswith(l, F.lit("…")),
                    )
                ).cast("double")
                / nl
            )
            <= 0.3
        ).alias("ellipsis_ok"),
        (
            (
                F.size(F.filter(toks_c, lambda tk: tk.rlike("[a-z]"))).cast(
                    "double"
                )
                / nz
            )
            >= 0.8
        ).alias("alpha_ok"),
        (
            F.size(
                F.array_intersect(
                    F.array_distinct(toks_c),
                    F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
                )
            )
            >= 2
        ).alias("stopword_ok"),
    )
    s_en, s_es = F.col("_s_en"), F.col("_s_es")
    s_fr, s_de = F.col("_s_fr"), F.col("_s_de")
    pred = (
        F.when((s_en >= s_es) & (s_en >= s_fr) & (s_en >= s_de), F.lit("en"))
        .when((s_es >= s_fr) & (s_es >= s_de), F.lit("es"))
        .when(s_fr >= s_de, F.lit("fr"))
        .otherwise(F.lit("de"))
    )
    mwl_ok = (F.col("_mwl") >= 3.0) & (F.col("_mwl") <= 10.0)
    rates = temperature_rates(docs, "lang", _TEMP_ALPHA, _TEMP_FRAC)
    # token-weighted variant (r7 merge): same α and frac, mass = token
    # count — the rate table the operator would use under a TOKEN
    # budget; membership stays the per-doc hash rule
    from solarpaneldatawrangler_spark.functions.text import token_count

    wrates = temperature_rates(
        docs.withColumn("_ntok", token_count(t)),
        "lang",
        _TEMP_ALPHA,
        _TEMP_FRAC,
        weight_col="_ntok",
    ).select(
        "lang",
        F.col("_n").alias("_wn"),
        F.col("_rate").alias("_wrate"),
    )
    lm = bigram_lm_score(docs)
    from solarpaneldatawrangler_spark.operators.sketches import (
        hll_estimate,
        hll_sketch,
    )

    toks = docs.select(
        "lang",
        F.explode(tokens(F.coalesce(F.col("text"), F.lit("")))).alias("tok"),
    )
    hll = hll_estimate(hll_sketch(toks, F.col("tok"), ["lang"]), ["lang"])
    hexact = toks.groupBy("lang").agg(
        F.countDistinct("tok").alias("lang_distinct_tok")
    )
    # rule columns: mwl_ok is derived from the projected _mwl (its two
    # threshold references would otherwise run the length fold twice);
    # the other seven ride through as booleans computed once above
    rule_cols = {r: F.col(r) for r in _GOPHER_RULES}
    rule_cols["mwl_ok"] = mwl_ok
    return (
        scored_docs.join(F.broadcast(rates), "lang")
        .join(F.broadcast(wrates), "lang")
        .join(lm, "doc_id")
        # LEFT: a lang whose every doc has NULL/whitespace-only text
        # emits no token rows, so it is absent from the aggregates —
        # an inner join would silently drop that lang's docs from the
        # whole q53 output (review-caught coverage regression)
        .join(F.broadcast(hll), "lang", "left")
        .join(F.broadcast(hexact), "lang", "left")
        .select(
            "doc_id",
            "lang",
            pred.alias("pred_lang"),
            F.col("_n").alias("lang_n"),
            F.col("_rate").alias("lang_rate"),
            (hash_bucket(F.col("doc_id")) < F.col("_rate")).alias("kept"),
            F.col("_wn").alias("lang_wn"),
            F.col("_wrate").alias("lang_wrate"),
            (hash_bucket(F.col("doc_id")) < F.col("_wrate")).alias("wkept"),
            "lm_sum_r",
            "lm_n",
            *[rule_cols[r].alias(r) for r in _GOPHER_RULES],
            _and_all(
                [rule_cols[r] for r in _GOPHER_RULES]
            ).alias("gopher_ok"),
            "hll_zeros",
            "hll_est_r",
            "lang_distinct_tok",
            split_assign(F.col("doc_id"), _SPLIT_FRACTIONS).alias("split"),
            (
                F.greatest(s_en, s_es, s_fr, s_de)
                - F.greatest(
                    F.least(s_en, s_es), F.least(s_en, s_fr),
                    F.least(s_en, s_de), F.least(s_es, s_fr),
                    F.least(s_es, s_de), F.least(s_fr, s_de),
                )
            ).alias("lang_margin"),
        )
    )


# --- MinHash signatures (oracle-checkable md5 hash family) ------------------

_SQL_SHINGLES = (
    "list_distinct(list_transform("
    "range(1, GREATEST(len(toks) - 1, 1)), "
    "i -> array_to_string(list_slice(toks, i, i + 2), ' ')))"
)

def _q54_canon_ctes() -> str:
    from solarpaneldatawrangler_spark.operators.curation import (
        canonical_url_sql,
    )

    return f"""
    ucanon AS (
        SELECT doc_id, {canonical_url_sql(_CANON_URL_SQL)} AS canon_url
        FROM documents
    ),
    ufirst AS (
        SELECT doc_id, canon_url,
               doc_id = MIN(doc_id) OVER (PARTITION BY canon_url)
                   AS url_first
        FROM ucanon
    )"""


@register(
    "q54_minhash_signature",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
    ),
    sh AS (
        SELECT doc_id, unnest({_SQL_SHINGLES}) AS t FROM toks
    ),
    hv AS (
        SELECT doc_id, g.i,
               ((2 * g.i + 1) * (('0x' || substr(md5(t), 1, 8))::BIGINT) + 13 * g.i)
                 % 2147483647 AS h
        FROM sh CROSS JOIN generate_series(0, 7) g(i)
    ),
    sig AS (
        SELECT doc_id, i AS hash_idx, MIN(h) AS min_hash
        FROM hv GROUP BY doc_id, i
    ),
    u AS (SELECT doc_id, {_URL_TEXT_SQL} AS text FROM documents),
    uh AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), 'https?://([a-z0-9.-]+)', 1)
                 AS hosts
        FROM u
    ),
    usfx AS (
        SELECT doc_id, unnest(list_transform(
                   generate_series(1, len(string_split(hh.h, '.'))),
                   i -> array_to_string(string_split(hh.h, '.')[i:], '.')))
                 AS s
        FROM (SELECT doc_id, unnest(hosts) AS h FROM uh) hh
    ),
    ublocked AS (SELECT DISTINCT doc_id FROM usfx WHERE s IN ({_URL_BL_SQL})),
    uflags AS (
        SELECT uh.doc_id,
               CAST(len(hosts) AS BIGINT) AS n_urls,
               COALESCE(hosts[1], '') AS url_host,
               (b.doc_id IS NOT NULL) AS url_blocked
        FROM uh LEFT JOIN ublocked b USING (doc_id)
    ),
    {_q54_canon_ctes()}
    SELECT sig.doc_id, sig.hash_idx, sig.min_hash,
           f.n_urls, f.url_host, f.url_blocked,
           uf.canon_url, uf.url_first
    FROM sig JOIN uflags f ON f.doc_id = sig.doc_id
    JOIN ufirst uf ON uf.doc_id = sig.doc_id
    """,
    doc="MinHash signature (8 perms) over distinct 3-word shingles; "
    "md5-derived universal hashes so any engine reproduces it. Production "
    "path swaps in xxhash64 (reproducible=False). MERGED (r7) with the "
    "URL/domain blocklist admission gate (operators.curation): each row "
    "carries n_urls / url_host / url_blocked computed over a derived "
    "URL-injected corpus (the driver documents cite no URLs) — "
    "url_blocked pins host extraction AND the subdomain suffix-chain "
    "blocklist match (a.b.example.com blocked by entry example.com). "
    "ALSO MERGED (r10b): URL canonicalization + first-seen URL dedup "
    "(operators.curation.canonical_url / url_first_seen — the stage-0 "
    "dedup of every web pipeline, run before any content hash because "
    "it reads only the URL column): lowercase, fragment dropped, "
    "utm_*/fbclid/gclid tracking params stripped, trailing slash "
    "normalized, then a deterministic min-id first-seen verdict per "
    "canonical key over a tracking-decorated derived URL (105 "
    "colliding keys — real dup structure). Hashed surfaces: "
    "(hash_idx, min_hash) = minhash_from_shingle_rows; (n_urls, "
    "url_host, url_blocked) = curation.doc_url_flags; (canon_url, "
    "url_first) = canonical_url + url_first_seen via the shared "
    "canonical_url_sql builder.",
)
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.operators.curation import doc_url_flags
    from solarpaneldatawrangler_spark.operators.dedup import (
        minhash_from_shingle_rows,
        shingle_rows,
    )

    docs = load_table(spark, sf_dir, "documents")
    shx = shingle_rows(docs, "text", "doc_id", 3)
    sig = minhash_from_shingle_rows(shx, num_hashes=8, reproducible=True)
    # unpivot (id, m0..m7) -> (doc_id, hash_idx, min_hash)
    sig_rows = sig.select(
        F.col("id").alias("doc_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("hash_idx"), F.col(f"m{i}").alias("min_hash")
                    )
                    for i in range(8)
                ]
            )
        ).alias("s"),
    ).select("doc_id", "s.hash_idx", "s.min_hash")
    url_docs = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://www"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".blog"), (F.col("doc_id") % 5).cast("string"),
            F.lit(".example"), (F.col("doc_id") % 3).cast("string"),
            F.lit(".com/p and https://ok"), (F.col("doc_id") % 2).cast("string"),
            F.lit(".org/q"),
        ).alias("text"),
    )
    flags = doc_url_flags(url_docs, _URL_BLOCKLIST).select(
        "doc_id",
        F.col("n_urls").cast("long").alias("n_urls"),
        "url_host",
        "url_blocked",
    )
    from solarpaneldatawrangler_spark.operators.curation import (
        url_first_seen,
    )

    curl = F.concat(
        F.lit("https://Track"), (F.col("doc_id") % 3).cast("string"),
        F.lit(".Example.com/p"), (F.col("doc_id") % 5).cast("string"),
        F.lit("/?utm_source=x&id="), (F.col("doc_id") % 7).cast("string"),
        F.lit("&fbclid=abc#frag"), (F.col("doc_id") % 2).cast("string"),
    )
    first = url_first_seen(
        docs.select("doc_id", curl.alias("url"))
    ).select("doc_id", "canon_url", "url_first")
    return sig_rows.join(F.broadcast(flags), "doc_id").join(
        F.broadcast(first), "doc_id"
    )


# --- MinHash LSH near-dup pairs ---------------------------------------------

@register(
    "q55_minhash_neardup",
    oracle=f"""
    WITH RECURSIVE corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
    ),
    toks AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0) AS toks
        FROM corpus
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, GREATEST(len(toks) - 1, 1)),
                   i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS shingles
        FROM toks
    ),
    shx AS (SELECT doc_id, unnest(shingles) AS t FROM sh),
    hv AS (
        SELECT doc_id, g.i,
               MIN(((2 * g.i + 1) * (('0x' || substr(md5(t), 1, 8))::BIGINT) + 13 * g.i)
                   % 2147483647) AS mh
        FROM shx CROSS JOIN generate_series(0, 15) g(i)
        GROUP BY doc_id, g.i
    ),
    bands AS (
        SELECT doc_id, i // 4 AS band,
               string_agg(mh::VARCHAR, ',' ORDER BY i) AS band_sig
        FROM hv GROUP BY doc_id, i // 4
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    ),
    verified AS (
        SELECT p.id_a, p.id_b,
               CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                 / len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS jaccard
        FROM pairs p
        JOIN sh sa ON sa.doc_id = p.id_a
        JOIN sh sb ON sb.doc_id = p.id_b
        WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                 / len(list_distinct(list_concat(sa.shingles, sb.shingles))) >= 0.5
    ),
    dedges AS (
        SELECT id_a AS src, id_b AS dst FROM verified
        UNION
        SELECT id_b, id_a FROM verified
    ),
    dnodes AS (SELECT DISTINCT src AS id FROM dedges),
    dreach(id, label) AS (
        SELECT id, id FROM dnodes
        UNION
        SELECT e.dst, r.label FROM dreach r JOIN dedges e ON r.id = e.src
    ),
    dcomp AS (SELECT id, MIN(label) AS component FROM dreach GROUP BY id)
    SELECT 'pair' AS method, id_a, id_b, jaccard FROM verified
    UNION ALL
    SELECT 'cluster' AS method, id AS id_a, component AS id_b,
           CAST(NULL AS DOUBLE) AS jaccard
    FROM dcomp
    UNION ALL
    SELECT 'leak' AS method, id_a, id_b, jaccard FROM verified
    WHERE {split_assign_sql('id_a', _SPLIT_FRACTIONS)}
          != {split_assign_sql('id_b', _SPLIT_FRACTIONS)}
    """,
    doc="MinHash LSH near-dup pairs (16 hashes, 4 bands) + exact Jaccard "
    "verify, over documents augmented with planted duplicates. The banded "
    "self-join is an equi-join on (band, band_sig) — hash-partitioned, "
    "no cross product. Oracle mirrors the banding exactly. MERGED (r7): "
    "transitive duplicate CLUSTERS (operators/clustering."
    "connected_components_edges over the verified pair graph — the "
    "SlimPajama-style step that turns a~b, b~c into one cluster with a "
    "deterministic min-id representative; pointer-jumping min-label "
    "loop, O(log diameter) rounds). Union-tagged by method. Hashed "
    "surfaces: 'pair' rows (id_a, id_b, jaccard — banding + verify); "
    "'cluster' rows (member id_a -> component id_b — replayed in SQL as "
    "recursive-CTE reachability, the q40 idiom). Bench pins the q55 "
    "headline to the pure pair workload; x_dedup_clusters times the "
    "cluster step. ALSO MERGED (r10b): the cross-split LEAKAGE AUDIT "
    "— 'leak' rows are the verified near-dup pairs whose deterministic "
    "train/valid/test labels (operators.sampling.split_assign, the "
    "SAME 90/5/5 carve q53's split column uses) differ: the governance "
    "check that a random document-level split leaks near-duplicate "
    "content across the train/eval boundary (the reason production "
    "splits run AFTER dedup, or split by cluster/url instead of doc). "
    "Zero extra shuffle: a scan-side label expression and a filter "
    "over the already-materialized pair relation.",
)
def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.operators.clustering import (
        connected_components_edges,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(planted)
    # the pair relation feeds BOTH output halves (pair rows + the CC
    # edge list); the lazy checkpoint materializes the whole minhash
    # pipeline once instead of re-executing it per branch
    pairs = minhash_near_dup_pairs(
        corpus,
        num_hashes=16,
        bands=4,
        shingle_k=3,
        jaccard_threshold=0.5,
        reproducible=True,
    ).localCheckpoint(eager=False)
    pair_rows = pairs.select(
        F.lit("pair").alias("method"), "id_a", "id_b", "jaccard"
    )
    comp = connected_components_edges(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    cluster_rows = comp.select(
        F.lit("cluster").alias("method"),
        F.col("id").alias("id_a"),
        F.col("component").alias("id_b"),
        F.lit(None).cast("double").alias("jaccard"),
    )
    from solarpaneldatawrangler_spark.operators.sampling import split_assign

    leak_rows = pairs.filter(
        split_assign(F.col("id_a"), _SPLIT_FRACTIONS)
        != split_assign(F.col("id_b"), _SPLIT_FRACTIONS)
    ).select(
        F.lit("leak").alias("method"), "id_a", "id_b", "jaccard"
    )
    return pair_rows.unionByName(cluster_rows).unionByName(leak_rows)


# --- SimHash fingerprints ----------------------------------------------------

# q84/q85-absorption params (r10): greedy-packing budget/shards and the
# LLaMA-style quality-tiered demo mixture (first five sources 4x, next
# five 2x, everything else 1x) — the exact workloads the retired
# queries gated
_PACK_MAX = 512
_PACK_SHARDS = 8
_PACK_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0)"
_MIX_WEIGHTS = {f"src{i}": (4 if i < 5 else 2) for i in range(10)}


def _q56_oracle() -> str:
    from solarpaneldatawrangler_spark.operators.mixing import (
        mixture_case_sql,
    )
    from solarpaneldatawrangler_spark.operators.packing import (
        balanced_shards_sql,
    )

    w_case, s_case, _ = mixture_case_sql(_MIX_WEIGHTS)
    bal_sql = balanced_shards_sql(
        f"CAST(COALESCE(len({_PACK_TOKS}), 0) AS BIGINT)",
        "doc_id",
        _PACK_SHARDS,
        "documents",
    )
    return f"""
    WITH RECURSIVE tk AS (
        SELECT doc_id, unnest({_SQL_TOKS}) AS t FROM documents
    ),
    hv AS (
        SELECT doc_id, t, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tk
    ),
    bits AS (
        SELECT doc_id, g.b,
               CASE WHEN SUM(CASE WHEN (h >> g.b) & 1 = 1 THEN 1 ELSE -1 END) > 0
                    THEN 1::BIGINT ELSE 0::BIGINT END AS bit
        FROM hv CROSS JOIN generate_series(0, 63) g(b)
        GROUP BY doc_id, g.b
    ),
    sh AS (
        SELECT doc_id, CAST(SUM(bit << b) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id
    ),
    k AS (
        SELECT doc_id,
               ('0x' || substr(md5('7:' || doc_id), 1, 8))::BIGINT % 16
                 AS shard,
               md5('7:' || doc_id) AS skey
        FROM documents
    ),
    pos AS (
        SELECT doc_id, shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY shard
                                       ORDER BY skey, doc_id) AS BIGINT)
                 AS shard_pos
        FROM k
    ),
    pktoks AS (
        SELECT doc_id,
               CAST(COALESCE(len({_PACK_TOKS}), 0) AS BIGINT) AS n_tokens,
               CAST(doc_id % {_PACK_SHARDS} AS INT) AS shard,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id % {_PACK_SHARDS} ORDER BY doc_id
               ) AS rn
        FROM documents
    ),
    pkpacked AS (
        SELECT shard, rn, doc_id, n_tokens,
               CAST(0 AS BIGINT) AS seq, CAST(0 AS BIGINT) AS pack_offset
        FROM pktoks WHERE rn = 1
        UNION ALL
        SELECT t.shard, t.rn, t.doc_id, t.n_tokens,
               CASE WHEN p.pack_offset + p.n_tokens > 0
                     AND p.pack_offset + p.n_tokens + t.n_tokens > {_PACK_MAX}
                    THEN p.seq + 1 ELSE p.seq END,
               CASE WHEN p.pack_offset + p.n_tokens > 0
                     AND p.pack_offset + p.n_tokens + t.n_tokens > {_PACK_MAX}
                    THEN CAST(0 AS BIGINT)
                    ELSE p.pack_offset + p.n_tokens END
        FROM pkpacked p JOIN pktoks t ON t.shard = p.shard AND t.rn = p.rn + 1
    ),
    pk AS (
        SELECT doc_id, n_tokens AS pack_ntok, shard AS pack_shard,
               CAST(shard AS BIGINT) * 1099511627776 + seq AS pack_id,
               pack_offset
        FROM pkpacked
    ),
    bal AS (
        SELECT id AS doc_id, bal_shard
        FROM ({bal_sql}) b
    ),
    mx AS (
        SELECT doc_id, source,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY doc_id) - 1 AS BIGINT)
                   AS mix_rank,
               CAST({w_case} AS INT) AS mix_weight,
               (2 * CAST(ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY doc_id) - 1 AS BIGINT) + 1)
                 * CAST({s_case} AS BIGINT) AS mix_key
        FROM documents
    )
    SELECT sh.doc_id, sh.simhash, pos.shard, pos.shard_pos,
           pk.pack_ntok, pk.pack_shard, pk.pack_id, pk.pack_offset,
           mx.source, mx.mix_rank, mx.mix_weight, mx.mix_key,
           bal.bal_shard
    FROM sh
    JOIN pos ON pos.doc_id = sh.doc_id
    JOIN pk ON pk.doc_id = sh.doc_id
    JOIN mx ON mx.doc_id = sh.doc_id
    JOIN bal ON bal.doc_id = sh.doc_id
    """


@register(
    "q56_simhash",
    oracle=_q56_oracle(),
    doc="64-bit SimHash (Charikar'02) over tokens, md5-based reproducible "
    "hash family; near-dup candidates come from band equality "
    "(operators.dedup.simhash_bands). MERGED (r7) with deterministic "
    "training-shard assignment (operators.curation.shuffle_shards, seed=7, "
    "16 shards): shard + shard_pos pin the full reproducible corpus "
    "permutation — md5-keyed shard membership AND the per-shard order. "
    "ALSO MERGED (r10, absorbing retired q84 + q85 — both are corpus "
    "LAYOUT orderings, the shard/permutation family): pack_ntok / "
    "pack_shard / pack_id / pack_offset pin greedy sequence packing "
    "(operators.packing.pack_sequences, GPT-3/T5 next-fit into 512-"
    "token sequences within 8 hash shards; oracle = the per-shard "
    "recursive-CTE next-fit replay — text never shuffles, only "
    "(id, n_tokens, shard) rows); source / mix_rank / mix_weight / "
    "mix_key pin stride-scheduled domain mixing (operators.mixing."
    "mixture_order, Waldspurger 1994 — exact integer virtual-time "
    "keys, every prefix holds each source within O(1) of its target "
    "share; oracle via the shared mixture_case_sql builder). ALSO "
    "MERGED (r10b): bal_shard — snake-draft WEIGHT-BALANCED sharding "
    "(operators.packing.balanced_shards): rank by (token count desc, "
    "id), deal rank r to shard r%N on even rounds and reversed on odd "
    "— equal row counts AND shard token-mass spread bounded by "
    "~w_max (property-tested), the no-straggler layout for "
    "data-parallel readers; map-only under rank_col at scale, shared "
    "balanced_shards_sql oracle. Hashed surfaces: simhash; (shard, "
    "shard_pos); pack_*; mix_*; bal_shard.",
)
def q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.operators.curation import shuffle_shards
    from solarpaneldatawrangler_spark.operators.dedup import simhash_df
    from solarpaneldatawrangler_spark.operators.mixing import mixture_order
    from solarpaneldatawrangler_spark.operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    sh = simhash_df(docs, "text", "doc_id", reproducible=True)
    shards = shuffle_shards(docs, n_shards=16, seed="7").select(
        "doc_id",
        F.col("shard").cast("long").alias("shard"),
        F.col("shard_pos").cast("long").alias("shard_pos"),
    )
    pack = pack_sequences(
        docs, max_tokens=_PACK_MAX, n_shards=_PACK_SHARDS
    ).select(
        "doc_id",
        F.col("n_tokens").alias("pack_ntok"),
        F.col("shard").alias("pack_shard"),
        "pack_id",
        "pack_offset",
    )
    mix = mixture_order(docs, _MIX_WEIGHTS).select(
        "doc_id",
        "source",
        F.col("src_rank").alias("mix_rank"),
        F.col("weight").alias("mix_weight"),
        "mix_key",
    )
    from solarpaneldatawrangler_spark.operators.packing import (
        balanced_shards,
    )

    # weight = the SAME token count pack_sequences computed (pack_ntok)
    bal = balanced_shards(
        pack.select("doc_id", "pack_ntok"),
        _PACK_SHARDS,
        weight_col="pack_ntok",
    ).select("doc_id", "bal_shard")
    return (
        sh.join(shards, "doc_id")
        .join(pack, "doc_id")
        .join(mix, "doc_id")
        .join(bal, "doc_id")
    )


# --- n-gram Jaccard + cross-corpus near-dup pairs (merged r7) ---------------

# cross-corpus admission probe: odd doc_ids are the ingest batch, even
# ones the standing corpus; threshold 0.1 because the synthetic docs are
# templated enough to collide there (the same split/threshold
# tests/test_incremental_store.py oracles)
_CROSS_THR = 0.1

# r13: the xcross / xstore hashed jaccards round their exact rationals
# (intersect/union counts; agreeing-components/16) via the shared
# integer helper — the WHERE thresholds keep the raw double compare
_XCROSS_R6 = round_ratio_half_away_sql(
    "len(list_intersect(sa.shingles, sb.shingles))",
    "GREATEST(len(list_distinct(list_concat(sa.shingles, sb.shingles))), 1)",
    6,
    assume_nonneg=True,
)
_XSTORE_R6 = round_ratio_half_away_sql(
    "len(list_filter(range(1, 17),"
    " i -> sa.sig[CAST(i AS INT)] = sb.sig[CAST(i AS INT)]))",
    "16",
    6,
    assume_nonneg=True,
)

_CROSS_CTES = rf"""
    xsides AS (
        SELECT doc_id, text, doc_id % 2 = 1 AS is_batch FROM documents
    ),
    xtoks AS (
        SELECT doc_id, is_batch,
               list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0) AS toks
        FROM xsides
    ),
    xsh AS (
        SELECT doc_id, is_batch,
               list_distinct(list_transform(
                   range(1, GREATEST(len(toks) - 1, 1)),
                   i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS shingles
        FROM xtoks
    ),
    xshx AS (SELECT doc_id, is_batch, unnest(shingles) AS t FROM xsh),
    xhv AS (
        SELECT doc_id, is_batch, g.i,
               MIN(((2 * g.i + 1) * (('0x' || substr(md5(t), 1, 8))::BIGINT) + 13 * g.i)
                   % 2147483647) AS mh
        FROM xshx CROSS JOIN generate_series(0, 15) g(i)
        GROUP BY doc_id, is_batch, g.i
    ),
    xbands AS (
        SELECT doc_id, is_batch, i // 4 AS band,
               string_agg(mh::VARCHAR, ',' ORDER BY i) AS band_sig
        FROM xhv GROUP BY doc_id, is_batch, i // 4
    ),
    xpairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM xbands a JOIN xbands b
          ON a.band = b.band AND a.band_sig = b.band_sig
        WHERE a.is_batch AND NOT b.is_batch
    ),
    xcross AS (
        SELECT p.id_a, p.id_b,
               {_XCROSS_R6} AS jaccard
        FROM xpairs p
        JOIN xsh sa ON sa.doc_id = p.id_a
        JOIN xsh sb ON sb.doc_id = p.id_b
        WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                 / len(list_distinct(list_concat(sa.shingles, sb.shingles))) >= 0.1
    ),
    xsig AS (
        SELECT doc_id, is_batch, list(mh ORDER BY i) AS sig
        FROM xhv GROUP BY doc_id, is_batch
    ),
    xstore AS (
        SELECT p.id_a, p.id_b,
               {_XSTORE_R6} AS jaccard
        FROM xpairs p
        JOIN xsig sa ON sa.doc_id = p.id_a
        JOIN xsig sb ON sb.doc_id = p.id_b
        WHERE CAST(len(list_filter(range(1, 17),
                  i -> sa.sig[CAST(i AS INT)] = sb.sig[CAST(i AS INT)]))
                AS DOUBLE) / 16.0 >= 0.1
    )
"""


# q57's persisted signature store, built once per (process, sf_dir)
# from the even-id corpus with the reproducible (md5) hash family so
# the oracle can re-derive the signatures in SQL
_Q57_STORES: dict[str, str] = {}


def _q57_sig_store(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir in _Q57_STORES:
        return _Q57_STORES[sf_dir]
    import atexit
    import shutil
    import tempfile

    from solarpaneldatawrangler_spark.operators.dedup import write_minhash_store

    d = tempfile.mkdtemp(prefix="q57_sig_store_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    corpus = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    write_minhash_store(
        corpus.filter(F.col("doc_id") % 2 == 0),
        d,
        num_hashes=16,
        bands=4,
        reproducible=True,
    )
    _Q57_STORES[sf_dir] = d
    return d


@register(
    "q57_ngram_jaccard",
    oracle=f"""
    WITH {_CROSS_CTES},
    adjsh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, GREATEST(length(lower(text)) - 1, 1)),
                   i -> substr(lower(text), i, 3))) AS grams
        FROM documents
    )
    SELECT 'adjacent' AS method, a.doc_id AS id_a, b.doc_id AS id_b,
           {round_ratio_half_away_sql(
               "len(list_intersect(a.grams, b.grams))",
               "GREATEST(len(list_distinct(list_concat(a.grams, b.grams))), 1)",
               6, assume_nonneg=True)} AS jaccard
    FROM adjsh a JOIN adjsh b ON b.doc_id = a.doc_id + 1
    UNION ALL
    SELECT 'cross' AS method, id_a, id_b, jaccard FROM xcross
    UNION ALL
    SELECT 'store' AS method, id_a, id_b, jaccard FROM xstore
    """,
    doc="Character-3-gram Jaccard between consecutive doc ids (the "
    "exact-verify kernel used by every near-dup path, as pure array "
    "expressions) MERGED (r7) with cross-corpus MinHash near-dup "
    "admission (operators/dedup.minhash_cross_dup_pairs): odd-id docs "
    "as the ingest batch vs even-id docs as the standing corpus, banded "
    "(16 hashes / 4 bands) batch x corpus equi-join — the corpus is "
    "never self-joined — with exact shingle-Jaccard verify at 0.1. "
    "ALSO MERGED (r7b): the same probe against a REAL persisted "
    "signature store (operators/dedup.write_minhash_store + "
    "minhash_cross_dup_pairs_store, built once per sf_dir in a temp "
    "dir): 'store' rows carry the MinHash-ESTIMATOR jaccard (agreeing "
    "components / 16), whose SQL replay re-derives the signatures from "
    "documents — pinning the store write, the meta-driven banding, and "
    "the estimator verify end-to-end. Union-tagged by method. Hashed "
    "surfaces: 'adjacent' rows (the original q57); 'cross' rows "
    "(exact-verify admission); 'store' rows (durable-store admission).",
)
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.operators.dedup import (
        char_ngram_set_jaccard_r6,
        minhash_cross_dup_pairs,
        minhash_cross_dup_pairs_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    # r17 (guide §4.2 + §2.3): the adjacent arm joins LOWERED TEXT
    # (one JVM lower per doc — Python never case-maps) instead of the
    # materialized distinct-gram arrays, so the adjacency self-join
    # shuffles ~1x text bytes instead of the ~3-4x gram arrays, and the
    # gram sets + intersection run as C-speed set ops in one Arrow
    # batch pass (char_ngram_set_jaccard_r6) instead of the interpreted
    # per-offset transform + array_distinct + array_intersect/union
    # (53.4 s -> ~2 s at sf1). Same exact rational, same 6dp integer
    # rounding; the oracle still replays the array form.
    sh = docs.select("doc_id", F.lower(F.col("text")).alias("lt"))
    a, b = sh.alias("a"), sh.alias("b")
    adjacent = (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .select(
            F.lit("adjacent").alias("method"),
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            char_ngram_set_jaccard_r6(
                F.col("a.lt"), F.col("b.lt"), 3
            ).alias("jaccard"),
        )
    )
    slim = docs.select("doc_id", "text")
    cross = minhash_cross_dup_pairs(
        slim.filter(F.col("doc_id") % 2 == 1),
        slim.filter(F.col("doc_id") % 2 == 0),
        jaccard_threshold=_CROSS_THR,
        reproducible=True,
    ).select(
        F.lit("cross").alias("method"),
        F.col("batch_id").alias("id_a"),
        F.col("corpus_id").alias("id_b"),
        round_ratio_half_away(
            F.col("jacc_n"), F.greatest(F.col("jacc_d"), F.lit(1).cast("long")), 6
        ).alias("jaccard"),
    )
    storep = minhash_cross_dup_pairs_store(
        slim.filter(F.col("doc_id") % 2 == 1),
        _q57_sig_store(spark, sf_dir),
        sim_threshold=_CROSS_THR,
    ).select(
        F.lit("store").alias("method"),
        F.col("batch_id").alias("id_a"),
        F.col("corpus_id").alias("id_b"),
        # est_jaccard = matches/16 exactly; ROUND(est*16) recovers the
        # integer match count losslessly for the exact 6dp rounding
        round_ratio_half_away(
            F.round(F.col("est_jaccard") * 16).cast("long"),
            F.lit(16).cast("long"),
            6,
        ).alias("jaccard"),
    )
    return adjacent.unionByName(cross).unionByName(storep)


# --- brute-force ANN (exact cosine top-k) -----------------------------------

@register(
    "q58_ann_bruteforce",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
                                            CAST(c.embedding AS DOUBLE[])), 4) AS cosine_sim_r
        FROM embeddings c CROSS JOIN q
        WHERE c.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cosine_sim_r,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine_sim_r DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT r.query_id, r.neighbor_id, r.cosine_sim_r, r.rank,
           ROUND(sqrt(list_aggregate(list_transform(e.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 4)
             AS neighbor_norm
    FROM ranked r JOIN embeddings e ON e.vec_id = r.neighbor_id
    WHERE r.rank <= 10
    """,
    doc="Exact cosine top-k: queries broadcast, corpus streamed through one "
    "narrow stage (F.aggregate/zip_with dot product, JVM-side), per-query "
    "row_number keeps k. Cosine rounded to 4dp before ranking with id "
    "tiebreak so float-summation-order differences can't flip ranks. "
    "Each surviving neighbor also carries its L2 norm (the embedding-"
    "stats probe, functions.vectors.norm) via a broadcast join of the "
    "k-row survivor set back to embeddings.",
)
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.functions.vectors import norm

    emb = load_table(spark, sf_dir, "embeddings")
    # k=50 buffer: the final ranking uses ROUNDED cosine with id
    # tiebreak, so exact-rank 11+ candidates can enter the rounded
    # top-10 at 4dp collisions — keep enough exact candidates that the
    # rounded cut matches the all-pairs oracle
    out = brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=50
    )
    # re-rank on the rounded value (matching the oracle exactly)
    from pyspark.sql import Window

    rounded = out.withColumn("cosine_sim_r", F.round("cosine_sim", 4))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim_r"), F.asc("neighbor_id")
    )
    topk = (
        rounded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", "cosine_sim_r", "rank")
    )
    norms = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.round(norm(F.col("embedding")), 4).alias("neighbor_norm"),
    )
    # survivors are queries*k rows — broadcast THEM, stream the norms scan
    return F.broadcast(topk).join(norms, "neighbor_id").select(
        "query_id", "neighbor_id", "cosine_sim_r", "rank", "neighbor_norm"
    )


# --- LSH-bucketed ANN (scale path; rows-only check) -------------------------

def planes_values_sql(n_tables: int, n_planes: int, dim: int) -> str:
    """The deterministic hyperplanes (identical constants to
    operators.similarity._default_planes, repr round-trip so the binary
    doubles match) as a SQL VALUES body (t, i, j, w) — lets DuckDB
    replay sign-LSH signatures exactly."""
    from solarpaneldatawrangler_spark.operators.similarity import _default_planes

    rows = []
    for t in range(n_tables):
        planes = _default_planes(dim, n_planes, seed=t)
        for i, plane in enumerate(planes):
            for j, w in enumerate(plane):
                rows.append(f"({t},{i},{j + 1},{w!r})")
    return ",\n".join(rows)


def _lsh_oracle_sql() -> str:
    """Reproduce the LSH bucketing relationally: hyperplanes go into a
    VALUES table; signatures = sign-bit strings per (vec, table);
    candidates = signature collisions in any table; re-rank by cosine
    rounded to 4dp with id tiebreak (same contract as q58)."""
    values = planes_values_sql(n_tables=10, n_planes=4, dim=64)
    return f"""
    WITH planes(t, i, j, w) AS (VALUES {values}),
    comps AS (
        SELECT e.vec_id, p.t, p.i, SUM(CAST(e.embedding[p.j] AS DOUBLE) * p.w) AS dot
        FROM embeddings e
        JOIN planes p ON p.j <= len(e.embedding)
        GROUP BY e.vec_id, p.t, p.i
    ),
    sigs AS (
        SELECT vec_id, t,
               CAST(SUM(CASE WHEN dot >= 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS sig
        FROM comps GROUP BY vec_id, t
    ),
    qs AS (SELECT vec_id, t, sig FROM sigs WHERE vec_id < 5),
    cands AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM qs q JOIN sigs c ON q.t = c.t AND q.sig = c.sig AND c.vec_id <> q.vec_id
    ),
    scored AS (
        SELECT cd.query_id, cd.neighbor_id,
               ROUND(list_cosine_similarity(CAST(eq.embedding AS DOUBLE[]),
                                            CAST(ec.embedding AS DOUBLE[])), 4) AS cosine_sim_r
        FROM cands cd
        JOIN embeddings eq ON eq.vec_id = cd.query_id
        JOIN embeddings ec ON ec.vec_id = cd.neighbor_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cosine_sim_r,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine_sim_r DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine_sim_r, rank FROM ranked WHERE rank <= 10
    """


def _pq_oracle_cte() -> str:
    """DuckDB replay of operators/pq as a CTE block: the trained
    codebooks (pq_codebooks_for_dir at ORACLE_SF_DIR — the SAME
    function/dir the Spark query uses, the q67 contract) as VALUES;
    per-subspace assignment = argmax(v_s.c - |c|^2/2) with low-code
    tiebreak; the query LUT reuses the same sub-dot CTE; ADC score =
    SUM of the query's m sub-dots at its neighbor's codes, rounded to
    4dp; rank with id tiebreak (q58 contract)."""
    from solarpaneldatawrangler_spark.operators.pq import (
        pq_books_values_sql,
        pq_codebooks_for_dir,
    )
    from solarpaneldatawrangler_spark.plans.catalog import ORACLE_SF_DIR

    books = pq_codebooks_for_dir(ORACLE_SF_DIR)
    sub = len(books[0][0])
    values = pq_books_values_sql(books)
    return f"""
    pqb(s, c, j, w) AS (VALUES {values}),
    pbn AS (SELECT s, c, SUM(w * w) AS n2 FROM pqb GROUP BY s, c),
    pdots AS (
        SELECT e.vec_id, b.s, b.c,
               SUM(CAST(e.embedding[b.s * {sub} + b.j] AS DOUBLE) * b.w) AS dot
        FROM embeddings e JOIN pqb b ON b.s * {sub} + b.j <= len(e.embedding)
        GROUP BY e.vec_id, b.s, b.c
    ),
    passign AS (
        SELECT vec_id, s, c FROM (
            SELECT d.vec_id, d.s, d.c,
                   ROW_NUMBER() OVER (PARTITION BY d.vec_id, d.s
                                      ORDER BY d.dot - n.n2 / 2 DESC, d.c)
                       AS rn
            FROM pdots d JOIN pbn n USING (s, c)
        ) WHERE rn = 1
    ),
    plut AS (
        SELECT vec_id AS query_id, s, c, dot AS lut
        FROM pdots WHERE vec_id < 5
    ),
    pscored AS (
        SELECT l.query_id, a.vec_id AS neighbor_id,
               ROUND(SUM(l.lut), 4) AS score_r
        FROM passign a JOIN plut l ON l.s = a.s AND l.c = a.c
        WHERE a.vec_id <> l.query_id
        GROUP BY l.query_id, a.vec_id
    ),
    pranked AS (
        SELECT query_id, neighbor_id, score_r,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score_r DESC, neighbor_id) AS rank
        FROM pscored
    )
    """


def _q59_oracle_or_none() -> str | None:
    """Union oracle for the merged q59: LSH rows tagged 'lsh' + PQ/ADC
    rows tagged 'pq'. The PQ half needs the driver's sf0.01 embeddings
    on disk at import time (codebook training); if absent, degrade to
    rows-only (q67's pattern)."""
    try:
        pq_cte = _pq_oracle_cte()
    except Exception:
        return None
    lsh = _lsh_oracle_sql()
    lsh_ctes = lsh.split("WITH", 1)[1].rsplit("SELECT query_id", 1)[0]
    return f"""
    WITH {lsh_ctes.rstrip().rstrip(",")},
    {pq_cte.strip().strip(",")}
    SELECT 'lsh' AS method, query_id, neighbor_id,
           cosine_sim_r AS score_r, rank
    FROM ranked WHERE rank <= 10
    UNION ALL
    SELECT 'pq' AS method, query_id, neighbor_id, score_r, rank
    FROM pranked WHERE rank <= 10
    """


@register(
    "q59_ann_lsh",
    oracle=_q59_oracle_or_none(),
    doc="Approximate ANN by BOTH compressed-domain scale paths, union-"
    "tagged by method. 'lsh': random-hyperplane LSH bucketing + exact "
    "re-rank (equi-join on signature buckets instead of a cross "
    "product); hyperplanes replay in SQL as VALUES. 'pq' (r7): product "
    "quantization + asymmetric-distance top-k (operators/pq — Jegou et "
    "al. 2011): the corpus is compressed to m=8 codebook indices "
    "(~32-64x smaller than raw embeddings — at 100 TB the codes table "
    "is the ONLY thing scanned) and ranked by LUT-summed approximate "
    "inner product, rounded to 4dp with id tiebreak. Codebooks train "
    "on a bounded deterministic sample at ORACLE_SF_DIR and replay in "
    "SQL as VALUES, so DuckDB reproduces codes, LUTs, scores, and "
    "ranks exactly (q67 trained-quantizer contract). Hashed surfaces: "
    "LSH (method='lsh' rows), PQ encode+ADC (method='pq' rows).",
)
def q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from solarpaneldatawrangler_spark.operators.pq import (
        pq_adc_topk,
        pq_codebooks_for_dir,
        pq_encode,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = lsh_bucketed_topk(emb, queries, k=1_000_000, dim=64)
    # re-rank ALL candidates on the rounded cosine (q58 contract): the
    # unrounded rank's top-k could drop a candidate that reenters under
    # 4dp rounding + id tiebreak
    rounded = out.withColumn("cosine_sim_r", F.round("cosine_sim", 4))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim_r"), F.asc("neighbor_id")
    )
    lsh = (
        rounded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            F.lit("lsh").alias("method"),
            "query_id",
            "neighbor_id",
            F.col("cosine_sim_r").alias("score_r"),
            "rank",
        )
    )
    books = pq_codebooks_for_dir(sf_dir)
    pq = pq_adc_topk(
        pq_encode(emb, books), queries, books, k=10, rank_dp=4
    ).select(
        F.lit("pq").alias("method"),
        "query_id",
        "neighbor_id",
        F.round("approx_ip", 4).alias("score_r"),
        "rank",
    )
    return lsh.unionByName(pq)


# --- multimodal binary-column plumbing --------------------------------------

# q62 workload constants, shared by the Spark plan and the local mirror
_Q62_N_PIPELINE_DOCS = 20
_Q62_N_DEDUP_DOCS = 60
_Q62_SUPER_PX = 40
_Q62_GRID = 5
_Q62_ZOOM = 21
_Q62_THRESHOLD = 0.45


def _q62_expected_rows(sf_dir: str) -> list[tuple[str, int, int, int]]:
    """Single-process numpy replay of q62's three row families — the
    independent mirror behind the VALUES oracle (r12, judge item 1).

    Shares ONLY the data generators with the Spark plan (NumpyCodec,
    deterministic_pixels, bilinear_resize — the workload definition);
    the slice / stitch / classify / dHash-pair logic is re-derived
    here with plain dict-and-loop numpy, so agreement proves the
    DISTRIBUTED plumbing (mapInPandas slicing, explode-to-center
    shuffle stitch, iterator-UDF inference, banded self-join) preserves
    exact pixel semantics — not that two call sites ran one function.
    """
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq_

    from solarpaneldatawrangler_spark.operators.multimodal import (
        NumpyCodec,
        bilinear_resize,
        deterministic_pixels,
    )

    tbl = pq_.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    order = np.argsort(np.array(ids, dtype=np.int64), kind="stable")[
        : _Q62_N_DEDUP_DOCS
    ]
    docs = [(int(ids[i]), texts[i]) for i in order]

    codec = NumpyCodec()
    rows: list[tuple[str, int, int, int]] = []

    # --- pipeline + tilefp halves: slice -> stitch -> classify ---
    t = _Q62_SUPER_PX // _Q62_GRID  # tile edge in px
    tiles: dict[tuple[int, int], np.ndarray] = {}
    for doc_id, text in docs[:_Q62_N_PIPELINE_DOCS]:
        img = deterministic_pixels(
            _Q62_SUPER_PX, _Q62_SUPER_PX, text.encode("utf-8")[:32]
        )
        base_c, base_r = (doc_id % 10) * _Q62_GRID, (doc_id // 10) * _Q62_GRID
        for dc in range(_Q62_GRID):
            for dr in range(_Q62_GRID):
                tiles[(base_c + dc, base_r + dr)] = img[
                    dr * t : (dr + 1) * t, dc * t : (dc + 1) * t
                ]
    n_positive = 0
    for (c, r), _tile in tiles.items():
        canvas = np.zeros((3 * t, 3 * t, 3), dtype=np.uint8)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = tiles.get((c + dx, r + dy))
                if nb is not None:
                    canvas[
                        (dy + 1) * t : (dy + 2) * t, (dx + 1) * t : (dx + 2) * t
                    ] = nb
        payload = codec.encode(canvas)
        # same float ops as classify_tiles' mean_pixel_model
        score = float(np.frombuffer(payload, np.uint8, offset=12).mean()) / 255.0
        if score >= _Q62_THRESHOLD:
            n_positive += 1
        fp = int(hashlib.md5(payload).hexdigest()[:15], 16)
        rows.append(("tilefp", c, r, fp))
    rows.append(("pipeline", _Q62_ZOOM, len(tiles), n_positive))

    # --- imagedup half: dHash + exact all-pairs Hamming <= 3 ---
    # (banded candidates are a SUPERSET of hamming<=3 pairs by
    # pigeonhole — max_hamming=3 < bands=4 — so exact all-pairs over
    # the 60-image set equals the Spark banded-join output)
    weights = 1 << np.arange(64, dtype=np.uint64)
    hashes: list[tuple[int, int]] = []
    for doc_id, _text in docs:
        seed = (doc_id // 2).to_bytes(8, "big")
        arr = deterministic_pixels(_Q62_SUPER_PX, _Q62_SUPER_PX, seed)
        gray = arr.astype(np.float64).mean(axis=2, keepdims=True)
        small = bilinear_resize(np.rint(gray).astype(np.uint8), 8, 9).astype(
            np.int16
        )[:, :, 0]
        bits = (small[:, 1:] > small[:, :-1]).flatten()
        h = int((bits * weights).sum().astype(np.uint64))
        hashes.append((doc_id, h))
    hashes.sort()
    for i, (id_a, ha) in enumerate(hashes):
        for id_b, hb in hashes[i + 1 :]:
            ham = (ha ^ hb).bit_count()
            if ham <= 3:
                rows.append(("imagedup", id_a, id_b, ham))
    return rows


def _q62_oracle_or_none() -> str | None:
    """q62's oracle: the deterministic pixel-pipeline outputs computed
    by the numpy mirror above, replayed as a DuckDB VALUES table — the
    q59 hyperplanes / q67 centroids / q53 rate-table idiom for
    non-SQL-expressible but exactly-deterministic surfaces. Degrades
    to rows-only ONLY when the testdata parquet is genuinely absent at
    import (the q52/q53/q72 demotion contract)."""
    from solarpaneldatawrangler_spark.plans.catalog import ORACLE_SF_DIR

    try:
        rows = _q62_expected_rows(ORACLE_SF_DIR)
    except (OSError, ImportError, ValueError) as ex:
        # r12 ADVICE: this mirror runs a parquet read + ~500 md5s +
        # 60 bilinear resizes at package import — demote to rows-only
        # on ANY plausible environment failure (missing testdata ->
        # FileNotFoundError/OSError, corrupt parquet ->
        # pyarrow.ArrowInvalid which subclasses ValueError, missing
        # pyarrow -> ImportError) rather than aborting every import
        # of the plans package over one query's oracle
        import sys

        print(
            "WARNING: q62_multimodal_pipeline oracle demoted to rows-only "
            f"— mirror unavailable at import ({type(ex).__name__}: {ex})",
            file=sys.stderr,
        )
        return None
    values = ", ".join(f"('{m}', {a}, {b}, {v})" for m, a, b, v in rows)
    return f"""
    SELECT method, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           CAST(v AS BIGINT) AS v
    FROM (VALUES {values}) t(method, a, b, v)
    """


@register(
    "q62_multimodal_pipeline",
    oracle=_q62_oracle_or_none(),
    doc="G4-G8 imagery pipeline over the multimodal binary-column plumbing "
    "with REAL pixels through the injected NumpyCodec: deterministic "
    "pixel super-images (sha keystream) -> 25-way slice (mapInPandas "
    "flatMap, exact pixel windows) -> 3x3 stitch (explode-to-center + "
    "applyInPandas, one shuffle, exact canvas paste) -> batched "
    "mean-pixel inference (iterator pandas UDF) -> count of positives "
    "per zoom ('pipeline' rows: a=zoom, b=n_tiles, v=n_positive) PLUS "
    "a byte-exact fingerprint per stitched tile ('tilefp' rows: "
    "a=column, b=row, v=60-bit md5 prefix of the stitched canvas "
    "bytes, conv(substr(md5(content),1,15),16,10) — JVM-side codegen, "
    "r12). MERGED (r10, absorbing retired q86): 'imagedup' rows "
    "(a=id_a, b=id_b, v=hamming) carry image near-duplicate pairs "
    "(operators.multimodal.image_neardup_pairs, the LAION-style dedup "
    "step): dHash perceptual hash per image (decode -> grayscale -> "
    "bilinear 8x9 -> gradient sign bits, one BIGINT), 16-bit band "
    "equi-join candidates, exact bit_count(XOR) verify — pixels read "
    "once in one Arrow stage, only (id, 64-bit hash) rows shuffle; "
    "workload = deterministic NumpyCodec images with 30 planted twins. "
    "HASH-GATED (r12, closing the last rows-only surface): the full "
    "row set replays as a DuckDB VALUES oracle computed by an "
    "independent single-process numpy mirror (_q62_expected_rows — "
    "re-derived slice/stitch/classify/dHash logic, shared generators "
    "only), so the driver hash pins every stitched tile byte-exactly "
    "and every near-dup pair; pixel goldens remain in "
    "test_operators_unit.test_q62_pixel_golden + test_image_dedup.",
)
def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.plans.extension_queries2 import (
        image_neardup_workload,
    )

    def tagged(method, a, b, v):
        return [
            F.lit(method).alias("method"),
            a.cast("long").alias("a"),
            b.cast("long").alias("b"),
            v.cast("long").alias("v"),
        ]

    stitched = _q62_stitched(spark, sf_dir)
    pipeline_rows = _q62_pipeline(stitched).select(
        *tagged(
            "pipeline", F.col("zoom"), F.col("n_tiles"), F.col("n_positive")
        )
    )
    # byte-exact per-tile fingerprint, JVM-side all the way: md5 of the
    # stitched canvas payload, first 15 hex chars (60 bits) -> BIGINT
    tilefp_rows = stitched.select(
        *tagged(
            "tilefp",
            F.col("column"),
            F.col("row"),
            F.conv(F.substring(F.md5(F.col("content")), 1, 15), 16, 10),
        )
    )
    imagedup_rows = image_neardup_workload(spark, sf_dir).select(
        *tagged("imagedup", F.col("id_a"), F.col("id_b"), F.col("hamming"))
    )
    return pipeline_rows.unionByName(tilefp_rows).unionByName(imagedup_rows)


def _q62_stitched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared upstream of q62's pipeline and tilefp halves:
    super-image synthesis -> 25-way slice -> 3x3 stitch."""
    from solarpaneldatawrangler_spark.operators.multimodal import (
        NumpyCodec,
        deterministic_pixels,
        slice_grid,
        stitch_3x3,
    )
    import pandas as pd

    codec = NumpyCodec()
    # ordered take: a bare limit picks arbitrary rows per scan order
    docs = (
        load_table(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .limit(_Q62_N_PIPELINE_DOCS)
    )

    def to_image(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "column": (pdf["doc_id"] % 10) * _Q62_GRID,
                    "row": (pdf["doc_id"] // 10) * _Q62_GRID,
                    "zoom": _Q62_ZOOM,
                    "content": [
                        codec.encode(
                            deterministic_pixels(
                                _Q62_SUPER_PX,
                                _Q62_SUPER_PX,
                                t.encode("utf-8")[:32],
                            )
                        )
                        for t in pdf["text"]
                    ],
                }
            )

    supers = docs.mapInPandas(
        to_image, "column long, row long, zoom int, content binary"
    )
    tiles = slice_grid(supers, grid_size=_Q62_GRID, codec=codec)
    return stitch_3x3(tiles, codec=codec)


def _q62_pipeline(stitched: DataFrame) -> DataFrame:
    from solarpaneldatawrangler_spark.operators.multimodal import (
        classify_tiles,
    )
    import numpy as np

    def mean_pixel_model(payloads):
        return [
            float(np.frombuffer(p, dtype=np.uint8, offset=12).mean()) / 255.0
            for p in payloads
        ]

    scored = classify_tiles(stitched, model=mean_pixel_model)
    return scored.groupBy("zoom").agg(
        F.count(F.lit(1)).alias("n_tiles"),
        F.sum(
            F.when(F.col("panel_softmax") >= _Q62_THRESHOLD, 1).otherwise(0)
        ).alias("n_positive"),
    )


# one fingerprint store per (process, sf_dir) for the merged q61: the
# corpus half (even doc_ids) is written ONCE to a temp bucket-partitioned
# parquet store and probed by every later call — the bench _FP_STORE
# idiom; cleaned up at process exit
_Q61_STORE: dict[str, str] = {}


def _q61_store_dir(spark: SparkSession, sf_dir: str) -> str:
    got = _Q61_STORE.get(sf_dir)
    if got is not None:
        return got
    import atexit
    import shutil
    import tempfile

    from solarpaneldatawrangler_spark.operators.dedup import (
        write_fingerprint_store,
    )

    d = tempfile.mkdtemp(prefix="spark_graft_q61_fpstore_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    corpus = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", "text")
    )
    write_fingerprint_store(corpus, d)
    _Q61_STORE[sf_dir] = d
    return d


def _q61_oracle() -> str:
    from solarpaneldatawrangler_spark.operators.sketches import (
        bloom_probe_sql,
        bloom_sql,
    )

    members = (
        "(SELECT COALESCE(text, '') AS item FROM documents "
        "WHERE doc_id % 2 = 0) mem"
    )
    build = bloom_sql("item", members)
    probe = bloom_probe_sql("COALESCE(text, '')", "documents", "bloom")
    return f"""
    WITH bloom AS ({build}),
    probed AS ({probe})
    SELECT d.doc_id,
           octet_length(encode(d.text)) AS n_bytes,
           sha256(d.text) AS content_sha,
           md5(regexp_replace(trim(lower(d.text)), '\\s+', ' ', 'g')) NOT IN (
               SELECT md5(regexp_replace(trim(lower(c.text)), '\\s+', ' ', 'g'))
               FROM documents c WHERE c.doc_id % 2 = 0
           ) AS is_new,
           p.maybe_seen,
           (COALESCE(d.text, '') IN (
               SELECT COALESCE(text, '') FROM documents
               WHERE doc_id % 2 = 0)) AS truly_seen
    FROM documents d JOIN probed p ON p.item = COALESCE(d.text, '')
    """


@register(
    "q61_binary_meta",
    oracle=_q61_oracle(),
    doc="Multimodal binary-column plumbing: opaque binary payload + typed "
    "metadata (byte length, content hash) — the schema/partitioning "
    "pattern for image/audio columns (SURVEY §2.9 G4-G8; decode stubs "
    "live in operators.multimodal). MERGED (r7): incremental exact-dedup "
    "admission (operators/dedup.incremental_new_docs) against a REAL "
    "bucket-partitioned parquet fingerprint store of the even-id corpus "
    "half, written once per process — each row's is_new flag is the "
    "store-probe verdict (the batch's bucket set partition-prunes the "
    "store scan; the oracle replays the store from first principles as "
    "the even-id fingerprint set). ALSO MERGED (r10, absorbing retired "
    "q78 — the admission family's fast path): Bloom-filter membership "
    "(operators.sketches, Kirsch-Mitzenmacher double hashing) over the "
    "SAME even-id corpus half — the bitmap is a bit_or aggregate over "
    "m/32 BIGINT words (filter-sized shuffle, word-wise mergeable); "
    "the probe is a pure scan-side expression over the bitmap as a "
    "BinaryType plan literal — zero join, zero shuffle. maybe_seen="
    "false GUARANTEES absence, so definitely-new rows skip the durable "
    "store probe entirely (composition pinned in test_sketches); "
    "truly_seen rides along to expose false positives. Hashed "
    "surfaces: binary meta (n_bytes, content_sha); store admission "
    "(is_new); Bloom fast path (maybe_seen, truly_seen — via the "
    "shared bloom_sql/bloom_probe_sql builders).",
)
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.operators.dedup import incremental_new_docs
    from solarpaneldatawrangler_spark.operators.sketches import (
        bloom_build,
        bloom_maybe_contains,
    )

    docs = load_table(spark, sf_dir, "documents")
    store = _q61_store_dir(spark, sf_dir)
    admitted = incremental_new_docs(docs.select("doc_id", "text"), store).select(
        "doc_id", F.lit(True).alias("is_new")
    )
    item = F.coalesce(F.col("text"), F.lit(""))
    members = docs.filter(F.col("doc_id") % 2 == 0).select(item.alias("item"))
    bloom = bloom_build(members, F.col("item"))
    # the probe attaches scan-side to the per-doc rows directly (the
    # operator's own contract — zero join, zero shuffle); a
    # distinct-then-join-back formulation would regroup the corpus on
    # full document TEXT to evaluate a constant-size filter
    # (review-caught anti-pattern carried from retired q78). Only the
    # truly_seen ride-along pays a join, and it is a broadcast.
    probed = bloom_maybe_contains(
        bloom, docs.select("doc_id", item.alias("item")), "item"
    )
    member_set = members.distinct().withColumn("truly_seen", F.lit(True))
    bloom_cols = probed.join(F.broadcast(member_set), "item", "left").select(
        "doc_id",
        "maybe_seen",
        F.coalesce("truly_seen", F.lit(False)).alias("truly_seen"),
    )
    content = F.encode(F.col("text"), "UTF-8")
    return (
        docs.select(
            "doc_id",
            F.length(content).alias("n_bytes"),
            F.sha2(content, 256).alias("content_sha"),
        )
        .join(admitted, "doc_id", "left")
        .withColumn("is_new", F.coalesce("is_new", F.lit(False)))
        .join(bloom_cols, "doc_id")
    )


# --- C4 cleaning battery + DSIR: retired q71/q72/q73 — absorbed into
# q52_quality_score (r10) as ride-along per-doc columns (has_brace ..
# clean_fp; dsir_n / dsir_w_r / dsir_key_r / dsir_sel / dsir_thr_kept),
# hash-gated there. The workload builders stay as plain functions
# shared by q52 and kept importable for tests (the q82_workload idiom);
# bench's x_c4_filter / x_dsir time the operators directly.

def c4_filter_workload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retired q71 body verbatim: the C4 battery over the derived
    multi-line corpus. The kept-lines array is projected as a MULTI-
    referenced alias in its own step: CollapseProject refuses to
    inline a non-cheap alias referenced more than once, so the O(doc)
    line filter runs ONCE per row instead of once per derived column
    (struct fields would NOT achieve this — SimplifyExtractValueOps
    rewrites GetStructField(CreateNamedStruct) back into per-field
    copies; the HOF evaluates interpreted, so there is no codegen CSE
    to fall back on)."""
    from solarpaneldatawrangler_spark.functions.text import c4_kept_lines

    docs = load_table(spark, sf_dir, "documents")
    lt = _c4_ltext_spark()
    step = docs.select(
        "doc_id",
        lt.alias("_lt"),
        c4_kept_lines(lt).alias("_kept"),
    )
    cleaned = F.array_join(F.col("_kept"), "\n")
    n_sent = F.size(
        F.regexp_extract_all(cleaned, F.lit(r"[.!?]+"), F.lit(0))
    )
    has_brace = F.contains(F.coalesce(F.col("_lt"), F.lit("")), F.lit("{"))
    has_lorem = F.contains(
        F.lower(F.coalesce(F.col("_lt"), F.lit(""))), F.lit("lorem ipsum")
    )
    return step.select(
        "doc_id",
        has_brace.alias("has_brace"),
        has_lorem.alias("has_lorem"),
        F.size("_kept").cast("long").alias("n_kept_lines"),
        n_sent.cast("long").alias("n_sentences"),
        (~has_brace & ~has_lorem & (n_sent >= 3)).alias("c4_ok"),
        F.md5(cleaned).alias("clean_fp"),
    )


def dsir_workload(
    spark: SparkSession, sf_dir: str, ratios=None
) -> DataFrame:
    """The retired q72 body verbatim: (doc_id, dsir_n, dsir_w_r,
    dsir_key_r, sel). Two selects: dsir_key_r is built from the
    dsir_w_r COLUMN, not the weight expression — the dsir_select
    idiom, so the O(features) interpreted HOF fold runs ONCE per row
    (embedding w in both output and key ran it twice; HOF subtrees
    get no codegen CSE)."""
    from solarpaneldatawrangler_spark.operators.dsir import (
        dsir_gumbel_key,
        dsir_log_weight,
        dsir_ratios_for_dir,
    )

    docs = load_table(spark, sf_dir, "documents")
    if ratios is None:
        ratios = dsir_ratios_for_dir(sf_dir, n_buckets=_DSIR_B)
    t = F.col("text")
    # r17 (guide §1.2 per-task work, measured in the sf1 decomposition
    # probe): dsir_n never needed the feature ARRAY — |unigrams| +
    # |bigrams| = m + max(m-1, 0) over the token count, so the md5-per-
    # feature build that existed only to be counted is gone (it ran the
    # whole hash battery a second time). NULL text keeps its NULL count
    # (size(features of NULL) was NULL) via the otherwise branch.
    # dsir_w_r switches to the Arrow/NumPy impl ("pandas": int64
    # micro-unit sums — value-identical to the DECIMAL fold by
    # construction, pinned by tests/test_dsir.py and the untouched
    # VALUES-replay oracle; measured 6x the expr path's throughput).
    from solarpaneldatawrangler_spark.functions.text import tokens

    scored = docs.select(
        "doc_id",
        "text",
        F.size(tokens(t)).cast("long").alias("_m"),
    ).select(
        "doc_id",
        F.when(F.col("_m") >= 1, 2 * F.col("_m") - 1)
        .otherwise(F.col("_m"))
        .alias("dsir_n"),
        dsir_log_weight(t, ratios, impl="pandas").alias("dsir_w_r"),
    ).select(
        "doc_id",
        "dsir_n",
        "dsir_w_r",
        dsir_gumbel_key(
            F.col("dsir_w_r"), F.col("doc_id"), _DSIR_SEED
        ).alias("dsir_key_r"),
    )
    # r17: the scored relation feeds BOTH the top-k branch and the
    # join-back — without materialization the scan + weight scorer
    # execute once per branch (the plan showed two ArrowEvalPython
    # twins). Lazy localCheckpoint is the tfidf materialize_tf /
    # MinHash-shingle idiom; the relation is narrow (4 numeric cols,
    # text never moves), so it is the 100 TB shape too.
    scored = scored.localCheckpoint(eager=False)
    top = (
        scored.orderBy(F.col("dsir_key_r").desc(), "doc_id")
        .limit(_DSIR_K)
        .select("doc_id", F.lit(True).alias("sel"))
    )
    return scored.join(top, "doc_id", "left").withColumn(
        "sel", F.coalesce("sel", F.lit(False))
    )
