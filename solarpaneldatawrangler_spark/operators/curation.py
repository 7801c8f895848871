"""Corpus-curation admission gates beyond dedup (SURVEY.md §2.12
extension family): URL/domain blocklist filtering, a hashed-linear
(fastText-style) quality classifier, and deterministic training-shard
assignment.

These are the three standard gates a CCNet/RefinedWeb/FineWeb-style
pipeline applies that this engine did not yet cover: a URL blocklist
(drop documents citing banned domains, with subdomain suffix matching),
a learned quality classifier (here: the exact hashed-bag-of-words
linear architecture fastText uses, with injectable weights), and the
final deterministic shuffle into training shards.

100 TB shape:
- `url_blocklist_filter`: host extraction and the suffix chain are
  scan-side codegen; the blocklist is a broadcast equi-join on the
  exploded suffix chain (bounded ~5 rows/host). The corpus never
  shuffles — verdicts come back via a broadcast semi/anti join on id.
- `hashed_linear_score`: entirely inside the scan (aggregate over the
  token array), zero shuffle, zero Python. Weight lookup is
  `element_at` on a broadcast array literal when real weights are
  given, else a closed-form pseudo-weight (exact binary fractions, so
  the fold is order-independent and engine-exact).
- `shuffle_shards`: one hash shuffle on (shard), per-shard parallel
  sort — never a global single-partition window. Shards are md5-based
  so the permutation is reproducible on any engine and any layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.functions.rounding import (
    round_ratio_half_away,
    round_ratio_half_away_py,
    round_ratio_half_away_sql,
)
from solarpaneldatawrangler_spark.functions.text import let, md5_long, tokens

# RE2-safe (no lookarounds): works identically as a Java regex (Spark)
# and in DuckDB's RE2 — the oracle replays it verbatim.
URL_HOST_RE = r"https?://([a-z0-9.-]+)"


def extract_hosts(text: Column) -> Column:
    """All URL hosts cited in the text, lowercased, in document order
    (duplicates kept — callers distinct() when they need the set).
    Null text counts as no citations (the repo-wide null-text
    normalization contract — see exact_dedup).
    """
    return F.regexp_extract_all(
        F.lower(F.coalesce(text, F.lit(""))), F.lit(URL_HOST_RE), F.lit(1)
    )


def host_suffix_chain(host: Column) -> Column:
    """Domain suffix chain for subdomain blocklist matching:
    ``a.b.example.com`` → ``[a.b.example.com, b.example.com,
    example.com, com]``. A blocklist entry ``example.com`` then blocks
    every subdomain via a plain equi-join — no per-row regex against
    the blocklist, no theta-join. (Public-suffix-list nuances are out
    of scope; entries are matched as whole label suffixes.)
    """
    # let-bound (r16): the split subtree inside the per-suffix lambda
    # would re-split the host once per label otherwise
    return let(
        F.split(host, r"\."),
        lambda parts: F.transform(
            F.sequence(F.lit(1), F.size(parts)),
            lambda i: F.array_join(
                F.slice(parts, i, F.size(parts) - i + 1), "."
            ),
        ),
    )


def doc_url_flags(
    docs: DataFrame,
    blocked_hosts: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Scan-side URL audit columns: ``n_urls`` (citations found),
    ``url_host`` (first cited host, '' if none) and ``url_blocked``
    (any cited host has a suffix in the blocklist).

    For a literal blocklist (the common case — these lists are
    thousands of entries, trivially broadcastable) the membership test
    compiles to pure codegen: exists(host, exists(suffix, isin)).
    """
    hosts = extract_hosts(F.col(text_col))
    blocked_arr = F.array(*[F.lit(b.lower()) for b in blocked_hosts])
    blocked = F.exists(
        hosts,
        lambda h: F.exists(
            host_suffix_chain(h), lambda s: F.array_contains(blocked_arr, s)
        ),
    )
    return docs.withColumns(
        {
            "n_urls": F.size(hosts),
            "url_host": F.coalesce(F.try_element_at(hosts, F.lit(1)), F.lit("")),
            "url_blocked": blocked,
        }
    )


def url_blocklist_filter(
    docs: DataFrame,
    blocked_hosts_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Admission gate: drop documents citing any blocklisted host
    (subdomains included via the suffix chain).

    The scale path for a DataFrame-shaped blocklist: explode the
    (bounded) suffix chain of each distinct cited host, broadcast
    equi-join against the blocklist (the BLOCKLIST side is the
    human-sized one), and anti-join the blocked ids back. The blocked-id
    set grows with the corpus — one id per document citing a blocked
    host, easily 10^7+ on a spammy crawl — so its anti-join carries NO
    broadcast hint: AQE broadcasts it when it happens to be small and
    falls back to a hash anti-join when it isn't, instead of a forced
    driver collect that OOMs exactly on the corpora this gate matters
    for. ``blocked_hosts_df`` must have a ``host`` column.
    """
    pairs = docs.select(
        F.col(id_col), F.explode(extract_hosts(F.col(text_col))).alias("_h")
    ).select(id_col, F.explode(host_suffix_chain(F.col("_h"))).alias("_sfx"))
    blocked_ids = (
        pairs.join(
            F.broadcast(blocked_hosts_df.select(F.lower("host").alias("_sfx"))),
            "_sfx",
        )
        .select(id_col)
        .distinct()
    )
    return docs.join(blocked_ids, id_col, "left_anti")


# --- hashed-linear quality classifier (fastText architecture) --------------

def train_hashed_linear(
    docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n_buckets: int = 1 << 18,
    iters: int = 20,
    lr: float = 1.0,
    l2: float = 0.0,
) -> tuple[list[float], float]:
    """Train the hashed-linear (fastText-architecture) quality
    classifier IN-ENGINE: full-batch logistic regression by gradient
    descent over hashed bag-of-words means — the model
    hashed_linear_score(weights=..., bias=..., sigmoid=True) then
    applies, with the identical tokenizer and md5 bucket, so train and
    serve can never disagree about features.

    ``label_col`` is 0/1 (1 = keep-quality, e.g. curated/reference
    docs vs raw crawl — the fastText-classifier recipe of
    GPT-3/LLaMA-style data filtering). Returns (weights, bias).

    Plan shape (the kmeans_fit loop): per iteration ONE narrow
    mapInPandas pass emits per-Arrow-batch PARTIAL gradient sums —
    (bucket, g) rows for the touched buckets plus one bias/loss row —
    so the corpus never shuffles; a combinable groupBy(bucket) SUM
    reduces them and the dense gradient (n_buckets doubles, ~2 MB at
    2^18) comes back to the driver as loop state. ``iters`` passes
    over the data total. Like kmeans_fit, partial-sum order varies
    with partitioning (float ulps) — this is the production trainer,
    not an oracle-replayable surface.
    """
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    n = docs.count()
    if n == 0:
        raise ValueError("train_hashed_linear: empty training set")
    # validate the label AFTER casting: a pre-cast isNull check misses
    # both unparseable strings and NaN doubles, either of which would
    # turn one error term into NaN and silently poison every summed
    # gradient. try_cast, not cast — under ANSI (the session default)
    # cast('yes' as double) THROWS mid-job instead of yielding the null
    # this guard exists to catch.
    y = F.col(label_col).try_cast("double")
    if docs.filter(y.isNull() | F.isnan(y)).limit(1).count():
        raise ValueError(
            "train_hashed_linear: labels contain null/NaN (or values "
            "that cast to them) — they would silently poison every "
            "summed gradient"
        )
    src = docs.select(F.col(text_col).alias("_t"), y.alias("_y"))
    w = np.zeros(n_buckets, dtype=np.float64)
    bias = 0.0
    ws = re.compile(PY_JAVA_WS_RE)

    def buckets_of(text: str) -> list[int]:
        return [
            int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % n_buckets
            for t in ws.split((text or "").lower())
            if t
        ]

    for _ in range(iters):
        w_now, b_now = w.copy(), bias

        def partials(batches, _w=w_now, _b=b_now):
            for pdf in batches:
                if not len(pdf):
                    continue
                acc: dict[int, float] = {}
                gb = 0.0
                for text, y in zip(pdf["_t"], pdf["_y"]):
                    bks = buckets_of(text)
                    if bks:
                        x = 1.0 / len(bks)
                        raw = sum(_w[b] for b in bks) * x + _b
                    else:
                        raw = _b
                    p = 1.0 / (1.0 + np.exp(-raw))
                    err = p - float(y)
                    gb += err
                    if bks:
                        for b in bks:
                            acc[b] = acc.get(b, 0.0) + err * x
                out = pd.DataFrame(
                    {
                        "bucket": list(acc.keys()) + [-1],
                        "g": list(acc.values()) + [gb],
                    }
                )
                yield out

        grads = (
            src.mapInPandas(partials, "bucket long, g double")
            .groupBy("bucket")
            .agg(F.sum("g").alias("g"))
            .collect()
        )
        gw = np.zeros(n_buckets, dtype=np.float64)
        gb = 0.0
        for r in grads:
            if r["bucket"] == -1:
                gb = r["g"]
            else:
                gw[int(r["bucket"])] = r["g"]
        w = w - lr * (gw / n + l2 * w)
        bias = bias - lr * (gb / n)
    return [float(x) for x in w], float(bias)

# Python twin of the JVM tokenizer's whitespace: Java \s is the ASCII
# class [ \t\n\x0B\f\r]; Python's \s (and str.split()) are
# Unicode-aware and would split on NBSP etc. Every Python-side
# tokenization (the trainer, the large-model scorer) uses THIS class so
# train and both serving paths agree on any text.
PY_JAVA_WS_RE = "[ \\t\\n\\x0b\\f\\r]+"


def py_md5_bucket(token: str, n_buckets: int) -> int:
    """Python twin of the engine bucket hash (md5 hex prefix mod N) —
    ONE definition for every Python-side scorer/trainer (hashed-linear
    pandas path, DSIR trainer and numpy path), so the hashing can't
    drift between them the way per-module copies would."""
    import hashlib

    return int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % n_buckets

# Pseudo-weight parameters: w(b) = ((b % _W_MOD) - _W_SHIFT) / _W_DEN.
# _W_DEN is a power of two, so every weight is an exact binary
# fraction and partial sums are EXACT in float64 — the aggregation
# order cannot change the result (the concern ADVICE raised for
# temperature_rates' float Z). _W_MOD is prime so buckets spread.
_W_MOD = 1009
_W_SHIFT = 504
_W_DEN = 512.0


def hashed_linear_score(
    text: Column,
    weights: list[float] | None = None,
    n_buckets: int = 1 << 18,
    bias: float = 0.0,
    sigmoid: bool = False,
    serve_path: str = "auto",
) -> Column:
    """fastText-architecture quality score: mean over tokens of a
    hashed weight lookup (+ bias), optionally squashed by a sigmoid.

    The architecture is exactly fastText's (Joulin et al. 2016,
    "Bag of Tricks"): hash each token into one of ``n_buckets``
    buckets, average the bucket weights, add a bias. With no weights, a
    deterministic closed-form pseudo-weight stands in (for oracle
    replay and plumbing tests; NOT a trained model).

    Trained ``weights`` (len == n_buckets) take one of two plans by
    size — both score identically (each folds the token weights
    left-to-right in IEEE doubles):
    - small models (<= 1024 buckets): an `element_at` on an array
      literal, pure codegen inside the scan. NOT viable at fastText
      scale — a 2^18-literal array is O(n_buckets) PLAN size; measured
      ~2 minutes of analyzer time and a 3.5 MiB task binary.
    - larger models: an Arrow-batched pandas UDF closing over ONE
      NumPy weight table (shipped per executor once, not per plan
      node). Still map-only, zero shuffle; Python is the documented
      slow path, but per-token md5 here costs the same as fastText's
      own tokenizer loop.

    The pseudo-weight path runs entirely inside the scan (F.aggregate
    over the token array): zero shuffle, zero Python. Bucket =
    md5_long(token) % n_buckets in every path, so any engine
    reproduces it (DuckDB: ('0x'||substr(md5(t),1,8))::BIGINT %
    n_buckets).
    """
    if weights is not None and len(weights) != n_buckets:
        raise ValueError(
            f"weights has {len(weights)} entries, expected n_buckets={n_buckets}"
        )
    if serve_path not in ("auto", "expr", "pandas"):
        raise ValueError(f"serve_path must be auto|expr|pandas, got {serve_path!r}")
    if serve_path == "pandas" and weights is None:
        raise ValueError(
            "serve_path='pandas' requires trained weights — the "
            "pseudo-weight score has no Python path (it exists for "
            "engine-exact oracle replay and is expression-only)"
        )
    # serve_path override (ADVICE r7): "pandas" forces the Python path
    # for a model trained via train_hashed_linear (Python tokenizer),
    # closing the JVM-toLowerCase vs str.lower() Unicode-version-skew
    # window for small models; "expr" forces codegen (only sane for
    # small weight tables — the array literal is O(n_buckets) PLAN
    # size). Caveat either way: JVM `lower` and Python `.lower()` can
    # disagree on rare Unicode; pick the path that matches training.
    if weights is not None and (
        serve_path == "pandas" or (serve_path == "auto" and n_buckets > 1024)
    ):
        return _hashed_linear_pandas(
            text, [float(w) for w in weights], n_buckets, bias, sigmoid
        )
    toks = tokens(F.coalesce(text, F.lit("")))
    if weights is not None:
        arr = F.array(*[F.lit(float(w)) for w in weights])
        def w_of(t: Column) -> Column:
            return F.element_at(arr, (md5_long(t) % n_buckets + 1).cast("int"))
    else:
        def w_of(t: Column) -> Column:
            b = md5_long(t) % n_buckets
            return ((b % _W_MOD) - _W_SHIFT).cast("double") / F.lit(_W_DEN)
    total = F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + w_of(t))
    raw = total / F.greatest(F.size(toks), F.lit(1)) + F.lit(float(bias))
    if sigmoid:
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-raw))
    return raw


def _hashed_linear_pandas(
    text: Column,
    weights: list[float],
    n_buckets: int,
    bias: float,
    sigmoid: bool,
) -> Column:
    """fastText-scale scoring: Arrow-batched UDF over a NumPy weight
    table. Same tokenizer (lowercase whitespace split), same md5
    bucket, same left-to-right fold as the expression path — the two
    paths are value-identical, only the weight-shipping differs.

    Vectorized (r8): tokens are deduped per batch and each DISTINCT
    token is md5-hashed exactly once, with a bounded cross-batch memo
    (token -> bucket) amortizing the hash over a long-lived executor.
    Bucket weights are then a NumPy gather; the per-doc total uses
    np.cumsum, which accumulates STRICTLY left-to-right in float64
    (np.sum's pairwise summation would change low-order bits and break
    value-parity with the JVM F.aggregate fold). One cumsum per doc —
    differencing a single concatenated cumsum would NOT reproduce the
    per-doc fold ((a+b+c+d)-(a+b) != c+d in floats)."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    import re

    w = np.asarray(weights, dtype=np.float64)
    ws = re.compile(PY_JAVA_WS_RE)
    memo: dict[str, int] = {}
    _MEMO_CAP = 1 << 21  # ~2M distinct tokens; beyond that, hash fresh

    # NOTE: hints are spelled via pd.Series objects, not strings —
    # under `from __future__ import annotations` with pandas imported
    # locally, string annotations can't be resolved by the eval-type
    # inference and pandas_udf rejects the signature
    @pandas_udf("double")
    def _score(texts):
        # type: (pd.Series) -> pd.Series
        doc_toks = [
            [x for x in ws.split((t or "").lower()) if x] for t in texts
        ]
        fresh = set()
        for toks in doc_toks:
            fresh.update(toks)
        fresh.difference_update(memo)
        if fresh:
            hashed = {
                tok: py_md5_bucket(tok, n_buckets) for tok in fresh
            }
            if len(memo) < _MEMO_CAP:
                memo.update(hashed)
                lookup = memo
            else:
                # memo full: overlay this batch's fresh hashes without
                # copying the ~2M-entry memo (ChainMap is view-only)
                from collections import ChainMap

                lookup = ChainMap(hashed, memo)
        else:
            lookup = memo
        out = np.empty(len(doc_toks), dtype=np.float64)
        for i, toks in enumerate(doc_toks):
            if not toks:
                out[i] = bias
                continue
            idx = np.fromiter(
                (lookup[tok] for tok in toks), dtype=np.int64, count=len(toks)
            )
            # cumsum = sequential left-to-right accumulation in C
            out[i] = float(np.cumsum(w[idx])[-1]) / len(toks) + bias
        if sigmoid:
            # math.exp per doc (not np.exp): keeps the exact libm call
            # the scalar path used, one call per DOC so cost is trivial
            out = np.fromiter(
                (1.0 / (1.0 + math.exp(-x)) for x in out),
                dtype=np.float64,
                count=len(out),
            )
        return pd.Series(out, dtype="float64")

    return _score(text)


def hashed_linear_score_sql(
    text_expr: str, n_buckets: int = 1 << 18
) -> str:
    """DuckDB replay of the pseudo-weight hashed_linear_score (same
    bucket hash, same exact-binary-fraction weights, same left fold)."""
    toks = (
        f"list_filter(string_split_regex(lower({text_expr}), '\\s+'),"
        " t -> len(t) > 0)"
    )
    w = (
        f"(((('0x' || substr(md5(t), 1, 8))::BIGINT % {n_buckets})"
        f" % {_W_MOD}) - {_W_SHIFT}) / {_W_DEN}"
    )
    return (
        f"COALESCE(list_sum(list_transform({toks}, t -> {w})), 0.0)"
        f" / GREATEST(len({toks}), 1)"
    )


def _hashed_linear_score_r6_pandas(text: Column, n_buckets: int) -> Column:
    """Arrow-batched twin of hashed_linear_score_r6's expr form (r17,
    guide §4.2 — the dsir_log_weight impl="pandas" idiom): the md5
    bucket is memoized per DISTINCT token across batches, the numerator
    is an exact Python-int sum, and the 6dp rounding is the same pure
    integer floor division (Python `//` on ints is exact at any
    magnitude, like the DECIMAL path). Value-identical by construction;
    pinned by tests/test_rep_battery_fused.py. Null text normalizes to
    '' (the expr form coalesces), scoring 0.0."""
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ws = re.compile(PY_JAVA_WS_RE)
    memo: dict[str, int] = {}
    _CAP = 1 << 21

    @pandas_udf("double")
    def _score(texts):
        # type: (pd.Series) -> pd.Series
        out = []
        for t in texts:
            toks = [x for x in ws.split((t or "").lower()) if x]
            num = 0
            for tok in toks:
                w = memo.get(tok)
                if w is None:
                    w = (py_md5_bucket(tok, n_buckets) % _W_MOD) - _W_SHIFT
                    if len(memo) < _CAP:
                        memo[tok] = w
                num += w
            n_tok = max(len(toks), 1)
            q = (2_000_000 * abs(num) + 512 * n_tok) // (1024 * n_tok)
            out.append((-q if num < 0 else q) / 1_000_000.0)
        return pd.Series(out, dtype="float64")

    return _score(text)


def hashed_linear_score_r6(
    text: Column, n_buckets: int = 1 << 18, impl: str = "expr"
) -> Column:
    """The pseudo-weight hashed_linear_score rounded to 6dp with
    ENGINE-EXACT integer arithmetic (r12; found by the sf1.0 sweep):
    Spark's F.round goes through BigDecimal HALF_UP on the double while
    DuckDB's ROUND multiplies by 1e6 in doubles, and a score landing
    near a 6dp tie (num/(512*len) with the tie not binary-representable)
    rounds differently per engine. Since every pseudo-weight is an
    integer numerator over 512, the score is the exact rational
    num/(512*len) — so round-half-away-from-zero at 6dp is the pure
    integer expression sign * ((2e6*|num| + 512*len) // (1024*len)),
    identical in any engine. Numerator bound: |num| <= 504*len <=
    504 * 2^31, so the dividend a = 2e6*|num| + 512*len stays inside
    int64 for any representable token array; the floor division goes
    through DECIMAL (review-caught: a double division is only exact
    below 2^53, i.e. docs under ~9M tokens — DECIMAL division of the
    remainder-stripped exact multiple is exact at ANY int64 size,
    matching DuckDB's HUGEINT `//`).

    ``impl="pandas"`` (r17): the Arrow-batched twin — same integer
    arithmetic, md5 memoized per distinct token; measured ~4x on the
    q52 clf component at sf1 (the expr fold runs interpreted with one
    JVM md5+conv per token occurrence)."""
    if impl not in ("expr", "pandas"):
        raise ValueError(f"impl must be expr|pandas, got {impl!r}")
    if impl == "pandas":
        return _hashed_linear_score_r6_pandas(text, n_buckets)
    toks = tokens(F.coalesce(text, F.lit("")))
    num = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + ((md5_long(t) % n_buckets) % _W_MOD - _W_SHIFT).cast("long"),
    )
    n_tok = F.greatest(F.size(toks), F.lit(1)).cast("long")
    a = F.lit(2_000_000).cast("long") * F.abs(num) + F.lit(512) * n_tok
    b = F.lit(1024).cast("long") * n_tok
    # exact integer floor(a/b): strip the remainder (pmod is exact on
    # longs), then divide the exact multiple in DECIMAL — the quotient
    # is a whole number, so the decimal result carries it exactly at
    # any int64 magnitude and the long cast is lossless (a double
    # division here would silently lose exactness past 2^53)
    m = (a - F.pmod(a, b)).cast("decimal(38,0)")
    q = (m / b.cast("decimal(38,0)")).cast("long")
    signed = F.when(num < 0, -q).otherwise(q)
    return signed.cast("double") / F.lit(1_000_000.0)


def hashed_linear_score_r6_sql(text_expr: str, n_buckets: int = 1 << 18) -> str:
    """DuckDB twin of hashed_linear_score_r6 — same integer numerator
    fold, same half-away-from-zero integer rounding, same final /1e6."""
    toks = (
        f"list_filter(string_split_regex(lower({text_expr}), '\\s+'),"
        " t -> len(t) > 0)"
    )
    n = (
        f"((('0x' || substr(md5(t), 1, 8))::BIGINT % {n_buckets})"
        f" % {_W_MOD}) - {_W_SHIFT}"
    )
    num = f"COALESCE(list_sum(list_transform({toks}, t -> {n})), 0)"
    ln = f"GREATEST(len({toks}), 1)"
    return (
        f"(CASE WHEN ({num}) < 0 THEN -1 ELSE 1 END)"
        f" * ((2000000 * abs({num}) + 512 * ({ln})) // (1024 * ({ln})))"
        f" / 1000000.0"
    )


# --- Gopher dup-n-gram character coverage (the UDF half of the
# --- repetition battery) ----------------------------------------------------

GOPHER_DUP_NGRAM_NS = (5, 6, 7, 8, 9, 10)
GOPHER_TOP_NGRAM_NS = (2, 3)


def gopher_rep_battery_fracs(text: Column) -> Column:
    """struct<top2,top3,d5..d10: double>: BOTH halves of the Gopher
    repetition battery that q52 evaluates over the same derived text,
    in ONE Arrow-batched pass — the top-n-gram character fractions
    (n=2,3; occurrences(g*) x len(g*) over the canonical single-spaced
    join length, exactly functions.text.top_ngram_char_fraction's
    arithmetic) fused with the dup-n-gram union char coverages (n=5..10,
    exactly gopher_dup_ngram_char_fracs).

    Why (r17, guide §4.1/§4.2 + §1.2 per-task work): q52's sf1
    decomposition (bench_out/r17_q52_decomp_testdata_sf1.json) put
    rep_topgram at 34.7 s and rep_dupngram at 14.2 s — the top-gram
    Catalyst form is an interpreted sort_array + aggregate fold whose
    per-element cost (struct alloc + expression-tree walk per gram)
    dwarfs a C-speed dict count, and the two signals tokenized the SAME
    rtext twice more than needed. One fused pass tokenizes once, counts
    grams as TUPLES (tokens cannot contain whitespace, so tuple
    equality == the joined-string equality both engines hash), and
    reuses the token-length prefix sums across all eight outputs.

    Value contract: bit-identical to the two Catalyst/UDF forms it
    replaces (same PY_JAVA_WS_RE tokenizer twin, same integer-exact
    half-away 6dp rounding); pinned by
    tests/test_rep_battery_fused.py and the untouched q52 oracle,
    which still replays the component-form SQL every run. Null text
    normalizes to '' (the UDF-half convention; q52's rtext is
    concat_ws-derived and never null)."""
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ws = re.compile(PY_JAVA_WS_RE)
    dns = GOPHER_DUP_NGRAM_NS
    tns = GOPHER_TOP_NGRAM_NS
    fields = [f"top{n}" for n in tns] + [f"d{n}" for n in dns]
    schema = ", ".join(f"{f} double" for f in fields)

    @pandas_udf(schema)
    def _fracs(texts):
        # type: (pd.Series) -> pd.DataFrame
        rows = []
        for t in texts:
            toks = [x for x in ws.split((t or "").lower()) if x]
            m = len(toks)
            lens = [len(x) for x in toks]
            total = sum(lens)
            # prefix sums of token lengths: len(" ".join(toks[i:i+n]))
            # = (pref[i+n] - pref[i]) + (n - 1)
            pref = [0] * (m + 1)
            acc = 0
            for i, l in enumerate(lens):
                acc += l
                pref[i + 1] = acc
            out = []
            # top-n half: max over distinct grams of count * len(gram),
            # denominator = total token chars + separators (m-1)
            den_top = total + (m - 1 if m >= 1 else 0)
            for n in tns:
                if m == 0:
                    out.append(0.0)
                    continue
                best = 0
                if m >= n:
                    d: dict = {}
                    for i in range(m - n + 1):
                        g = tuple(toks[i : i + n])
                        e = d.get(g)
                        if e is None:
                            d[g] = [1, pref[i + n] - pref[i] + n - 1]
                        else:
                            e[0] += 1
                    best = max(c * l for c, l in d.values())
                out.append(round_ratio_half_away_py(best, den_top, 6))
            # dup-n half: union char coverage of grams occurring >= 2x
            for n in dns:
                if total == 0 or m < n:
                    out.append(0.0)
                    continue
                grams = list(zip(*(toks[i:] for i in range(n))))
                cnt: dict = {}
                for g in grams:
                    cnt[g] = cnt.get(g, 0) + 1
                covered = bytearray(m)
                for i, g in enumerate(grams):
                    if cnt[g] >= 2:
                        covered[i : i + n] = b"\x01" * n
                num = sum(l for l, c in zip(lens, covered) if c)
                out.append(round_ratio_half_away_py(num, total, 6))
            rows.append(out)
        return pd.DataFrame(rows, columns=fields)

    return _fracs(text)


def gopher_dup_ngram_char_fracs(text: Column) -> Column:
    """struct<d5..d10: double>: for each n in 5..10, the fraction of
    token CHARACTERS covered by word n-grams that occur at least twice
    in the document — the dup-n-gram half of Gopher's repetition
    battery (Rae et al. 2021 Table A1; the count/top-gram half is
    functions.text.gopher_repetition_flags). Coverage is the UNION of
    the duplicated grams' token spans (the paper's no-double-counting
    rule); denominator = total token characters (separators excluded);
    fractions rounded half-up to 6dp.

    Why a pandas UDF (the documented exception, like the big-model
    scorer): per-document union coverage needs a gram-count hash map
    plus positional marking — O(m) per doc imperatively, but only
    expressible in pure Catalyst as either a per-row O(m^2) expression
    or six corpus-wide explode+shuffle rounds. One Arrow-batched
    map-only pass computing all six n at once is the 100 TB shape:
    zero shuffle, ~O(10 x m) Python per doc. Tokenizer is the Python
    twin of the JVM whitespace class (PY_JAVA_WS_RE) so the battery
    agrees with the expression half on any text. DuckDB-replayable
    via UNNEST/GROUP BY (tests + the q52 merge oracle them)."""
    import math
    import re
    from collections import Counter

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ws = re.compile(PY_JAVA_WS_RE)
    ns = GOPHER_DUP_NGRAM_NS

    @pandas_udf("d5 double, d6 double, d7 double, d8 double, d9 double, d10 double")
    def _fracs(texts):
        # type: (pd.Series) -> pd.DataFrame
        rows = []
        for t in texts:
            toks = [x for x in ws.split((t or "").lower()) if x]
            lens = [len(x) for x in toks]
            total = sum(lens)
            m = len(toks)
            out = []
            for n in ns:
                if total == 0 or m < n:
                    out.append(0.0)
                    continue
                grams = [" ".join(toks[i : i + n]) for i in range(m - n + 1)]
                cnt = Counter(grams)
                covered = bytearray(m)
                for i, g in enumerate(grams):
                    if cnt[g] >= 2:
                        covered[i : i + n] = b"\x01" * n
                num = sum(l for l, c in zip(lens, covered) if c)
                # integer-exact half-away 6dp (r13): unbounded-int
                # arithmetic, the same rule as round_ratio_half_away
                # and its SQL twin — no double drift near ties
                out.append(round_ratio_half_away_py(num, total, 6))
            rows.append(out)
        return pd.DataFrame(rows, columns=[f"d{n}" for n in ns])

    return _fracs(text)


def gopher_dup_ngram_sql(text_expr: str) -> str:
    """DuckDB replay of gopher_dup_ngram_char_fracs over the
    ``documents`` table: one SELECT yielding (doc_id, d5..d10). The
    oracle mirrors the SEMANTICS (union coverage over duplicated
    n-grams, token-char denominator, half-up 6dp) with UNNEST/GROUP BY
    — not the implementation."""
    toks = (
        f"list_filter(string_split_regex(lower({text_expr}), '\\s+'),"
        " t -> len(t) > 0)"
    )
    parts = []
    for n in GOPHER_DUP_NGRAM_NS:
        parts.append(f"""
g{n} AS (
    SELECT b.doc_id, CAST(u.i AS INT) AS i,
           array_to_string(list_slice(b.toks, CAST(u.i AS INT),
                                      CAST(u.i AS INT) + {n - 1}), ' ') AS g
    FROM btoks b, LATERAL UNNEST(range(1, len(b.toks) - {n} + 2)) AS u(i)
    WHERE len(b.toks) >= {n}
),
d{n} AS (
    SELECT doc_id, g FROM g{n} GROUP BY doc_id, g HAVING COUNT(*) >= 2
),
c{n} AS (
    SELECT t.doc_id,
           SUM(CASE WHEN EXISTS (
                 SELECT 1 FROM g{n} s JOIN d{n} d
                   ON d.doc_id = s.doc_id AND d.g = s.g
                 WHERE s.doc_id = t.doc_id
                   AND s.i <= t.j AND t.j < s.i + {n})
               THEN len(t.tok) ELSE 0 END) AS num
    FROM trows t GROUP BY t.doc_id
)""")
    # integer-exact 6dp (r13): same round_ratio_half_away arithmetic as
    # the UDF's Python twin — num/total is an exact rational of counts
    sels = ",\n           ".join(
        "COALESCE("
        + round_ratio_half_away_sql(
            f"c{n}.num", "tt.total", 6, assume_nonneg=True
        )
        + f", 0.0) AS d{n}"
        for n in GOPHER_DUP_NGRAM_NS
    )
    joins = "\n    ".join(
        f"LEFT JOIN c{n} ON c{n}.doc_id = tt.doc_id"
        for n in GOPHER_DUP_NGRAM_NS
    )
    return f"""
    WITH btoks AS (SELECT doc_id, {toks} AS toks FROM documents),
    trows AS (
        SELECT b.doc_id, CAST(u.j AS INT) AS j,
               b.toks[CAST(u.j AS INT)] AS tok
        FROM btoks b, LATERAL UNNEST(range(1, len(b.toks) + 1)) AS u(j)
    ),
    tt AS (SELECT doc_id, SUM(len(tok)) AS total FROM trows GROUP BY doc_id),
    {",".join(p for p in parts)}
    SELECT tt.doc_id,
           {sels}
    FROM tt
    {joins}
    """


# --- deterministic training shards -----------------------------------------


def shuffle_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 64,
    seed: str = "0",
) -> DataFrame:
    """Deterministic corpus shuffle into training shards: every row
    gets ``(shard, shard_pos)`` — a reproducible pseudo-random
    permutation, materialized as shard assignment plus position within
    the shard. This is the final step of a curation pipeline (fix the
    training order once, reproducibly), and the standard trick for
    doing a "global shuffle" of 100 TB without a global sort: one hash
    shuffle on shard, then n_shards PARALLEL sorts — never a global
    single-partition window.

    shard    = md5_long(seed:id) % n_shards
    shard_pos = rank of md5(seed:id) within the shard (ties by id)

    Both are md5-derived, so the permutation replays exactly in any
    engine and is independent of input partitioning.
    """
    key = F.concat(F.lit(str(seed)), F.lit(":"), F.col(id_col).cast("string"))
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("_skey", id_col)
    return (
        df.withColumns(
            {
                "shard": (md5_long(key) % n_shards).cast("int"),
                "_skey": F.md5(key),
            }
        )
        .withColumn("shard_pos", F.row_number().over(w))
        .drop("_skey")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 64,
    seed: str = "0",
) -> None:
    """Materialize the deterministic shuffle: one parquet directory
    per shard (partitionBy), rows within each file in shard_pos order.
    repartition(n_shards, shard) keeps it one task per shard;
    partition-pruned readers stream shards independently.
    """
    out = shuffle_shards(df, id_col, n_shards, seed)
    (
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "shard_pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def write_corpus_jsonl(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 64,
    seed: str = "0",
) -> dict:
    """Release the curated corpus as sharded JSONL (the lingua franca
    training-data interchange format) plus an audit ``_manifest.json``
    (underscore-prefixed so Spark readers ignore it, like _SUCCESS):
    per-shard document count and an ORDER-INDEPENDENT content hash
    (sum of each row's md5_long over its canonical JSON), so a consumer
    can verify a transferred shard without re-sorting it, and the
    producer can re-run verify_corpus_jsonl after any copy.

    Layout mirrors write_training_shards: shard assignment/order from
    shuffle_shards (md5 permutation — reproducible on any engine), one
    JSON-lines directory per shard via partitionBy, rows in shard_pos
    order. The hash sums decimals (not bigints) so a 10^12-doc shard
    cannot overflow under ANSI arithmetic. The manifest is written
    through the Hadoop FileSystem API (r8, closing the r7 ADVICE
    item): on an HDFS/S3 release path it lands next to the shards
    instead of raising after the expensive shard write the way a
    driver-local open() would.
    """
    import json as _json

    # the content hash must survive a JSON round-trip: the verify side
    # re-reads the shards and re-renders each row, so column types whose
    # rendering changes under schema re-inference would flag every
    # shard of a pristine copy as corrupt. Decimals re-infer as double
    # ('1.50' -> '1.5'), timestamps/dates as strings, binary isn't
    # JSON-stable at all — reject them up front with a usable message.
    from pyspark.sql.types import (
        BinaryType,
        DateType,
        DecimalType,
        TimestampNTZType,
        TimestampType,
    )

    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(
            f.dataType,
            (DecimalType, TimestampType, TimestampNTZType, DateType, BinaryType),
        )
    ]
    if bad:
        raise ValueError(
            f"write_corpus_jsonl: columns {bad} have types that do not "
            "round-trip through JSON schema inference (decimal/timestamp/"
            "date/binary) — cast them to string or double first"
        )
    # two actions consume `out` (the shard write, then the manifest
    # agg): a lazy checkpoint runs the upstream plan — often the whole
    # curation chain — ONCE, and guarantees the manifest is computed
    # from the very rows that went to disk even if an upstream stage
    # were nondeterministic (the q55 checkpointed-shingles idiom)
    out = shuffle_shards(df, id_col, n_shards, seed).localCheckpoint(
        eager=False
    )
    cols = [c for c in out.columns]
    row_json = F.to_json(F.struct(*[F.col(c) for c in cols]))
    (
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "shard_pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .json(path)
    )
    stats = (
        out.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(md5_long(row_json).cast("decimal(38,0)"))
            .cast("string")
            .alias("content_hash"),
        )
        .collect()
    )
    manifest = {
        "n_shards": n_shards,
        "seed": str(seed),
        "columns": cols,
        "total_docs": int(sum(r["n_docs"] for r in stats)),
        "shards": {
            str(r["shard"]): {
                "n_docs": int(r["n_docs"]),
                "content_hash": r["content_hash"],
            }
            for r in stats
        },
    }
    _write_text_file(
        df.sparkSession,
        f"{path.rstrip('/')}/_manifest.json",
        _json.dumps(manifest, indent=2, sort_keys=True),
    )
    return manifest


def _write_text_file(spark, file_path: str, data: str) -> None:
    """Shared Hadoop-FS text write (sources.fsutil) — kept as a
    module-local alias for the sink's call sites."""
    from solarpaneldatawrangler_spark.sources.fsutil import write_text_file

    write_text_file(spark, file_path, data)


def _read_text_file(spark, file_path: str) -> str:
    """Shared Hadoop-FS text read (sources.fsutil)."""
    from solarpaneldatawrangler_spark.sources.fsutil import read_text_file

    return read_text_file(spark, file_path)


def verify_corpus_jsonl(spark, path: str) -> bool:
    """Re-derive the manifest from the shards on disk and compare —
    the consumer-side integrity check. Raises ValueError naming the
    first diverging shard; True when everything matches. The recompute
    is one scan + one combinable agg (order-independent hash, so shard
    files can arrive in any order/concatenation)."""
    import json as _json

    manifest = _json.loads(
        _read_text_file(spark, f"{path.rstrip('/')}/_manifest.json")
    )
    if not manifest["shards"]:
        # empty release (every doc gated out upstream): nothing to
        # hash — valid iff the directory holds no data files either
        # (read.json on a data-less dir cannot infer a schema and
        # would throw, so don't ask it to)
        jvm = spark._jvm
        hp = jvm.org.apache.hadoop.fs.Path(path)
        fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())
        data = [
            st.getPath().getName()
            for st in fs.listStatus(hp)
            if not st.getPath().getName().startswith(("_", "."))
        ]
        if data:
            raise ValueError(
                f"manifest says empty corpus but found data: {sorted(data)}"
            )
        return True
    df = spark.read.json(path)
    cols = manifest["columns"]
    # a column that is null in EVERY row is dropped by JSON schema
    # inference; to_json omits null fields on both sides, so restoring
    # it as a null literal reproduces the write-side rendering exactly
    for c in cols:
        if c not in df.columns:
            df = df.withColumn(c, F.lit(None).cast("string"))
    row_json = F.to_json(F.struct(*[F.col(c) for c in cols]))
    got = {
        str(r["shard"]): (int(r["n_docs"]), r["content_hash"])
        for r in df.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(md5_long(row_json).cast("decimal(38,0)"))
            .cast("string")
            .alias("content_hash"),
        )
        .collect()
    }
    for shard, want in sorted(manifest["shards"].items()):
        if shard not in got:
            raise ValueError(f"shard {shard} missing on disk")
        if got[shard] != (want["n_docs"], want["content_hash"]):
            raise ValueError(
                f"shard {shard} diverges: disk {got[shard]} vs manifest "
                f"({want['n_docs']}, {want['content_hash']})"
            )
    extra = set(got) - set(manifest["shards"])
    if extra:
        raise ValueError(f"unexpected shards on disk: {sorted(extra)}")
    return True


# --- n-gram language-model quality score (CCNet-style perplexity proxy) ------

def bigram_rows(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, w1, w2) adjacent-token bigram occurrences — one generator
    expression off the scan (transform over sequence + explode), no
    per-row Python. Docs repartition on id with an EXPLICIT count
    before the explode (the shingle_rows/winnowing lesson: AQE sizes
    the exchange on pre-explode doc bytes and would run the tokenize+
    explode stage on a couple of cores)."""
    spark = df.sparkSession
    try:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n_parts = spark.sparkContext.defaultParallelism
    # let-bound (r16, the q52 O(m^2) class): element_at(toks, i) inside
    # the per-pair lambda re-ran the whole tokenize subtree once per
    # bigram before the binding — quadratic in document length
    pairs = let(
        tokens(F.col("_txt")),
        lambda toks: F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.struct(
                    F.element_at(toks, i).alias("w1"),
                    F.element_at(toks, i + 1).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>")),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt"))
        .repartition(n_parts, F.col("id"))
        .select("id", F.explode(pairs).alias("_p"))
        .select("id", "_p.w1", "_p.w2")
    )


def bigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train: DataFrame | None = None,
) -> DataFrame:
    """Per-document bigram language-model log-likelihood — the
    Spark-native stand-in for CCNet/CC-Net's KenLM perplexity quality
    signal (Wenzek et al. 2020 filter Common Crawl by LM perplexity;
    Laplace add-one smoothing replaces the KenLM binary so the whole
    model lives in DataFrames).

    Model (trained on ``train``, default the scored corpus itself):
      P(w | prev) = (C(prev, w) + 1) / (C(prev) + V)
    where C(prev) counts prev as a bigram CONTEXT and V is the distinct
    token count of the training corpus. An unseen context therefore
    backs off to the uniform 1/V.

    Returns one row per input doc: (id_col, lm_sum_r, lm_n) where
    lm_sum_r = SUM over the doc's bigram positions of
    ROUND(ln(C(prev,w)+1) - ln(C(prev)+V), 6), summed EXACTLY as
    DECIMAL(27,6) so partition merge order can't change the value
    (the exact_sum idiom), cast back to double; lm_n = the number of
    bigram positions (docs under 2 tokens get 0.0 / 0). Downstream
    quality filters cut on lm_sum_r / lm_n (mean log-prob, a monotone
    transform of perplexity); the sum+count pair is emitted instead of
    the mean so the output stays division-free and engine-exact.

    Plan shape (100 TB notes): two count aggs on scalar string keys
    (map-side combinable — "of the" occurring 10^9 times partial-
    aggregates before the shuffle), one 1-row vocab aggregate joined
    via broadcast (the q51 BM25 stats idiom), two hash equi-joins of
    the occurrence stream against the count tables, one final
    groupBy(id). Text itself never shuffles — only (id, w1, w2) rows
    and the count tables move.
    """
    # the training bigram stream feeds the context agg AND the bigram
    # agg (and, when scoring the training corpus itself, the probe side
    # too): checkpoint so tokenize+explode runs once, not 2-3 times
    # (the checkpointed-shingles idiom)
    if train is None:
        rows = bigram_rows(df, text_col, id_col).localCheckpoint(eager=False)
        tr_rows, tr_docs = rows, df
    else:
        rows = bigram_rows(df, text_col, id_col)
        tr_rows = bigram_rows(train, text_col, id_col).localCheckpoint(
            eager=False
        )
        tr_docs = train
    ctx = tr_rows.groupBy("w1").agg(F.count(F.lit(1)).alias("_c_ctx"))
    big = tr_rows.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_c_big"))
    vocab = (
        tr_docs.select(F.explode(tokens(F.col(text_col))).alias("_t"))
        .agg(F.count_distinct("_t").alias("_V"))
    )
    logp = F.round(
        F.log(F.coalesce("_c_big", F.lit(0)) + F.lit(1))
        - F.log(F.coalesce("_c_ctx", F.lit(0)) + F.col("_V")),
        6,
    )
    per_doc = (
        rows.join(big, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy("id")
        .agg(
            F.sum(logp.cast("decimal(27,6)")).cast("double").alias("lm_sum_r"),
            F.count(F.lit(1)).alias("lm_n"),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("lm_sum_r", F.lit(0.0)).alias("lm_sum_r"),
            F.coalesce("lm_n", F.lit(0)).alias("lm_n"),
        )
    )


# --- corpus data card --------------------------------------------------------

def corpus_data_card(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    approx: bool = False,
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """Per-stratum corpus statistics — the "data card" a released
    training set ships with (Gebru et al., "Datasheets for Datasets"):
    one row per stratum plus an '<all>' rollup, each carrying

      (key, median_tokens_r, p90_tokens_r, n_docs, mean_quality_r,
       dup_frac_r)

    where dup_frac_r is the fraction of the stratum's docs whose exact
    content fingerprint occurs more than once CORPUS-wide (the headline
    number of every dedup paper), mean_quality_r is the exact-decimal
    mean of the 6dp-rounded heuristic quality score, and the token
    percentiles use exact linear interpolation (the q46 cross-engine
    contract). Every value is engine-exact, so the whole card is
    SQL-replayable (q46's merged 'card' rows).

    Plan shape (100 TB): token counts and quality are scan-stage
    expressions; the only corpus shuffle is the fingerprint groupBy
    (map-side combinable) + its join back; the rollup agg moves one row
    per doc of 4 scalars. Exact percentiles hold the stratum's values
    in memory per group at the agg — for corpora where a stratum
    exceeds executor memory, swap percentile for percentile_approx and
    drop the oracle claim (documented trade, q46's doc).

    ``approx=True`` IS that documented trade, made callable: token
    percentiles switch to percentile_approx (Greenwald-Khanna sketch,
    bounded memory per group regardless of stratum size; rank error
    <= 1/approx_accuracy) — the card a 100 TB deployment actually
    computes. The dup fraction stays EXACT in both modes: its
    fingerprint groupBy is a map-side-combined count, never a
    per-group value buffer, so it has no memory cliff to trade away
    (approx_count_distinct could only approximate a number this card
    doesn't report). Approx cards are engine-specific (the sketch is
    not SQL-replayable); the exact mode remains the q46 oracle surface,
    and the test pins approx-vs-exact agreement on small data.
    """
    from solarpaneldatawrangler_spark.functions.text import (
        fingerprint,
        quality_score,
        tokens,
    )

    fp = fingerprint(F.col(text_col))
    base = docs.select(
        F.col(stratum_col).alias("_s"),
        F.size(tokens(F.col(text_col))).alias("_nt"),
        # quality_score is already integer-exact 6dp (r13); carry the
        # integer numerator k = q*1e6 alongside so the mean rounds in
        # pure integer arithmetic too (ROUND recovers k losslessly)
        quality_score(F.col(text_col)).alias("_q"),
        fp.alias("_fp"),
    ).withColumn("_q6", F.round(F.col("_q") * 1e6).cast("long"))
    copies = base.groupBy("_fp").agg(F.count(F.lit(1)).alias("_nc"))
    joined = base.join(copies, "_fp")
    if approx:
        p50 = F.percentile_approx("_nt", 0.5, F.lit(approx_accuracy))
        p90 = F.percentile_approx("_nt", 0.9, F.lit(approx_accuracy))
    else:
        p50 = F.expr("percentile(_nt, 0.5)")
        p90 = F.expr("percentile(_nt, 0.9)")
    return (
        joined.rollup("_s")
        .agg(
            F.round(p50.cast("double"), 4).alias("median_tokens_r"),
            F.round(p90.cast("double"), 4).alias("p90_tokens_r"),
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            round_ratio_half_away(
                F.sum("_q6"),
                F.lit(1_000_000).cast("long") * F.count(F.lit(1)),
                6,
            ).alias("mean_quality_r"),
            round_ratio_half_away(
                F.sum((F.col("_nc") > 1).cast("long")),
                F.count(F.lit(1)),
                6,
            ).alias("dup_frac_r"),
            F.grouping("_s").alias("_g"),
        )
        .select(
            F.when(F.col("_g") == 1, F.lit("<all>"))
            .otherwise(F.col("_s"))
            .alias("key"),
            "median_tokens_r",
            "p90_tokens_r",
            "n_docs",
            "mean_quality_r",
            "dup_frac_r",
        )
    )


# --- URL canonicalization + first-seen URL dedup (r10) -----------------------

# query parameters stripped by canonicalization: pure tracking noise
# whose presence splits one logical page into many crawl keys.
# Matches the param NAME whether valued or valueless ('fbclid=abc' AND
# bare 'fbclid' — redirectors emit both; review-caught: requiring '='
# let the valueless spelling escape the key) without ever matching a
# mere prefix ('fbclidx=1' survives).
_TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid)(=|$)"


def canonical_url(url: Column) -> Column:
    """Canonical dedup key for a URL — the stage-0 dedup of every web
    corpus pipeline (one logical page is crawled under dozens of
    tracking-decorated spellings; URL dedup runs before any content
    hash because it needs no text at all). Deterministic, pure
    expressions, exactly replayed by ``canonical_url_sql``:

    1. trim + lowercase (aggressive: the whole URL — this is a dedup
       KEY, not a fetchable address);
    2. drop the fragment (#... never reaches the server);
    3. drop tracking query params (utm_*, fbclid, gclid) and empty
       params, keeping the rest in their original order;
    4. drop a trailing '/' on the path part.

    The array ops run interpreted (HOF), but over ONE short string per
    row — the documented small/exact-context exception. NULL input
    canonicalizes as '' (the repo-wide NULL->'' key contract, the
    _store_fingerprint rule), so null-URL rows keep flowing instead of
    vanishing through NULL join keys. The query is everything after
    the FIRST '?' (a second literal '?' inside a query string is legal
    and stays part of the last parameter — review-caught: taking the
    LAST '?' silently dropped params and diverged from the SQL twin).
    """
    u = F.regexp_replace(
        F.lower(F.trim(F.coalesce(url.cast("string"), F.lit("")))),
        "#.*$",
        "",
    )
    has_q = F.instr(u, "?") > 0
    base = F.regexp_replace(F.substring_index(u, "?", 1), "/$", "")
    query = F.when(
        has_q, u.substr(F.instr(u, "?") + 1, F.length(u))
    ).otherwise(F.lit(""))
    kept = F.array_join(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
        ),
        "&",
    )
    return F.when(
        has_q & (kept != ""), F.concat(base, F.lit("?"), kept)
    ).otherwise(base)


def canonical_url_sql(url_expr: str) -> str:
    """DuckDB replay of ``canonical_url`` — the shared-builder idiom
    (same rule order, same regexes, same NULL->'' and first-'?'
    contracts)."""
    u = (
        f"regexp_replace(lower(trim(COALESCE({url_expr}, ''))),"
        " '#.*$', '')"
    )
    base = (
        f"regexp_replace(CASE WHEN position('?' IN {u}) > 0 "
        f"THEN substr({u}, 1, position('?' IN {u}) - 1) "
        f"ELSE {u} END, '/$', '')"
    )
    query = (
        f"CASE WHEN position('?' IN {u}) > 0 "
        f"THEN substr({u}, position('?' IN {u}) + 1) ELSE '' END"
    )
    kept = (
        f"array_to_string(list_filter(string_split({query}, '&'), "
        f"p -> len(p) > 0 AND NOT regexp_matches(p, '{_TRACKING_PARAM_RE}')"
        f"), '&')"
    )
    return (
        f"CASE WHEN {kept} <> '' THEN {base} || '?' || {kept} "
        f"ELSE {base} END"
    )


def url_first_seen(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """First-seen verdict per CANONICAL URL: adds ``canon_url`` and
    ``url_first`` (this row has the min id for its canonical key —
    the deterministic keep rule, exactly exact_dedup's). NULL URLs
    canonicalize to '' (one shared key), so every input row survives
    with its columns added — a stage-0 dedup must never silently DROP
    rows through NULL join keys (review-caught). Plan: one map-side-
    combinable groupBy(canon).min(id) broadcast-joined back when
    small, shuffled otherwise — a 32-byte-key join; document text
    never moves (URL dedup is the cheapest dedup precisely because it
    reads only the URL column)."""
    keyed = docs.withColumn("canon_url", canonical_url(F.col(url_col)))
    keepers = keyed.groupBy("canon_url").agg(
        F.min(id_col).alias("_keep_id")
    )
    return keyed.join(keepers, "canon_url").withColumn(
        "url_first", F.col(id_col) == F.col("_keep_id")
    ).drop("_keep_id")
