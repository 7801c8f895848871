"""Deterministic stratified sampling for training-data pipelines.

Corpus curation downsamples by stratum (source, language, quality
band) with per-stratum rates — e.g. keep 10% of commoncrawl but 100%
of wikipedia. Spark's ``sampleBy`` draws from an RNG seeded per
partition, so membership changes under repartitioning and can't be
reproduced by another engine. Here membership is a pure function of
the row: hash the id, take a bucket in [0, 1), keep if bucket < rate.

- reruns, retries, and different cluster layouts select the SAME rows
  (sampling decisions are join-stable: other tables can be filtered to
  the same sample by id)
- the md5 path replays in any engine
  (DuckDB: ('0x'||substr(md5(id),1,8))::BIGINT / 2^32 < rate), so
  sampled pipelines stay oracle-checkable end-to-end
- the xxhash64 path is the faster JVM-only variant for production
- expression-only (no shuffle, no RNG state): the filter runs inside
  the scan stage and pushes into partition pruning where the stratum
  column is a partition key
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.functions.text import md5_long

_BUCKETS = 1 << 32


def hash_bucket(id_col: Column, reproducible: bool = True) -> Column:
    """Uniform double in [0, 1) derived from the row id — md5-based when
    ``reproducible`` (cross-engine), xxhash64 otherwise (fast path)."""
    if reproducible:
        h = md5_long(id_col.cast("string"))
    else:
        h = F.pmod(F.xxhash64(id_col.cast("string")), F.lit(_BUCKETS))
    return h.cast("double") / F.lit(float(_BUCKETS))


def stratified_hash_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    reproducible: bool = True,
) -> DataFrame:
    """Keep each row iff hash_bucket(id) < rate(stratum). Rows whose
    stratum is missing from ``rates`` get ``default_rate`` (0 = drop).

    Deterministic: membership depends only on (id, stratum rate), never
    on partitioning, task retries, or execution order.
    """
    bucket = hash_bucket(F.col(id_col), reproducible)
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(float(r))).otherwise(rate)
    return df.filter(bucket < rate)


def temperature_resample(
    df: DataFrame,
    stratum_col: str,
    alpha: float = 0.5,
    target_frac: float = 0.5,
    id_col: str = "doc_id",
    reproducible: bool = True,
    weight_col: str | None = None,
) -> DataFrame:
    """Temperature-based mixture resampling: downsample each stratum
    (domain, source, language) so group allocations follow n_g^alpha
    instead of n_g — the standard multilingual/multi-domain rebalancing
    (alpha=1 keeps natural proportions, alpha->0 approaches uniform
    across strata; cf. the sampling-temperature scheme of mBERT/XLM-R
    and the domain-weighting discussion in Gopher/DoReMi).

    The target size is ``target_frac * N`` rows, allocated to stratum g
    proportionally to n_g^alpha, capped at keeping the whole stratum:
        rate_g = round(least(1, target_frac * N * n_g^(alpha-1) / Z), 9)
        with Z = sum_g n_g^alpha.
    Small strata hit the cap and keep everything (no iterative
    redistribution of their surplus — a deterministic single pass,
    slightly under target, documented). Membership is the same
    hash-bucket rule as stratified_hash_sample: a pure function of the
    row id, so reruns/retries/other engines select identical rows and
    the whole operator replays in SQL.

    Plan shape: ONE map-side-combinable groupBy(stratum) for counts
    (collected — bounded by stratum cardinality — so Z and the rates
    are computed driver-side in a deterministic order, see
    temperature_rate_table), then the tiny rate table is broadcast
    back; the corpus itself never shuffles — the filter is
    expression-only in the scan stage. Returns the kept rows of ``df``
    unchanged (schema-stable); temperature_rates exposes the
    per-stratum (count, rate) table for logging and oracle replay.

    ``weight_col`` switches the allocation from document counts to a
    weight MASS (the practical training-mixture case: budgets are in
    tokens, not documents — pass the per-doc token count). With a
    weight column, _n becomes sum(weight) per stratum, target_frac is
    the fraction of TOTAL weight to keep, and rate_g allocates weight
    mass proportional to w_g^alpha. Membership stays the per-document
    hash-bucket rule (whole documents are kept or dropped — a token
    budget can't keep half a document), so a stratum's realized token
    mass matches rate_g * w_g in expectation, exactly in the limit of
    many docs; the rate table itself is still engine-exact.
    """
    if not 0.0 < target_frac <= 1.0:
        raise ValueError("target_frac must be in (0, 1]")
    if alpha <= 0.0:
        raise ValueError("alpha must be > 0 (0 would divide by zero "
                         "counts; use explicit rates for uniform picks)")
    rates = temperature_rates(df, stratum_col, alpha, target_frac, weight_col)
    bucket = hash_bucket(F.col(id_col), reproducible)
    return (
        df.join(F.broadcast(rates), stratum_col)
        .filter(bucket < F.col("_rate"))
        .drop("_rate", "_n")
    )


def temperature_rate_table(
    counts: list[tuple], alpha: float, target_frac: float
) -> list[tuple]:
    """Pure-Python rate computation shared by temperature_rates and its
    SQL-oracle builders: given (stratum, n) pairs, return (stratum, n,
    rate) with rate = round(min(1, target_frac * N * n^alpha / Z / n), 9)
    and Z = sum n^alpha accumulated in SORTED-stratum order.

    Computing Z here — one deterministic left-to-right float sum over a
    sorted, bounded list — instead of as a distributed SUM(pow(n, alpha))
    removes the last engine-order dependence: Spark's partial-agg merge
    order and another engine's summation order can disagree in the low
    bits of Z, and a stratum whose rate sits on a 9dp rounding boundary
    would then flip membership for every row it governs. With the rates
    fixed driver-side, every engine filters against the identical
    doubles."""
    # weighted masses can surface degenerate strata that doc counts
    # never could: a NULL sum (all weights null) or a negative sum (a
    # buggy weight column). NULL normalizes to 0 — "this stratum has no
    # mass" — and contributes nothing; a negative mass is a caller bug
    # and fails loudly here instead of as a complex-power TypeError
    # three lines later.
    items = [
        (s, 0 if n is None else int(n))
        for s, n in sorted(counts, key=lambda kv: (kv[0] is None, kv[0]))
    ]
    bad = [s for s, n in items if n < 0]
    if bad:
        raise ValueError(
            f"temperature_rate_table: negative mass for strata {bad} — "
            "weight_col must be a non-negative count"
        )
    total = 0
    z = 0.0
    for _, n in items:
        total += n
        z += float(n) ** alpha
    # n == 0 can only happen under weighted masses (a stratum whose docs
    # all weigh zero): it contributes nothing to the budget either way;
    # rate 0.0 (and no Z term, since 0^alpha == 0) keeps the formula
    # total and makes the choice explicit/replayable
    return [
        (
            s,
            int(n),
            0.0
            if int(n) <= 0
            else round(
                min(
                    1.0,
                    target_frac * float(total) * (float(n) ** alpha) / z / float(n),
                ),
                9,
            ),
        )
        for s, n in items
    ]


def temperature_rates(
    df: DataFrame,
    stratum_col: str,
    alpha: float = 0.5,
    target_frac: float = 0.5,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-stratum keep rates for temperature_resample: (stratum, _n,
    _rate). The per-stratum counts (or integer weight sums when
    ``weight_col`` is given — token budgets) are collected (the one
    contractual driver collect — bounded by the stratum cardinality,
    which is human-scale by construction: sources, languages, quality
    bands) and the rates computed driver-side by temperature_rate_table,
    so the normalizer Z is a deterministic sorted-order float sum and
    the rate doubles are engine- and layout-independent. A SQL oracle
    replays them as literals (VALUES), not as a re-derivation."""
    mass = (
        F.count(F.lit(1))
        if weight_col is None
        else F.sum(F.col(weight_col).cast("long"))
    )
    counts = [
        (r[0], r[1])
        for r in df.groupBy(stratum_col).agg(mass.alias("_n")).collect()
    ]
    rows = temperature_rate_table(counts, alpha, target_frac)
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField(stratum_col, df.schema[stratum_col].dataType),
            StructField("_n", LongType()),
            StructField("_rate", DoubleType()),
        ]
    )
    return df.sparkSession.createDataFrame(rows, schema)


def hash_sample_quantiles(
    df: DataFrame,
    value_col: str,
    id_col: Column,
    rate: float,
    ps: tuple[float, ...] = (0.5, 0.9),
    group_cols: list[str] | None = None,
    reproducible: bool = True,
) -> DataFrame:
    """Quantile estimates from a DETERMINISTIC hash sample: keep rows
    with hash_bucket(id) < rate (scan-side filter, zero shuffle, the
    stratified-sample membership rule), then the exact
    percentile_disc of the sample per group via rank-select — the
    smallest value whose row_number reaches ceil(p * n) in value
    order. Rank-select is tie-safe (equal values share the selected
    VALUE whatever their row_number order) and replays verbatim in
    any engine, which is what makes a sampling-based estimator
    oracle-checkable (q80).

    This is the corpus-scale quantile shape: the full-data exact
    percentile (q46) sorts the corpus; here the sort touches only the
    sample, whose size the caller bounds via ``rate`` — the published
    uniform-sample quantile bound (eps-approximate for sample size
    O(1/eps^2), Vapnik-Chervonenkis): reruns and other engines pick
    the SAME sample, so the estimate is a deterministic function of
    the data, not of the cluster.

    Columns: group..., sample_n, q{int(100p)} per requested p."""
    group_cols = group_cols or []
    sample = df.filter(hash_bucket(id_col, reproducible) < rate)
    w_all = Window.partitionBy(*group_cols)
    ranked = sample.select(
        *group_cols, F.col(value_col).alias("_v")
    ).withColumns(
        {
            "_rn": F.row_number().over(
                Window.partitionBy(*group_cols).orderBy("_v")
            ),
            "_n": F.count(F.lit(1)).over(w_all),
        }
    )
    aggs = [F.max("_n").alias("sample_n")]
    for p in ps:
        aggs.append(
            F.min(
                F.when(
                    F.col("_rn")
                    == F.ceil(F.lit(float(p)) * F.col("_n")),
                    F.col("_v"),
                )
            ).alias(f"q{int(round(p * 100))}")
        )
    return ranked.groupBy(*group_cols).agg(*aggs)


def hash_sample_quantiles_sql(
    value_expr: str,
    id_expr: str,
    from_clause: str,
    rate: float,
    ps: tuple[float, ...] = (0.5, 0.9),
    group_cols: list[str] | None = None,
) -> str:
    """DuckDB replay of hash_sample_quantiles — the same md5 bucket
    membership and the same rank-select, shared-builder idiom."""
    group_cols = group_cols or []
    g = ", ".join(group_cols)
    gsel = f"{g}, " if g else ""
    part = f"PARTITION BY {g}" if g else ""
    qs = ", ".join(
        f"MIN(CASE WHEN _rn = CEIL({float(p)!r} * _n) THEN _v END)"
        f" AS q{int(round(p * 100))}"
        for p in ps
    )
    return f"""
    WITH sample AS (
        SELECT {gsel} {value_expr} AS _v
        FROM {from_clause}
        WHERE CAST(('0x' || substr(md5({id_expr}), 1, 8))::BIGINT AS DOUBLE)
              / 4294967296.0 < {float(rate)!r}
    ),
    ranked AS (
        SELECT {gsel} _v,
               ROW_NUMBER() OVER ({part} ORDER BY _v) AS _rn,
               COUNT(*) OVER ({part}) AS _n
        FROM sample
    )
    SELECT {gsel} MAX(_n) AS sample_n, {qs}
    FROM ranked {f"GROUP BY {g}" if g else ""}
    """


# --- A-ES weighted sampling without replacement (Efraimidis-Spirakis) --------

def es_key(
    weight: Column, id_col: Column, seed: str = "0", dp: int = 6
) -> Column:
    """The Efraimidis-Spirakis (2006) reservoir key, exponential form:
    key = -ln(u) / w with u uniform in (0, 1) — the k SMALLEST keys are
    a weighted sample WITHOUT replacement (inclusion probability
    proportional to w, one pass, mergeable: the bottom-k of a union is
    the bottom-k of the per-shard bottom-k's, the KMV argument).

    u is md5-derived from (seed, id) — (h + 0.5) / 2^32, never exactly
    0 or 1 — so the sample is a deterministic function of the DATA
    (rerun/repartition/engine-invariant, the hash_bucket contract) and
    replays exactly in SQL via ``es_key_sql``. Rounded to ``dp``
    decimals BEFORE ranking with an id tiebreak (the q58 contract) so
    both engines rank identical doubles.

    Weights must be > 0; a NULL or non-positive weight yields a NULL
    key (conservative: never sampled) rather than a wrong-signed one.
    """
    h = md5_long(F.concat(F.lit(f"{seed}:"), id_col.cast("string")))
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    w = weight.cast("double")
    key = -F.log(u) / w
    return F.round(F.when(w > 0, key), dp)


def weighted_sample(
    df: DataFrame,
    weight: Column,
    k: int,
    id_col: str = "doc_id",
    seed: str = "0",
) -> DataFrame:
    """The k rows with the smallest A-ES keys — a deterministic
    weighted sample without replacement. Plan: the key is a scan-side
    expression; the selection compiles to TakeOrderedAndProject(k) —
    bounded state at any corpus size, no full sort, no RNG state.
    Adds ``es_key_r``."""
    keyed = df.withColumn("es_key_r", es_key(weight, F.col(id_col), seed))
    return (
        keyed.filter(F.col("es_key_r").isNotNull())
        .orderBy(F.col("es_key_r").asc(), F.col(id_col).asc())
        .limit(k)
    )


def es_key_sql(
    weight_expr: str, id_expr: str, seed: str = "0", dp: int = 6
) -> str:
    """DuckDB replay of ``es_key`` — the shared-builder idiom. The
    seed interpolates as a properly escaped string literal
    (sql_str_literal), matching the Spark twin on any seed."""
    from solarpaneldatawrangler_spark.functions.text import sql_str_literal

    seed_lit = sql_str_literal(f"{seed}:")
    u = (
        f"(CAST(('0x' || substr(md5({seed_lit} || ({id_expr})), 1, 8))"
        f"::BIGINT AS DOUBLE) + 0.5) / 4294967296.0"
    )
    w = f"CAST(({weight_expr}) AS DOUBLE)"
    return (
        f"ROUND(CASE WHEN {w} > 0 THEN -ln({u}) / {w} END, {dp})"
    )


# --- deterministic train/valid/test split ------------------------------------

def split_assign(
    id_col: Column,
    fractions: dict[str, float],
    seed: str = "split",
) -> Column:
    """Split label from a hash bucket: the [0,1) line is carved into
    consecutive intervals in SORTED label order, so the assignment is
    a pure function of (seed, id) — the standard leakage-safe
    train/valid/test split (a document lands in the same split in
    every rerun, engine, and pipeline stage; join-stable with any
    derived table). Fractions must sum to 1 (validated)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    h = md5_long(F.concat(F.lit(f"{seed}:"), id_col.cast("string")))
    bucket = h.cast("double") / F.lit(4294967296.0)
    labels = sorted(fractions)
    expr = F.lit(labels[-1])
    acc = 0.0
    arms = []
    for name in labels[:-1]:
        acc += fractions[name]
        arms.append((acc, name))
    for cut, name in reversed(arms):
        expr = F.when(bucket < F.lit(cut), F.lit(name)).otherwise(expr)
    return expr


def split_assign_sql(
    id_expr: str, fractions: dict[str, float], seed: str = "split"
) -> str:
    """DuckDB replay of ``split_assign`` — same sorted-label interval
    carving, same literals. Labels and the seed interpolate as
    properly escaped string literals (sql_str_literal — the
    mixture_case_sql lesson), and the degenerate single-label input
    ({label: 1.0}, which the Spark twin accepts) emits the bare
    literal instead of an armless, unparseable CASE."""
    from solarpaneldatawrangler_spark.functions.text import sql_str_literal

    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    seed_lit = sql_str_literal(f"{seed}:")
    bucket = (
        f"(CAST(('0x' || substr(md5({seed_lit} || ({id_expr})), 1, 8))"
        f"::BIGINT AS DOUBLE) / 4294967296.0)"
    )
    labels = sorted(fractions)
    if len(labels) == 1:
        return sql_str_literal(labels[0])
    arms = []
    acc = 0.0
    for name in labels[:-1]:
        acc += fractions[name]
        arms.append(f"WHEN {bucket} < {acc!r} THEN {sql_str_literal(name)}")
    return f"CASE {' '.join(arms)} ELSE {sql_str_literal(labels[-1])} END"
