"""Mergeable one-pass sketches (HyperLogLog cardinality, Count-Min
frequency) as pure DataFrame aggregations with exact cross-engine
replays.

At 100 TB, corpus profiling — "how many distinct tokens / urls / users
per shard, what are the heavy hitters" — cannot afford
distinct-count shuffles proportional to the data: an exact
`groupBy(token).count()` over a web corpus shuffles billions of keys
to answer a question whose answer is one number. Sketches invert the
cost: the map side folds every partition into a CONSTANT-size state
(4096 registers / a 4x1024 counter grid), the shuffle moves only that
state, and sketches from different shards/days MERGE losslessly
(register-wise max, counter-wise sum) — the property that makes them
the standard incremental-profiling structure (Flajolet et al. 2007
HyperLogLog; Cormode & Muthukrishnan 2005 Count-Min).

Engine-neutral determinism (the q54/q72 md5 contract): every hash is
md5-derived (functions.text.md5_long — first 32 md5 bits as bigint),
bucket/remainder splits are bit ops, the HLL harmonic sum is an exact
scaled-integer sum (2^(21-rho) folded as BIGINT — partition merge
order cannot change it), and the only transcendentals (the final
estimate's one division, the linear-counting ln) are rounded before
output. So the whole sketch — registers, counters, and estimate —
replays hash-exactly in DuckDB SQL (q76/q77), which is what makes an
approximate structure ORACLE-CHECKABLE: the driver verifies the exact
deterministic algorithm, while the accuracy-vs-exact claim is a
property test (rel-err ~1.04/sqrt(m) for HLL; CMS overestimates by at
most eps*N with the usual probabilistic bound).

Spark plan shapes: both sketches are one narrow projection (explode +
hash math inside the scan stage) followed by ONE partial-aggregating
groupBy whose key space is bounded by the sketch size (<= n_groups x
4096 rows ever cross the wire) — the constant-state shape described
above. Estimation joins the tiny sketch via broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.functions.rounding import (
    round_ratio_half_away,
    round_ratio_half_away_sql,
)
from solarpaneldatawrangler_spark.functions.text import md5_long

HLL_P = 12
HLL_M = 1 << HLL_P  # 4096 registers
# max rho: the remainder is 32 - p = 20 bits, so leading-zeros+1 <= 21
_HLL_RHO_MAX = 33 - HLL_P
# alpha_m * m^2 * 2^21: shiftright(2^20, rho-1) == 2^(21-rho), so the
# scaled harmonic sum is 2^21 * sum(2^-rho) — numerator and the
# empty-register contribution must both carry 2^21 (= 2^RHO_MAX), ONE
# power off and the raw estimate halves. Computed once here, embedded
# as the SAME literal in both engines.
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
_HLL_NUM = HLL_ALPHA * HLL_M * HLL_M * float(1 << _HLL_RHO_MAX)


def _sketch_item(item: Column) -> Column:
    """NULL-item normalization shared by every sketch builder: md5 of
    NULL is NULL, which would register a (bucket=NULL, rho=NULL) HLL
    row that COUNT sees but SUM skips (a silent estimate inflation),
    scatter CMS occurrences into a NULL column, and sort ambiguously
    in KMV (Spark NULLS FIRST vs DuckDB NULLS LAST). Coalesce to ''
    exactly like the Bloom path (_bloom_item), mirrored by the
    COALESCE the *_sql builders emit."""
    return F.coalesce(item.cast("string"), F.lit(""))


def hll_bucket_rho(item: Column) -> tuple[Column, Column]:
    """(register index, rank) of one item: md5_long's 32 uniform bits
    split as low p bits -> bucket, high 20 bits -> rho = leading
    zeros + 1 (via length(bin(w)) — pure integer/string ops, no
    float log2 whose half-ulp could flip a register). NULL items
    count as '' (_sketch_item)."""
    h = md5_long(_sketch_item(item))
    bucket = h.bitwiseAND(F.lit(HLL_M - 1))
    w = F.shiftright(h, HLL_P)
    rho = F.when(w == 0, F.lit(_HLL_RHO_MAX)).otherwise(
        F.lit(_HLL_RHO_MAX) - F.length(F.bin(w))
    )
    return bucket, rho


def hll_sketch(
    df: DataFrame, item: Column, group_cols: list[str] | None = None
) -> DataFrame:
    """Registers (group..., bucket, rho) — one row per NON-EMPTY
    register: groupBy max folds partition-locally, so at most
    n_groups x 4096 rows shuffle no matter the corpus size. Two
    sketches over disjoint data merge via `hll_merge` (max is
    associative/commutative/idempotent)."""
    group_cols = group_cols or []
    bucket, rho = hll_bucket_rho(item)
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Lossless union of register sets (register-wise max) — the
    shard/day/corpus rollup path; group columns must match."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "rho"]
    return out.groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Cardinality estimate per group from a register set. The
    harmonic sum is EXACT: sum of 2^(21-rho) as BIGINT (rho <= 21,
    4096 registers -> < 2^33, no overflow, order-insensitive), empty
    registers contribute 2^21 each via (m - n_nonempty); the estimate
    is one double division + the standard small-range linear-counting
    branch (m * ln(m/zeros) when E <= 2.5m and zeros exist), rounded
    to 4dp — the only transcendental, rounded per the catalog's
    determinism rules. Columns: group..., hll_zeros, hll_est_r."""
    group_cols = group_cols or []
    scale = _HLL_RHO_MAX - 1  # 2^(21 - rho) == 2^scale >> (rho - 1)
    per = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        # shiftright with a COLUMN shift amount: the Catalyst expression
        # supports it; the PySpark wrapper's numBits is int-only, so expr
        F.sum(
            F.expr(f"shiftright(CAST({1 << scale} AS BIGINT), rho - 1)")
        ).alias("_s"),
    )
    zeros = (F.lit(HLL_M) - F.col("_n")).alias("hll_zeros")
    # empty registers: rho=0 -> 2^21 * 2^-0 = 2^(scale+1) each
    s_int = F.col("_s") + (F.lit(HLL_M) - F.col("_n")) * F.lit(
        1 << (scale + 1)
    )
    raw = F.lit(_HLL_NUM) / s_int.cast("double")
    zcol = F.lit(HLL_M) - F.col("_n")
    # r13: the raw branch is the exact rational fn / (fd * s) where
    # fn/fd = _HLL_NUM.as_integer_ratio() (the double constant IS a
    # dyadic rational) — 4dp-rounded in pure integer arithmetic. The
    # linear-counting branch (ln) stays the catalog's documented
    # transcendental residual; the branch CONDITION stays the double
    # divide (same IEEE op in both engines).
    fn, fd = _HLL_NUM.as_integer_ratio()
    raw_r4 = round_ratio_half_away(F.lit(fn), s_int * F.lit(fd), 4)
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zcol > 0),
        F.round(
            F.lit(float(HLL_M))
            * F.log(F.lit(float(HLL_M)) / zcol.cast("double")),
            4,
        ),
    ).otherwise(raw_r4)
    return per.select(
        *group_cols, zeros, est.alias("hll_est_r")
    )


def hll_sql(
    item_expr: str, from_clause: str, group_cols: list[str] | None = None
) -> str:
    """The DuckDB replay of sketch+estimate — ONE definition of the
    constants (m, rho max, the alpha*m^2*2^21 literal) shared with the
    Spark path above, the c4_*_sql shared-builder idiom."""
    group_cols = group_cols or []
    g = ", ".join(group_cols)
    gsel = f"{g}, " if g else ""
    gby = f"GROUP BY {g}" if g else ""
    m, rmax, scale = HLL_M, _HLL_RHO_MAX, _HLL_RHO_MAX - 1
    return f"""
    WITH hashed AS (
        SELECT {gsel}
               ('0x' || substr(md5(COALESCE({item_expr}, '')), 1, 8))::BIGINT
                   AS h
        FROM {from_clause}
    ),
    regs AS (
        SELECT {gsel} h & {m - 1} AS bucket,
               MAX(CASE WHEN (h >> {HLL_P}) = 0 THEN {rmax}
                   ELSE {rmax} - length(bin(h >> {HLL_P})) END) AS rho
        FROM hashed GROUP BY {gsel} h & {m - 1}
    ),
    folded AS (
        SELECT {gsel} COUNT(*) AS n,
               SUM(({1 << scale}::BIGINT) >> (rho - 1)) AS s
        FROM regs {gby}
    )
    SELECT {gsel} ({m} - n) AS hll_zeros,
           CASE WHEN ({_HLL_NUM!r} / CAST(s + ({m} - n) * {1 << (scale + 1)}::BIGINT AS DOUBLE)) <= {2.5 * HLL_M!r}
                       AND ({m} - n) > 0
                 THEN ROUND({float(m)!r} * ln({float(m)!r} / CAST({m} - n AS DOUBLE)), 4)
                 ELSE {round_ratio_half_away_sql(
                     str(_HLL_NUM.as_integer_ratio()[0]),
                     f"(s + ({m} - n) * {1 << (scale + 1)}::BIGINT)"
                     f" * {_HLL_NUM.as_integer_ratio()[1]}",
                     4, assume_nonneg=True)}
                 END AS hll_est_r
    FROM folded
    """


CMS_D = 4
CMS_W = 1024


def _cms_col(item: Column, i: int, w: int) -> Column:
    # NULL items hash as '' (_sketch_item): concat with a NULL operand
    # is NULL, which would scatter the occurrence into a NULL column
    return md5_long(F.concat(F.lit(f"{i}:"), _sketch_item(item))) % w


def cms_sketch(
    df: DataFrame, item: Column, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Count-Min counter grid (i, col, n): each item occurrence
    increments one counter per row i at column md5(i:item) % w. The
    explode-to-d-rows happens INSIDE the scan stage; the groupBy key
    space is d x w (4096), so partial aggregation collapses
    everything map-side and the shuffle is constant-size. Counters
    from disjoint corpora merge by summing (i, col) cells."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"), _cms_col(item, i, w).alias("col")
            )
            for i in range(d)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .select("p.i", "p.col")
        .groupBy("i", "col")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Point-frequency estimates: est(item) = min over rows of the
    item's counter — never an underestimate, over by at most the
    collisions in its narrowest row. The sketch is tiny (d x w rows),
    so the probe is a BROADCAST join; per item the d cells reduce by
    min. Adds `cms_n` to ``queries``."""
    item = F.col(item_col)
    probes = queries.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _cms_col(item, i, w).alias("col"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("p"),
    ).select(item_col, "p.i", "p.col")
    joined = probes.join(F.broadcast(sketch), ["i", "col"], "left")
    est = joined.groupBy(item_col).agg(
        F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cms_n")
    )
    return queries.join(F.broadcast(est), item_col, "left")


def cms_sql(
    item_expr: str, occurrences_from: str, d: int = CMS_D, w: int = CMS_W
) -> str:
    """DuckDB replay of the counter grid as a CTE body (one row per
    (i, col) with its count), parameterized like the Spark sketch —
    callers compose it with their own query/estimate SQL."""
    rows = " UNION ALL ".join(
        f"SELECT {i} AS i, "
        f"('0x' || substr(md5('{i}:' || COALESCE({item_expr}, '')), 1, 8))"
        f"::BIGINT % {w}"
        f" AS col FROM {occurrences_from}"
        for i in range(d)
    )
    return f"SELECT i, col, COUNT(*) AS n FROM ({rows}) GROUP BY i, col"


# --- Bloom filter: mergeable set membership ---------------------------------

BLOOM_M = 1 << 16  # bits
BLOOM_K = 6
_BLOOM_WORD_BITS = 32  # bits packed per BIGINT word: 2^31 max, no
# sign-bit hazard to reconcile between engines' << semantics


def _bloom_item(item: Column) -> Column:
    """NULL-normalized probe/build key: a NULL item hashes as '' so
    maybe_seen is always a real boolean. Without this, md5(NULL) is
    NULL, every bit test is NULL, and the documented admission
    composition — filter(~maybe_seen) admitted fast OR
    filter(maybe_seen) store-probed — drops NULL-text rows from BOTH
    branches (review-caught), while the store path normalizes
    NULL->'' and gives a verdict. Build and probe MUST share this rule
    or FALSE stops guaranteeing absence."""
    return F.coalesce(item.cast("string"), F.lit(""))


def _bloom_hashes(
    item: Column, hash_family: str = "md5"
) -> tuple[Column, Column]:
    """The two Kirsch-Mitzenmacher hashes (h1, h2) of the normalized
    item — THE single definition both the build explode and the staged
    probe derive positions from (pos_i = h1 + i*h2 mod m, two hashes
    instead of k; Kirsch & Mitzenmacher 2006).

    Two families, the dsir expr/numpy dual-path idiom:
    - 'md5' (default) — the engine-neutral oracle contract: the SQL
      builders (bloom_sql / bloom_probe_sql) replay the derivation
      textually in DuckDB; change it here and there together or probes
      return false negatives.
    - 'xxhash64' — the serve path: Spark's codegen-native hash, no
      string hex round-trip (same-session side-by-side at 20M probes
      x 2^25 bits, quiet load: build 5.7 -> 1.8 s, probe 49 -> 32 s —
      the probe's remaining cost is the k byte tests, not the hashes).
      NOT SQL-replayable (DuckDB has no xxhash64); build and probe
      MUST use the same family or FALSE stops guaranteeing absence —
      the same caller contract as m and k. Both hashes reduce to
      [0, 2^32) so k*h2 can never overflow a BIGINT position sum.
    """
    norm = _bloom_item(item)
    if hash_family == "md5":
        return md5_long(norm), md5_long(F.concat(F.lit("b:"), norm))
    if hash_family == "xxhash64":
        span = F.lit(1 << 32).cast("long")
        return (
            F.pmod(F.xxhash64(norm), span),
            F.pmod(F.xxhash64(F.lit("b:"), norm), span),
        )
    raise ValueError(f"unknown hash_family {hash_family!r}")


def _bloom_positions(
    item: Column, m: int, k: int, hash_family: str = "md5"
) -> list[Column]:
    """k bit positions from _bloom_hashes — the build-side (inline)
    form; the probe stages the two hashes as aliases first (see
    bloom_maybe_contains) but derives positions identically."""
    h1, h2 = _bloom_hashes(item, hash_family)
    return [(h1 + F.lit(i) * h2) % m for i in range(k)]


def bloom_build(
    df: DataFrame,
    item: Column,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    hash_family: str = "md5",
) -> DataFrame:
    """Bloom bitmap as (word, bits) rows: each item sets k bits; bits
    pack 32 per BIGINT word via a bit_or aggregate. The groupBy key
    space is m/32 words (2048 at the default), so — like the other
    sketches — the only shuffle is filter-sized, partial-combined
    map-side, and two filters over disjoint data MERGE by word-wise
    bit_or. FPR ≈ (1 - e^(-k*n/m))^k; size m for the corpus you gate.
    ``hash_family`` must match the probe's (see _bloom_hashes).
    """
    pos = F.explode(
        F.array(*_bloom_positions(item, m, k, hash_family))
    ).alias("pos")
    return (
        df.select(pos)
        .select(
            F.shiftright(F.col("pos"), 5).alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))"
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Word-wise OR of bitmaps — the shard/day rollup path."""
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.groupBy("word").agg(F.bit_or("bits").alias("bits"))


# The ARRAY<BIGINT> bitmap literal costs one Py4J lit call PER ELEMENT
# (~0.5 ms each: ~1 s of pure construction at the default 2048 words,
# measured as the bulk of q78's bench time; ~50 s at 100k words) while
# the BINARY literal is ONE call at any size (8 KiB default, 4 MiB at
# 2^25 bits) with runtime-equal probes — so 'auto' always picks
# binary, and the array encoding survives only as an explicitly
# requested variant kept bit-identical by the parity test.
_BLOOM_ARRAY_MAX_WORDS = 0


def bloom_maybe_contains(
    bloom: DataFrame,
    queries: DataFrame,
    item_col: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    impl: str = "auto",
    hash_family: str = "md5",
) -> DataFrame:
    """Adds `maybe_seen` to ``queries``: TRUE iff all k bits are set.
    FALSE is a GUARANTEE of absence (no false negatives — the property
    that makes the filter an admission fast-path: definitely-new rows
    skip the durable-store probe entirely; only maybe-seen rows pay
    the partition-pruned store join).

    Plan shape: the bitmap is BOUNDED (m bits), so it is collected once
    into a plan literal (the IVF-centroid / DSIR-ratio bounded-collect
    idiom) and the probe is a PURE SCAN-SIDE expression — k bit tests
    ANDed, zero shuffle, zero join, no matter how large ``queries`` is.
    (A join-back formulation would regroup the query side —
    corpus-sized work to evaluate a constant-size filter; the DuckDB
    replay keeps the relational form and the results are equal, q78.)

    Two literal encodings, bit-identical results (pinned by test):
    - 'binary' (the default via 'auto') — the whole bitmap as ONE
      BinaryType literal (little-endian within each 32-bit word, so
      byte(pos) = pos>>3 and bit(pos) = pos%8 globally); probe via
      conv(hex(substring(bitmap, byte, 1))) — scan-side, codegen'd,
      and the literal ships once in the task binary (8 KiB at the
      default m, 4 MiB at 2^25 bits; 20M probes in ~35 s on
      local[32]).
    - 'array'  — ARRAY<BIGINT> of m/32 words, element_at + bit test.
      Runtime-equal but construction is one Py4J call PER ELEMENT
      (~1 s at the default 2048 words, minutes at 1M), so it is never
      auto-chosen; it remains as the independently-derived encoding
      the parity test checks the binary path against.

    ``hash_family`` must match the build's: 'md5' is the SQL-replayable
    oracle contract, 'xxhash64' the ~1.5x-probe / ~3x-build codegen
    serve path (see _bloom_hashes)."""
    if impl == "auto":
        impl = (
            "array"
            if m // _BLOOM_WORD_BITS <= _BLOOM_ARRAY_MAX_WORDS
            else "binary"
        )
    words = {int(r["word"]): int(r["bits"]) for r in bloom.collect()}
    n_words = m // _BLOOM_WORD_BITS
    # Materialize the two Kirsch-Mitzenmacher hashes ONCE as aliases:
    # the k position expressions each reference both, and without the
    # projection step every one of the k bit tests re-evaluates both
    # md5s (measured 12.7 s vs 4.4 s for the hash stage over 20M
    # probes). CollapseProject refuses to inline a non-cheap alias
    # referenced more than once (the q71 kept-lines rule), so the
    # single evaluation survives optimization.
    h1c, h2c = "_bloom_h1", "_bloom_h2"
    h1, h2 = _bloom_hashes(F.col(item_col), hash_family)
    staged = queries.withColumns({h1c: h1, h2c: h2})
    positions = [
        (F.col(h1c) + F.lit(i) * F.col(h2c)) % m for i in range(k)
    ]
    checks = []
    # 1 << (pos % width) with a COLUMN shift amount: classic PySpark's
    # shiftleft only takes an int amount, and pow(2.0, e) — though
    # exact for e <= 31 — costs a double Math.pow per test (measured
    # +18 s over 120M tests). A literal lookup table of the width's
    # power-of-two masks is exact and one element_at.
    def _bit_mask(pos: Column, width: int) -> Column:
        masks = F.array(*[F.lit(1 << i).cast("long") for i in range(width)])
        return F.element_at(masks, (pos % width).cast("int") + 1)

    if impl == "array":
        bitmap = F.array(
            *[F.lit(words.get(w, 0)).cast("long") for w in range(n_words)]
        )
        for pos in positions:
            word = F.shiftright(pos, 5) + 1  # element_at is 1-indexed
            checks.append(
                F.element_at(bitmap, word.cast("int")).bitwiseAND(
                    _bit_mask(pos, 32)
                )
                != 0
            )
    elif impl == "binary":
        buf = bytearray(n_words * 4)
        for w, bits in words.items():
            # little-endian word packing: global byte index == pos>>3
            buf[w * 4 : w * 4 + 4] = bits.to_bytes(4, "little")
        bitmap = F.lit(bytes(buf))
        for pos in positions:
            byte_idx = F.shiftright(pos, 3)  # substring is 1-indexed
            byte_val = F.conv(
                F.hex(
                    F.substring(bitmap, (byte_idx + 1).cast("int"), 1)
                ),
                16,
                10,
            ).cast("long")
            checks.append(byte_val.bitwiseAND(_bit_mask(pos, 8)) != 0)
    else:
        raise ValueError(f"unknown bloom probe impl: {impl!r}")
    maybe = checks[0]
    for c in checks[1:]:
        maybe = maybe & c
    return staged.withColumn("maybe_seen", maybe).drop(h1c, h2c)


def bloom_sql(
    item_expr: str, from_clause: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> str:
    """DuckDB replay of bloom_build as a (word, bits) SELECT — shared-
    builder idiom; compose with caller probe SQL. Replays
    _bloom_hashes exactly, including its NULL->'' normalization."""
    it = f"COALESCE(({item_expr})::VARCHAR, '')"
    pos = " UNION ALL ".join(
        f"SELECT (('0x' || substr(md5({it}), 1, 8))::BIGINT"
        f" + {i} * ('0x' || substr(md5('b:' || {it}), 1, 8))::BIGINT)"
        f" % {m} AS pos FROM {from_clause}"
        for i in range(k)
    )
    return (
        f"SELECT pos // 32 AS word, bit_or(1::BIGINT << (pos % 32)::INT)"
        f" AS bits FROM ({pos}) GROUP BY pos // 32"
    )


def bloom_probe_sql(
    item_expr: str,
    queries_from: str,
    bloom_cte: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> str:
    """DuckDB replay of bloom_maybe_contains: per-item bool_and over
    the k membership bits against ``bloom_cte`` (a CTE name holding
    (word, bits)). Replays _bloom_hashes exactly, including its
    NULL->'' normalization (the emitted item is normalized too, so a
    NULL query keys the same row both engines)."""
    it = f"COALESCE(({item_expr})::VARCHAR, '')"
    pos = " UNION ALL ".join(
        f"SELECT {it} AS item,"
        f" (('0x' || substr(md5({it}), 1, 8))::BIGINT"
        f" + {i} * ('0x' || substr(md5('b:' || {it}), 1, 8))::BIGINT)"
        f" % {m} AS pos FROM {queries_from}"
        for i in range(k)
    )
    return f"""
    SELECT p.item,
           bool_and((COALESCE(b.bits, 0) & (1::BIGINT << (p.pos % 32)::INT)) != 0)
               AS maybe_seen
    FROM ({pos}) p LEFT JOIN {bloom_cte} b ON b.word = p.pos // 32
    GROUP BY p.item
    """


# --- KMV (k minimum values): mergeable distinct-count sample ----------------

KMV_K = 256
_KMV_HASH_SPACE = 1 << 32  # md5_long yields 32 uniform bits


def kmv_sketch(df: DataFrame, item: Column, k: int = KMV_K) -> DataFrame:
    """The k smallest DISTINCT md5 hash values of ``item`` as
    (rank, h) rows — the KMV synopsis (Beyer et al., SIGMOD 2007).
    Order-free (a set minimum), so it is exactly replayable in SQL
    and two sketches over disjoint data merge losslessly
    (``kmv_merge``). Distinct-count estimate via ``kmv_estimate``;
    the same bottom-k hashes double as a uniform sample of the
    distinct items when built with the item riding along.

    Plan shape: one hash projection in the scan, a distinct on the
    32-bit hash (map-side partial aggregation dedupes per partition
    first, so the Exchange carries per-partition-distinct longs, not
    rows), then TakeOrderedAndProject(k) — bounded state everywhere.
    32-bit hashes are the oracle-parity choice (DuckDB md5 replay);
    collisions bias the estimate only as n approaches 2^16-ish
    (birthday) — size up via a wider md5 slice if a deployment needs
    n >> millions. NULL items count as '' (_sketch_item)."""
    h = md5_long(_sketch_item(item)).alias("h")
    hashes = df.select(h).distinct().orderBy("h").limit(k)
    w = Window.orderBy("h")
    return hashes.select(
        F.row_number().over(w).alias("rank"), F.col("h")
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = KMV_K) -> DataFrame:
    """Lossless union merge: the bottom-k of the combined hash sets —
    identical to a direct build over the union of the inputs."""
    hashes = (
        a.select("h").unionByName(b.select("h")).distinct()
        .orderBy("h").limit(k)
    )
    w = Window.orderBy("h")
    return hashes.select(
        F.row_number().over(w).alias("rank"), F.col("h")
    )


def kmv_estimate(sketch: DataFrame, k: int = KMV_K) -> DataFrame:
    """One row (kmv_n, kmv_est_r): the unbiased estimator
    (k-1) * 2^32 / h_(k) when the sketch is full, else the sketch IS
    the distinct set (est = row count) — the standard small-set rule.
    r13: the full-sketch branch is the exact rational (k-1)*2^32 /
    h_(k), so its 4dp rounding runs in pure integer arithmetic
    (round_ratio_half_away) — engine-identical at decimal ties."""
    return sketch.agg(
        F.count("h").alias("kmv_n"),
        F.when(
            F.count("h") < k, F.count("h").cast("double")
        ).otherwise(
            round_ratio_half_away(
                F.lit((k - 1) * _KMV_HASH_SPACE), F.max("h"), 4
            )
        ).alias("kmv_est_r"),
    )


def kmv_sql(item_expr: str, from_clause: str, k: int = KMV_K) -> str:
    """DuckDB replay of kmv_sketch: bottom-k distinct 32-bit md5
    hashes with their rank — the shared-builder idiom (compose with
    caller estimate SQL)."""
    return (
        f"SELECT ROW_NUMBER() OVER (ORDER BY h) AS rank, h FROM ("
        f"SELECT DISTINCT"
        f" ('0x' || substr(md5(COALESCE({item_expr}, '')), 1, 8))::BIGINT"
        f" AS h FROM {from_clause}) ORDER BY h LIMIT {k}"
    )


def kmv_jaccard(a: DataFrame, b: DataFrame, k: int = KMV_K) -> DataFrame:
    """Sketch-space set operations (Beyer et al., SIGMOD 2007 §5; the
    theta-sketch idiom): from two KMV sketches ALONE — no rescan of
    either input — estimate Jaccard similarity, union, and
    intersection cardinalities.

    rho = |M ∩ A ∩ B| / |M| where M is the bottom-k of A ∪ B: M is a
    uniform sample of the distinct union, so the fraction of its
    members present in both sketches is an unbiased Jaccard estimate,
    and inter_est = rho * union_est. One row out:
    (union_n, overlap_n, jaccard_r, union_est_r, inter_est_r).

    Everything is integer counts into one or two IEEE double ops,
    rounded — deterministic and exactly SQL-replayable. Plan: the
    inputs are already k-bounded, so every join/agg here is driver-
    scale; at 100 TB the corpus cost was paid once when the sketches
    were built (one scan each, mergeable across shards)."""
    u = kmv_merge(a, b, k)
    flagged = (
        u.join(
            a.select("h").withColumn("_in_a", F.lit(1)), "h", "left"
        ).join(b.select("h").withColumn("_in_b", F.lit(1)), "h", "left")
    )
    # count(when(...)), not sum(when-otherwise): over an empty union
    # sketch sum() yields NULL while the DuckDB replay's COUNT(*)
    # FILTER yields 0 — count keeps the literals engine-identical.
    counts = flagged.agg(
        F.count("h").alias("union_n"),
        F.count(
            F.when(
                F.col("_in_a").isNotNull() & F.col("_in_b").isNotNull(), 1
            )
        ).alias("overlap_n"),
    )
    est = kmv_estimate(u, k)
    # r13 integer-exact roundings: jaccard is the count ratio
    # overlap/union; inter_est multiplies it by the already-4dp-exact
    # union estimate q/1e4 (ROUND(est*1e4) recovers q losslessly), so
    # inter = overlap*q / (union*1e4) — one exact rational each. The
    # GREATEST(union, 1) guard only changes the never-exercised
    # empty-union case (0/0 NaN -> 0.0, both engines).
    un = F.greatest(F.col("union_n"), F.lit(1).cast("long"))
    q4 = F.round(F.col("kmv_est_r") * 1e4).cast("long")
    return counts.crossJoin(F.broadcast(est)).select(
        "union_n",
        "overlap_n",
        round_ratio_half_away(F.col("overlap_n"), un, 6).alias("jaccard_r"),
        F.col("kmv_est_r").alias("union_est_r"),
        round_ratio_half_away(
            F.col("overlap_n") * q4, un * F.lit(10_000).cast("long"), 4
        ).alias("inter_est_r"),
    )


def kmv_jaccard_sql(a_cte: str, b_cte: str, k: int = KMV_K) -> str:
    """DuckDB replay of kmv_jaccard over two kmv_sql sketch CTEs —
    the same bottom-k-of-union membership counts and the
    kmv_estimate formula (small-set branch included), so both engines
    emit identical literals."""
    return f"""
    WITH a AS ({a_cte}), b AS ({b_cte}),
    u AS (
        SELECT h FROM (
            SELECT DISTINCT h FROM (
                SELECT h FROM a UNION ALL SELECT h FROM b
            )
        ) ORDER BY h LIMIT {k}
    ),
    flagged AS (
        SELECT u.h, (a.h IS NOT NULL AND b.h IS NOT NULL) AS in_both
        FROM u LEFT JOIN a ON a.h = u.h LEFT JOIN b ON b.h = u.h
    ),
    counts AS (
        SELECT COUNT(*) AS union_n,
               COUNT(*) FILTER (in_both) AS overlap_n,
               MAX(h) AS h_k
        FROM flagged
    ),
    est AS (
        SELECT CASE WHEN union_n < {k} THEN union_n::DOUBLE
                    ELSE {round_ratio_half_away_sql(
                        str((k - 1) * _KMV_HASH_SPACE), "h_k", 4,
                        assume_nonneg=True)}
               END AS est_r, *
        FROM counts
    )
    SELECT union_n, overlap_n,
           {round_ratio_half_away_sql(
               "overlap_n", "GREATEST(union_n, 1)", 6,
               assume_nonneg=True)} AS jaccard_r,
           est_r AS union_est_r,
           {round_ratio_half_away_sql(
               "overlap_n * CAST(ROUND(est_r * 10000) AS BIGINT)",
               "GREATEST(union_n, 1) * 10000", 4,
               assume_nonneg=True)} AS inter_est_r
    FROM est
    """
