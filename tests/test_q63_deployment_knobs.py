"""q63 deployment-knob verification (r13 VERDICT item 6).

The q63 gate query freezes n_lists=16 / n_planes=8 so the DuckDB
oracle can embed the trained centroids/hyperplanes as VALUES; the
sf10 probe rules the operator under its DOCUMENTED deployment
parameterization (n_lists ~ N/125, n_planes ~ log2(N/50) — the
scripts/sf10_probe._q63_scaled formula). That parameterization was
probed for TIME but never hash/recall-verified. This test closes it:
at sf0.1 — the smallest dir where the knob formula actually departs
from the frozen values (n_lists 40 vs 16) — both parameterizations'
pair sets are checked against the BRUTE-FORCE truth (all-pairs exact
rounded cosine >= threshold, computed independently in numpy from the
same parquet):

- precision must be 1.0 for BOTH (the operators verify candidates
  with an exact rounded-cosine cut, so any emitted pair must be true);
- recall of the DEPLOYMENT knobs must clear a documented floor AND
  not fall behind the frozen knobs by more than a documented slack
  (blocked methods trade recall for the N^2/n_lists -> N*avg_cluster
  scan bound; the floors pin how much).

Measured before pinning (14000 vectors, truth 47797 pairs, all in the
WEAK 0.40-0.65 cosine band — this corpus has no >=0.7 pairs):
  sem  frozen 0.2235  scaled 0.1147   (both precision 1.0)
  lsh  frozen 0.1602  scaled 0.1080   (both precision 1.0)
The weak band is the blocked methods' worst case by construction —
sign-LSH collision probability at cos 0.4 is (1-(1-(1-acos(.4)/pi)^8))
per table ~ 0.025, ~0.14 over 6 tables, exactly what is measured; at
the operators' design band (cos >= 0.9, true near-dups) the same
curve gives ~0.87+ and SemDeDup clusters co-locate near-identical
vectors almost surely. The floors therefore pin the WORST-case band:
a regression below them means the blocking itself broke (wrong
bucketing join, broken signatures), not that the band got hard.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"
THRESHOLD = 0.4
ROUND_DP = 4

SEM_RECALL_FLOOR = 0.08
LSH_RECALL_FLOOR = 0.08
SCALED_VS_FROZEN_SLACK = 0.15  # scaled recall >= frozen recall - slack


N_REPLICAS = 7  # 7 x ~2000 = ~14000 vectors: n_lists 16->112 AND
#                 n_planes 8->9 both depart from the frozen knobs


def _corpus():
    """sf0.1's embeddings plus sign-flip-decorrelated replicas (the
    scripts/sf1_sweep recipe verbatim: vec_id + r*10^7, component i of
    replica r flipped when md5('r:i')[:8] is odd — diag(+-1) is
    orthogonal so intra-replica cosines are exactly preserved,
    cross-replica clones decorrelate). Sized so BOTH deployment knobs
    genuinely depart from the frozen gate values, without depending on
    the gitignored sf1 dir."""
    import hashlib

    import pyarrow.parquet as papq

    tbl = papq.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
    all_ids, all_mats = [ids], [mat]
    for r in range(1, N_REPLICAS):
        sgn = np.array(
            [
                1.0
                if int(
                    hashlib.md5(f"{r}:{i}".encode()).hexdigest()[:8], 16
                ) % 2 == 0
                else -1.0
                for i in range(1, mat.shape[1] + 1)
            ],
            dtype=np.float32,
        )
        all_ids.append(ids + r * 10_000_000)
        all_mats.append(mat * sgn)
    ids2 = np.concatenate(all_ids)
    mat2 = np.concatenate(all_mats)
    order = np.argsort(ids2, kind="stable")
    return ids2[order], mat2[order]


def _truth_pairs(ids, mat):
    """All-pairs rounded-cosine >= threshold, independent numpy path
    (float32 storage cast to float64, matching the operators)."""
    m = mat.astype(np.float64)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    unit = m / norms[:, None]
    sims = unit @ unit.T
    iu = np.triu_indices(len(ids), k=1)
    keep = np.round(sims[iu], ROUND_DP) >= THRESHOLD
    a, b = ids[iu[0][keep]], ids[iu[1][keep]]
    return {(int(x), int(y)) if x < y else (int(y), int(x))
            for x, y in zip(a, b)}


def _pairs(df):
    return {
        (int(r.id_a), int(r.id_b)) if r.id_a < r.id_b
        else (int(r.id_b), int(r.id_a))
        for r in df.select("id_a", "id_b").collect()
    }


@pytest.fixture(scope="module")
def knob_sets(spark):
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    from solarpaneldatawrangler_spark.operators.similarity import (
        lsh_neardup_pairs,
        semantic_dedup_pairs,
        train_ivf_centroids,
    )

    ids, mat = _corpus()
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, mat)],
        schema,
    )
    n = len(ids)
    # the sf10_probe._q63_scaled deployment formula, cited not imported
    # (scripts/ is not a package): ~125 vectors/cluster, ~50/bucket
    n_lists_scaled = max(16, n // 125)
    n_planes_scaled = max(8, math.ceil(math.log2(max(n, 2) / 50)))
    assert n_lists_scaled != 16 and n_planes_scaled != 8, (
        "the replicated corpus must exercise genuinely different "
        f"knobs — got n_lists={n_lists_scaled}, n_planes={n_planes_scaled}"
    )

    out = {"truth": _truth_pairs(ids, mat)}
    for tag, n_lists, n_planes in (
        ("frozen", 16, 8),
        ("scaled", n_lists_scaled, n_planes_scaled),
    ):
        cents = train_ivf_centroids(emb, n_lists=n_lists,
                                    sample_cap=min(n, 50_000))
        out[f"sem_{tag}"] = _pairs(
            semantic_dedup_pairs(emb, cents, threshold=THRESHOLD)
        )
        out[f"lsh_{tag}"] = _pairs(
            lsh_neardup_pairs(
                emb, threshold=THRESHOLD, dim=64,
                n_planes=n_planes, n_tables=6,
            )
        )
    return out


def _recall(got, truth):
    return len(got & truth) / max(len(truth), 1)


@pytest.mark.parametrize("method", ["sem", "lsh"])
def test_precision_is_exact_under_both_knob_sets(knob_sets, method):
    truth = knob_sets["truth"]
    assert truth, "sf0.1 embeddings must contain near-dup pairs"
    for tag in ("frozen", "scaled"):
        got = knob_sets[f"{method}_{tag}"]
        false_pos = got - truth
        assert not false_pos, (
            f"{method}_{tag}: emitted pairs below the exact rounded "
            f"cosine threshold: {sorted(false_pos)[:5]}"
        )


@pytest.mark.parametrize(
    "method,floor",
    [("sem", SEM_RECALL_FLOOR), ("lsh", LSH_RECALL_FLOOR)],
)
def test_deployment_knobs_recall_floor(knob_sets, method, floor):
    truth = knob_sets["truth"]
    r_frozen = _recall(knob_sets[f"{method}_frozen"], truth)
    r_scaled = _recall(knob_sets[f"{method}_scaled"], truth)
    assert r_scaled >= floor, (
        f"{method} deployment knobs recall {r_scaled:.3f} < floor "
        f"{floor} (frozen recall {r_frozen:.3f}, truth {len(truth)})"
    )
    assert r_scaled >= r_frozen - SCALED_VS_FROZEN_SLACK, (
        f"{method}: scaling the knobs cost {r_frozen - r_scaled:.3f} "
        f"recall (> slack {SCALED_VS_FROZEN_SLACK}) — the deployment "
        "parameterization no longer stands in for the gate's frozen one"
    )


def test_knob_formula_clamps_n_lists_to_training_sample():
    """r16 ADVICE: n//125 outgrows the 50k-capped k-means training
    sample past n ~ 6.25M and _lloyd rightly raises; the formula must
    clamp so every advertised parameterization is trainable, with >= 4
    sample vectors per centroid."""
    from solarpaneldatawrangler_spark.operators.similarity import (
        q63_deployment_knobs,
    )

    for n in (1_000, 100_000, 1_562_500, 6_250_000, 50_000_000, 10**9):
        k = q63_deployment_knobs(n)
        assert k["n_lists"] * 4 <= k["sample_cap"], (n, k)
        assert k["n_lists"] >= 16
    # below the clamp point the original n/125 scaling is unchanged
    assert q63_deployment_knobs(200_000)["n_lists"] == 1600
    # at and past the clamp point it pins to sample_cap//4
    assert q63_deployment_knobs(50_000_000)["n_lists"] == 12_500
