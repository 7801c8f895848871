"""Image near-duplicate dedup: dHash determinism, planted twins, and
plan shape (no cartesian; banded equi-join candidates only)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.operators.multimodal import (
    NumpyCodec,
    deterministic_pixels,
    image_dhash,
    image_neardup_pairs,
)

CODEC = NumpyCodec()


def _images(spark):
    """ids 0..9: distinct noise images. id 10 = exact byte copy of id 1.
    id 11 = id 0 with a mild brightness bump on one 8x8 corner block
    (survives the grayscale+resize into a few flipped gradient bits)."""
    rows = []
    pix = {}
    for i in range(10):
        pix[i] = deterministic_pixels(40, 40, f"img-{i}".encode())
        rows.append((i, CODEC.encode(pix[i])))
    rows.append((10, CODEC.encode(pix[1])))
    twin = pix[0].astype(np.int16)
    twin[:8, :8] += 2
    rows.append((11, CODEC.encode(np.clip(twin, 0, 255).astype(np.uint8))))
    return spark.createDataFrame(rows, "image_id long, content binary")


def test_dhash_deterministic_and_discriminative(spark):
    df = _images(spark)
    h = {r.image_id: r.dhash for r in image_dhash(df).collect()}
    assert len(h) == 12
    # exact copy: identical hash
    assert h[10] == h[1]
    # mild perturbation: close in Hamming space
    near = bin((h[0] ^ h[11]) & (2**64 - 1)).count("1")
    assert near <= 4, near
    # unrelated noise images: far apart
    for i in range(1, 10):
        d = bin((h[0] ^ h[i]) & (2**64 - 1)).count("1")
        assert d > 10, (i, d)
    # rerun is bit-identical (pure function of pixels)
    assert h == {r.image_id: r.dhash for r in image_dhash(df).collect()}


def test_neardup_pairs_find_planted_twins_only(spark):
    # bands=8 keeps the pigeonhole recall guarantee at max_hamming=6
    # (complete for hamming < bands)
    df = _images(spark)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in image_neardup_pairs(df, max_hamming=6, bands=8).collect()
    }
    assert pairs[(1, 10)] == 0
    assert (0, 11) in pairs and pairs[(0, 11)] <= 4
    extras = set(pairs) - {(1, 10), (0, 11)}
    assert not extras, extras


def test_neardup_validates_pigeonhole_precondition(spark):
    df = _images(spark)
    with pytest.raises(ValueError, match="pigeonhole"):
        image_neardup_pairs(df, max_hamming=6, bands=4)


def test_neardup_plan_is_banded_equijoin(spark):
    df = _images(spark)
    plan = (
        image_neardup_pairs(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_dhash_rejects_oversized():
    with pytest.raises(ValueError, match="fit 64 bits"):
        image_dhash(None, hash_size=9)


def test_q62_oracle_demotes_on_corrupt_parquet(tmp_path, monkeypatch, capsys):
    """r13 VERDICT item 5 (the q62-demotion test): the import-time
    numpy-mirror oracle runs a parquet read at package import — a
    CORRUPT documents.parquet (pyarrow ArrowInvalid, a ValueError
    subclass) must demote q62 to rows-only with a loud stderr notice,
    not abort every import of the plans package. A missing dir
    (FileNotFoundError/OSError) demotes the same way."""
    from solarpaneldatawrangler_spark.plans import catalog as cat
    from solarpaneldatawrangler_spark.plans.extension_queries import (
        _q62_oracle_or_none,
    )

    corrupt = tmp_path / "sfX"
    corrupt.mkdir()
    (corrupt / "documents.parquet").write_bytes(b"not a parquet file")
    monkeypatch.setattr(cat, "ORACLE_SF_DIR", str(corrupt))
    assert _q62_oracle_or_none() is None
    err = capsys.readouterr().err
    assert "q62_multimodal_pipeline oracle demoted to rows-only" in err

    monkeypatch.setattr(cat, "ORACLE_SF_DIR", "/nonexistent/sfY")
    assert _q62_oracle_or_none() is None
    assert "demoted to rows-only" in capsys.readouterr().err


def test_q62_oracle_present_when_testdata_exists():
    """With healthy oracle testdata (this environment), q62 MUST carry
    its full VALUES hash oracle — demotion is for broken environments
    only (the q52 idiom)."""
    import os

    from solarpaneldatawrangler_spark.plans import CATALOG
    from solarpaneldatawrangler_spark.plans.catalog import ORACLE_SF_DIR

    assert os.path.exists(f"{ORACLE_SF_DIR}/documents.parquet")
    oracle = CATALOG["q62_multimodal_pipeline"].oracle
    assert oracle is not None
    assert "tilefp" in oracle and "imagedup" in oracle
