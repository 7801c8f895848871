"""Import-order guard for the oracle training dir (r16, judge item 2).

Oracle SQL strings freeze data-dependent VALUES literals at package
import against plans.catalog.ORACLE_SF_DIR. The r15 sf1 sweep shipped a
red 43/50 record because the package was imported BEFORE the harness
exported SPARK_GRAFT_ORACLE_SF_DIR — 7 oracles trained at sf0.01
against sf1 data. These tests pin the guard that makes that class of
bug loud: the module attribute reflects import-time env, and
assert_oracle_dir() rejects any mismatch with the harness's intent.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = (
    "from solarpaneldatawrangler_spark.plans import catalog;"
    "print(catalog.ORACLE_SF_DIR)"
)


def _import_attr(env_override: str | None) -> str:
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_ORACLE_SF_DIR", None)
    if env_override is not None:
        env["SPARK_GRAFT_ORACLE_SF_DIR"] = env_override
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout.strip().splitlines()[-1]


def test_attribute_without_override_is_default():
    assert _import_attr(None) == "/root/testdata/sf0.01"


def test_attribute_with_override_reflects_env():
    assert _import_attr("/tmp/somewhere_sf9") == "/tmp/somewhere_sf9"


def test_assert_oracle_dir_passes_on_match():
    from solarpaneldatawrangler_spark.plans import catalog

    # whatever this process imported with IS the match target
    catalog.assert_oracle_dir(catalog.ORACLE_SF_DIR)
    # realpath-insensitive: a trailing slash or ./ must not trip it
    catalog.assert_oracle_dir(catalog.ORACLE_SF_DIR + "/")


def test_assert_oracle_dir_raises_on_mismatch():
    from solarpaneldatawrangler_spark.plans import catalog

    with pytest.raises(RuntimeError, match="import-order violation"):
        catalog.assert_oracle_dir("/definitely/not/the/imported/dir")


def test_all_four_scale_harnesses_carry_the_guard():
    """The guard only helps if every harness that depends on the
    import-time dir actually calls it — pin the call sites."""
    for script in (
        "sf1_sweep.py",
        "sf10_probe.py",
        "local_cluster_smoke.py",
        "margin_audit.py",
    ):
        src = open(os.path.join(REPO, "scripts", script)).read()
        assert "assert_oracle_dir(" in src, f"{script} lost the guard"


def test_late_export_is_caught_end_to_end():
    """The exact r15 failure shape: import the package FIRST, export
    the override AFTER, then call the guard with the intended dir —
    must raise, not silently train at the wrong scale."""
    code = (
        "import os\n"
        "from solarpaneldatawrangler_spark.plans import catalog\n"
        "os.environ['SPARK_GRAFT_ORACLE_SF_DIR'] = '/tmp/sf1_late'\n"
        "try:\n"
        "    catalog.assert_oracle_dir('/tmp/sf1_late')\n"
        "except RuntimeError:\n"
        "    print('GUARD_FIRED')\n"
    )
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_ORACLE_SF_DIR", None)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "GUARD_FIRED" in proc.stdout
