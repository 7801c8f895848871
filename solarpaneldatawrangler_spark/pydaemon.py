"""Python worker daemon with the Arrow-path imports paid once.

Stock ``pyspark.daemon`` forks a fresh worker per first-use and the
child then imports pandas/pyarrow/numpy inside
``pyspark.worker.main`` the first time an Arrow stage touches it —
~0.3 s of pure import cost per worker process, multiplied by however
many workers the executor spins up. Importing the heavy modules HERE,
in the daemon parent BEFORE any fork, makes every forked worker
inherit them via copy-on-write ``sys.modules`` (guide §4.5:
heavyweight init once per process, amortised over every task).

**Measured NEGATIVE on this harness — deliberately NOT wired into
``session.get_spark``.** The r16 A/B (``scripts/pydaemon_ab.py``,
3 interleaved fresh-JVM rounds per arm, quiet window): warm
1-partition Arrow jobs 0.246 s (stock) vs 0.343 s (preimport),
q58 3.92 s vs 4.27 s; only the 32-way first-fork fan-out improved
(1.62 -> 1.36 s), which a session pays once. Root cause of the
non-win: ``spark.python.worker.reuse`` (default on) already
amortizes the imports — the worker pid is stable across jobs, so
after the first task per worker nobody imports anything, while
forking from the fatter preimported daemon taxes every later fork.
The real per-job Arrow overhead (~0.1-0.2 s) sits in
driver-submit -> worker-entry (task launch + runner protocol), with
in-worker consumption at microseconds — a Spark-internal per-task
cost no daemon change reaches. Kept (unwired) so the experiment is
reproducible; enable manually with
``spark.python.daemon.module=solarpaneldatawrangler_spark.pydaemon``
only on deployments that measure a win (many short-lived workers,
``worker.reuse`` off, or reuse-defeating fan-out patterns).
"""

# Fail soft: a worker python without the scientific stack should run
# exactly like the stock daemon rather than refuse to start.
try:  # pragma: no cover - import side effects only
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
    # the serializer modules pyspark.worker pulls in on first Arrow
    # stage (these transitively import most of pyspark.sql)
    import pyspark.sql.pandas.serializers  # noqa: F401
    import pyspark.sql.pandas.types  # noqa: F401
except Exception:  # noqa: BLE001
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
