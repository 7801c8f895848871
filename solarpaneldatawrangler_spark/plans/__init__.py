from solarpaneldatawrangler_spark.plans.catalog import CATALOG, QuerySpec, register

# Importing these modules populates CATALOG via @register side effects.
from solarpaneldatawrangler_spark.plans import relational_queries  # noqa: F401,E402
from solarpaneldatawrangler_spark.plans import relational_queries2  # noqa: F401,E402
from solarpaneldatawrangler_spark.plans import domain_queries  # noqa: F401,E402
from solarpaneldatawrangler_spark.plans import extension_queries  # noqa: F401,E402
from solarpaneldatawrangler_spark.plans import extension_queries2  # noqa: F401,E402

__all__ = ["CATALOG", "QuerySpec", "register"]
