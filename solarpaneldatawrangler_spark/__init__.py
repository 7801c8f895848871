"""spark-wrangler: a PySpark-native analytics engine with the query and
data-processing capabilities of brubsby/SolarPanelDataWrangler, rebuilt
from scratch as idiomatic DataFrame/SQL (see /root/repo/SURVEY.md).

Layout:
    session     SparkSession factory tuned for local[N] and cluster scale
    schemas     StructTypes for the reference data model (SURVEY.md §1.2)
    sources/    readers/sinks: parquet star schema, CSV, GeoJSON, JSONL, binary
    functions/  pure column-expression function layer (no UDFs): tile math,
                text analysis, vector math (SURVEY.md §2.8)
    operators/  composable DataFrame -> DataFrame transforms: relational,
                grid, clustering, spatial, dedup, similarity, multimodal
    plans/      the named query catalog exposed through __spark_entry__
    streaming/  incremental (availableNow) processing patterns
"""

__version__ = "0.1.0"
