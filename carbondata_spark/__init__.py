"""carbondata_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference CarbonData system
(ravipesala/carbondata, pre-Apache era).

Architecture (see SURVEY.md §7): the reference is (a) a columnar storage
format whose benefits Parquet already provides, (b) a segment/manifest table
lifecycle, and (c) scan-pushdown machinery that stock Catalyst subsumes.
This package implements (b) natively in Python over Parquet + Spark, relies
on Spark/Parquet for (a) and (c), and adds large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
columns) as first-class DataFrame transforms.

Modules:
- ``session``   — tuned SparkSession builder (AQE, Arrow, shuffle sizing)
- ``store``     — CarbonStore: create/load/segments/compaction/retention
                  (reference: cubeSchema.scala:1678-2523, table_status.thrift)
- ``sources``   — CSV load-option parity incl. complex-type delimiters
                  (reference: CarbonSqlParser.scala:779-834)
- ``operators`` — dedup / similarity / text / multimodal operators
- ``functions`` — shared column-expression helpers
- ``plans``     — aggregate (rollup) tables + query rewrite
                  (reference: CarbonSqlParser.scala:182-224)
- ``streaming`` — Structured Streaming ingestion into the segment protocol
"""

from carbondata_spark.session import get_spark
from carbondata_spark.store import CarbonStore

__version__ = "0.1.0"

__all__ = ["get_spark", "CarbonStore", "__version__"]
