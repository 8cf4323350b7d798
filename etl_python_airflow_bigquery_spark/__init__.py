"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference ETL estate (alopezgo/ETL-Python-Airflow-Bigquery).

Brand-new, Spark-first design: DataFrame/SQL plans optimized by Catalyst,
Structured Streaming for intraday refresh, Pandas UDFs only where built-in
operators can't express the semantics. See SURVEY.md for the blueprint.

Layout:
    session     SparkSession factory tuned for local[N] and cluster runs
    tables      testdata table loaders / view registration
    functions   scalar helpers shared by operators (clipping, trunc, ids)
    dims        small dimension builders (vip tiers, day-part blocks, brackets,
                calendars) — all broadcast-sized
    operators   reusable relational operators (interval joins, reshaping,
                cohorts, dedup, similarity, text stats, windows)
    sources     ingestion connectors (files, REST, JDBC) with retry
    sinks       partitioned/clustered writes, idempotent window refresh,
                merge upsert, exports, email/segment egress
    streaming   Structured Streaming ports of the intraday paths
    queries     the registry that backs __spark_entry__ (queries + oracles)
"""

from etl_python_airflow_bigquery_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
