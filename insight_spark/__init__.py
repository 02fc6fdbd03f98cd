"""insight_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
``itzbhushan/insight`` reference (a Spark+Pulsar+Elasticsearch text
search/suggestion pipeline; see SURVEY.md §0-§2 for the full capability
contract).  Everything here is declarative DataFrame/SQL so Catalyst +
Tungsten + AQE pick the physical strategy; Python UDFs appear only where
built-in operators genuinely cannot express the semantics (SURVEY.md §4.3).

Layout
------
- ``engine``      session builder + config contract (SURVEY.md §7.2)
- ``sources``     readers (parquet incl. ns-ts repair, csv, json, memory),
                  sinks (parquet, search-index emulation, jdbc stand-in)
- ``operators``   relational / window / text / similarity / dedup /
                  multimodal / partitioning operators
- ``pipelines``   end-to-end job compositions (the reference's ETL jobs)
- ``streaming``   Structured Streaming forms of the K-ops
- ``queries``     the declared query registry backing ``__spark_entry__``
"""

from insight_spark.engine import get_spark, session_builder

__all__ = ["get_spark", "session_builder"]
__version__ = "0.1.0"
