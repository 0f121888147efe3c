"""epicsarchiver_spark — a PySpark-native time-series analytics engine.

A brand-new engine with the query and data-processing capabilities of
newville/epicsarchiver (reference at /root/reference, cited by file:line in
docstrings), re-expressed on idiomatic Spark: DataFrame/SQL logical plans,
Catalyst optimization, Parquet columnar storage, Structured Streaming
ingest, and pandas-UDF escape hatches only where built-ins genuinely cannot
express the semantics (stateful deadtime/deadband compression).

Layout
------
- ``session``    : tuned SparkSession builder (AQE, shuffle partitions, UTC)
- ``catalog``    : table loaders over the driver test data + domain schemas
- ``functions``  : scalar/text/vector/hash function library (SURVEY §2.8)
- ``operators``  : batch read-side operators (SURVEY §2.1–2.7)
- ``streaming``  : stateful ingest compression + alert engine (SURVEY §2.9)
- ``sources``    : file-format parsers and sinks (SURVEY §2.1)
- ``plans``      : plan-inspection helpers (explain/pushdown assertions)
"""

__version__ = "0.1.0"
