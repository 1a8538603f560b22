"""PySpark-native analytics engine with the query/data-processing surface of
prxttyfaith/advanced-elb-logs-etl, rebuilt Spark-first.

The reference (``/root/reference/advanced_elb_logs_etl.py``) is a single
process pandas ETL; this package re-expresses every operator it contains as
lazy Spark DataFrame transformations so Catalyst/Tungsten handle optimization
and the same code scales from ``local[*]`` to a 1000-executor cluster:

- ``sources``    — scans/sinks (S1-S10): gzip text scan, lineage column,
                   parquet/CSV sinks, hive-partitioned writer, geo cache.
- ``operators``  — parse (P1-P9), features (P10-P15), sessionization and
                   rolling windows (W1-W7), geo enrichment joins (J1-J4),
                   report aggregations (A1-A8), plus the LLM-data-pipeline
                   extensions (dedup, similarity search, text analysis,
                   multimodal plumbing).
- ``functions``  — reusable Column-expression helpers (null-coding casts,
                   status bucketing, date parts, bot flag, UA pandas_udf).
- ``plans``      — full-pipeline composition (the ``main()`` equivalent).
- ``streaming``  — Structured Streaming variants (session_window, sliding
                   rolling counts) of the batch session operators.
"""

__version__ = "0.1.0"
