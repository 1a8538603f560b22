"""Streaming ELB ingestion: the batch parse/feature stack applied to a file
stream — new .gz objects landing in a directory are parsed incrementally.

Because the whole parse/feature path is stateless Column expressions
(operators/parse.py, operators/features.py), it lifts onto Structured
Streaming unchanged — the same code object serves batch and streaming. Only
the session/rolling operators need the dedicated streaming forms in
streaming/sessions.py (they are stateful).

At scale this is the ALB delivery pattern: the load balancer drops a gz
object every 5 minutes per AZ; maxFilesPerTrigger bounds per-batch work and
the checkpoint directory gives exactly-once sink semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.features import add_features
from ..operators.parse import parse_alb_lines
from ..session import apply_runtime_confs


def read_alb_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 16,
    source_col: str = "log_source_file",
    ignore_corrupt_files: bool = True,
) -> DataFrame:
    """Streaming scan of ALB .gz drops in a directory (S1-S4, incremental).

    ignore_corrupt_files: the streaming file source does NOT honor the
    per-reader ignoreCorruptFiles option (verified: a truncated gz kills the
    query); only the SESSION conf applies, so enabling this changes the
    whole session's behavior (corrupt files in other reads are skipped too).
    Default True for reference parity (:169-171 skip-and-continue); pass
    False if the session must keep fail-fast semantics elsewhere."""
    apply_runtime_confs(spark)
    if ignore_corrupt_files:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    return (
        spark.readStream.option("pathGlobFilter", "*.gz")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .text(path)
        .withColumn(source_col, F.input_file_name())
    )


def parse_alb_stream(
    spark: SparkSession,
    path: str,
    eastern: bool = True,
    ignore_corrupt_files: bool = True,
) -> DataFrame:
    """Streaming parsed+featured frame: exactly the batch operators applied
    to a streaming source. Attach a writeStream sink (parquet + checkpoint
    in production; memory in tests) to run it."""
    raw = read_alb_stream(spark, path, ignore_corrupt_files=ignore_corrupt_files)
    parsed = parse_alb_lines(raw)
    return add_features(parsed, eastern=eastern)
