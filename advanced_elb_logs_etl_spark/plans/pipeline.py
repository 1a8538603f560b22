"""Full-pipeline composition — the reference's main() (:395-444) as one lazy
DataFrame DAG with four write actions.

Stage order matches the reference exactly: scan -> parse -> geo-enrich ->
features -> session/rolling windows -> {cleaned logs, hourly agg, error
report, bot reports}. Between stages nothing materializes; Catalyst sees the
whole plan per sink and pushes filters/prunes columns across stage
boundaries (e.g. the error report's 4xx/5xx filter reaches the parquet scan
of a cached intermediate, or the text scan itself when not cached).

The one imperative step is the geo fetch (uncached IPs must be fetched
before the join) — identical to the reference's control flow (:422).

Caching stance: the parsed+enriched+featured frame feeds four sinks, so
``run_pipeline`` persists it once (MEMORY_AND_DISK) before fan-out —
otherwise each sink would re-parse the raw text. At 100 TB replace with a
checkpoint to parquet (cheaper than 4x re-parse, resilient to executor
loss); the `materialize=` knob chooses.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

from ..operators.features import add_features
from ..operators.geo import Transport, enrich_with_geolocation
from ..operators.parse import parse_alb_lines
from ..operators.reports import (
    write_bot_traffic_reports,
    write_cleaned_logs,
    write_error_report,
    write_hourly_aggregation,
)
from ..operators.sessions import add_session_features
from ..session import apply_runtime_confs
from ..sources.elb import read_alb_lines


@dataclass
class PipelineConfig:
    """Env-driven config, mirroring the reference's dotenv block (:18-29)."""

    input_paths: list[str] = field(default_factory=list)
    output_dir: str = "output"
    geo_cache_path: str = "output/ip_geolocation_cache.parquet"
    exact_aggregates: bool = True
    materialize: str = "persist"  # "persist" | "checkpoint_dir:<path>" | "none"

    @classmethod
    def from_env(cls) -> "PipelineConfig":
        out = os.environ.get("ELB_OUTPUT_DIR", "output")
        return cls(
            input_paths=[p for p in os.environ.get("ELB_INPUT_PATHS", "").split(",") if p],
            output_dir=out,
            geo_cache_path=os.environ.get(
                "ELB_GEO_CACHE_PATH", os.path.join(out, "ip_geolocation_cache.parquet")
            ),
        )


def build_final_frame(
    spark: SparkSession,
    input_paths: list[str],
    geo_cache_path: str,
    transport: Transport | None = None,
) -> DataFrame:
    """scan -> parse -> enrich -> features -> windows, fully lazy."""
    apply_runtime_confs(spark)
    raw = read_alb_lines(spark, input_paths)
    parsed = parse_alb_lines(raw)
    enriched = enrich_with_geolocation(spark, parsed, geo_cache_path, transport=transport)
    featured = add_features(enriched)
    return add_session_features(featured)


def run_pipeline(
    spark: SparkSession,
    config: PipelineConfig,
    transport: Transport | None = None,
) -> dict[str, str]:
    """Execute the four sinks (reference :428-438). Returns output paths."""
    final = build_final_frame(spark, config.input_paths, config.geo_cache_path, transport)

    if config.materialize == "persist":
        final = final.persist(StorageLevel.MEMORY_AND_DISK)
    elif config.materialize.startswith("checkpoint_dir:"):
        ckpt = config.materialize.split(":", 1)[1]
        final.write.mode("overwrite").parquet(ckpt)
        final = spark.read.parquet(ckpt)

    out = config.output_dir
    paths = {
        "cleaned_logs": os.path.join(out, "cleaned_logs"),
        "hourly_agg": os.path.join(out, "aggregated_stats", "hourly_traffic_by_geo"),
        "error_report": os.path.join(out, "reports", "error_summary_geo"),
        "bot_details": os.path.join(out, "reports", "bot_traffic_details"),
        "bot_summary": os.path.join(out, "reports", "bot_traffic_by_origin_summary"),
    }
    write_cleaned_logs(final, paths["cleaned_logs"])
    write_hourly_aggregation(final, paths["hourly_agg"], exact=config.exact_aggregates)
    write_error_report(final, paths["error_report"])
    write_bot_traffic_reports(final, paths["bot_details"], paths["bot_summary"])

    if config.materialize == "persist":
        final.unpersist()
    return paths
