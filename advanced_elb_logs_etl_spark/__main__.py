"""CLI entry: run the full ELB ETL pipeline (the reference's `python
advanced_elb_logs_etl.py` equivalent).

    python -m advanced_elb_logs_etl_spark --input 'logs/*.gz' --output out/

Offline by default (geo enrichment uses only the cache); pass --live-geo to
fetch uncached IPs from ip-api.com with the reference's rate etiquette.
"""

from __future__ import annotations

import argparse

from .plans.pipeline import PipelineConfig, run_pipeline
from .session import get_spark


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="advanced_elb_logs_etl_spark")
    ap.add_argument("--input", required=True, nargs="+", help="ALB .gz paths/globs")
    ap.add_argument("--output", default="output", help="output directory")
    ap.add_argument("--geo-cache", default=None, help="geo cache parquet path")
    ap.add_argument("--live-geo", action="store_true",
                    help="fetch uncached IPs from ip-api.com (rate-limited)")
    ap.add_argument("--approx", action="store_true",
                    help="approximate distinct/median (100 TB mode)")
    args = ap.parse_args(argv)

    config = PipelineConfig(
        input_paths=args.input,
        output_dir=args.output,
        geo_cache_path=args.geo_cache or f"{args.output}/ip_geolocation_cache.parquet",
        exact_aggregates=not args.approx,
    )
    transport = None
    if args.live_geo:
        from .operators.geo import default_http_transport

        transport = default_http_transport()
    spark = get_spark(app_name="elb-etl")
    paths = run_pipeline(spark, config, transport=transport)
    for name, path in paths.items():
        print(f"{name}: {path}")
    spark.stop()


if __name__ == "__main__":
    main()
