#!/usr/bin/env python
"""Capture `.explain("formatted")` for named catalog queries into
plans/r15/<query>_<suffix>.txt — the optimization round's before/after
plan evidence (the judge checks plan claims against these files).

Usage: python tools/r15_explains.py <suffix> <query> [<query> ...]
       [--sf-dir DIR | --sf-dir=DIR]   (default /root/testdata/sf0.1)

Note: building a query frame executes any EAGER stages inside it
(localCheckpoint-based iterative operators), so the captured plan is the
final frame's plan over materialized checkpoints — exactly what the
timed action executes.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from advanced_elb_logs_etl_spark.plans.catalog import (  # noqa: E402
    CATALOG,
    PRODUCTION_FORMS,
)
from advanced_elb_logs_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("suffix")
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    out_dir = os.path.join(REPO, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"r15-explains-{args.suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    for name in args.names:
        fn = PRODUCTION_FORMS.get(name) or CATALOG[name][0]
        df = fn(spark, args.sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(
                f"# {name} — explain('formatted') at {args.sf_dir}"
                f" ({args.suffix})\n"
            )
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
