#!/usr/bin/env python
"""Capture .explain("formatted") output for named queries to
plans/<round>/<query>_<tag>.txt (optimization-round evidence).

Usage: [SPARK_GRAFT_PLANS_DIR=r09] python tools/capture_plans.py <tag> <query> [...]"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dea05_e2e_kafka_streaming_pipeline_spark import queries as registry
from dea05_e2e_kafka_streaming_pipeline_spark.session import get_spark


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_DIR", "r09"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    qs = registry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"# {name} -> {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
