"""Capture .explain("formatted") for named queries into plans/r15/.

Usage: python scripts/capture_plans.py before q1 q2 ...
       python scripts/capture_plans.py after  q1 q2 ...

Writes plans/r15/<query>_<tag>.txt. Plan construction only — no
execution — so it is safe to run alongside nothing else without
perturbing bench numbers.
"""
from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from mints_wind_data_ingestion_spark.plans import REGISTRY  # noqa: E402
from mints_wind_data_ingestion_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(HERE, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("windflow-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].build(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
