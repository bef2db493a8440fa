"""Capture .explain('formatted') for headline queries into
plans/r14/<query>_<tag>.txt (tag = before/after). Usage:

    python plans/r14/capture.py <tag> [query ...]

With no query names, captures every HEADLINE query. Plans are captured
WITHOUT executing the query (plan-only, like bench.py --fingerprints),
except queries whose fn() itself runs jobs (staging, streaming drains,
driver-bounded collects) — those still run that work, unavoidable.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from bench import HEADLINE  # noqa: E402
from providenciasbigdata_spark.queries import all_queries  # noqa: E402
from providenciasbigdata_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.dirname(os.path.abspath(__file__))
    spark = get_spark(app_name=f"plan-capture-{tag}")
    registry = all_queries()
    for name in names:
        fn, _sql = registry[name]
        try:
            df = fn(spark, sf_dir)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"ERROR capturing plan: {type(exc).__name__}: {exc}\n"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(txt)
        print(f"captured {name}_{tag}", flush=True)
        spark.catalog.clearCache()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()


if __name__ == "__main__":
    main()
