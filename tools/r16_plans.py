"""Dump .explain("formatted") for headline bench queries to plans/r16/.

Usage: python tools/r16_plans.py <suffix> [query ...]
  suffix: "before" or "after" — files land at plans/r16/<name>_<suffix>.txt

With R16_PLANS_PIN=none the session runs under pinStrategy=none (the
plan-inspection mode), so invocation-scoped checkpoints disappear and
the FULL dataflow appears in one tree — files land with an _inner
suffix. Outer plans (default) show `Scan ExistingRDD ...
localCheckpoint` at each pin boundary; the parquet work still happens,
exactly once, when that RDD materializes inside the same action.

Plans are captured WITHOUT executing the query (explain only), so this can
run alongside other work; timings come from bench.py, not from here.
Queries that materialize side artifacts on construction (incremental IVF
index build, SCD2 golds) still execute those builds — that's inherent to
calling the query fn.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from databricks_etl_pipelines_spark import catalog  # noqa: E402
from databricks_etl_pipelines_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r16",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r16-plans")
    spark.sparkContext.setLogLevel("ERROR")
    inner = os.environ.get("R16_PLANS_PIN") == "none"
    if inner:
        spark.conf.set("spark.databricks_etl.pinStrategy", "none")
        suffix = f"{suffix}_inner"
    catalog.load_all()
    for name in names:
        fn = catalog.QUERIES[name]
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            text = f"EXPLAIN FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        n_exch = text.count("Exchange")
        n_scan = text.count("Scan parquet")
        print(f"{name}: {n_exch} Exchange, {n_scan} parquet scans -> {path}")


if __name__ == "__main__":
    main()
