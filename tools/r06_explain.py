"""Capture .explain('formatted') for bench queries into plans/r06/.

Usage: python tools/r06_explain.py <suffix> [query ...]
  suffix: 'before' or 'after' (file name suffix)
Writes plans/r06/<query>_<suffix>.txt for each query (default: all
BENCH_QUERIES).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]

    import bench as benchmod
    import __spark_entry__ as entrymod
    from simplecommoncrawlextractor_spark import get_spark

    spark = get_spark(app_name="r06-explain", master="local[4]", shuffle_partitions=32)
    queries = {**entrymod.queries(), **benchmod._extra_bench_queries()}
    names = only or benchmod.BENCH_QUERIES
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
