"""Per-query isolation bench (guide §1.4) — NOT the driver contract bench.

Times individual contract queries with the noop sink (min-of-k after one
warm-up) and optionally dumps .explain("formatted") to plans/r07/.

Usage:
  python bench_extra.py [--sf DIR] [--repeats K] [--plans TAG] [q1 q2 ...]

With --plans TAG, each query's formatted plan is written to
plans/r07/<query>_<TAG>.txt. Default queries: all; default sf dir:
$SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from tslib_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--plans", default=None, help="dump plans to plans/r07/<q>_<TAG>.txt")
    ap.add_argument("--out", default=None, help="append JSON line to this file")
    args = ap.parse_args()

    spark = get_spark("bench-extra")
    qs = entrymod.queries()
    names = args.queries or list(qs)
    unknown = sorted(set(names) - set(qs))
    if unknown:
        print(f"unknown queries: {unknown}")
        return 1

    results: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        if args.plans:
            os.makedirs("plans/r07", exist_ok=True)
            df = qs[name](spark, args.sf)
            with open(f"plans/r07/{name}_{args.plans}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        best = float("inf")
        for i in range(args.repeats + 1):  # +1 warm-up, not counted
            t0 = time.time()
            df = qs[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            secs = time.time() - t0
            if i > 0:
                best = min(best, secs)
            print(f"  {name} run{i}: {secs:.2f}s", file=sys.stderr)
        results[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
    line = json.dumps({"sf": args.sf, "repeats": args.repeats, "queries": results})
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
