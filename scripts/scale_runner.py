"""Single scaling-measurement subprocess (launched by bench.py via taskset).

Runs the scaling job (rollup → tier chain → Gorilla-encode) at local[N] in
a FRESH process so the CPU-affinity mask set by taskset applies to the
whole tree — the JVM, its GC/shuffle threads, and the forked Python
(Arrow-kernel) workers. In-process measurement can't do this: a local[2]
session inside an unpinned process still burns extra cores on GC, netty,
and Python workers, silently inflating the low-parallelism baseline and
deflating the measured N→4N efficiency.

Prints one JSON line: {"secs": float, "rows": int}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    warm = "--warm" in sys.argv

    from bench import scale_job
    from tslib_spark.session import get_spark

    spark = get_spark(
        f"bench-scale-{cpus}",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(max(cpus, 4))},
    )
    if warm:
        scale_job(spark)  # JIT/codegen + page-fault warm-up in the fresh JVM
    # min-of-2: single measurements on this shared box carry ±20% co-tenant
    # noise; the min is the least-interfered sample
    (secs, rows) = min((scale_job(spark) for _ in range(2)), key=lambda t: t[0])
    spark.stop()
    print(json.dumps({"secs": secs, "rows": rows}))


if __name__ == "__main__":
    main()
