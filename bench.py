"""Headline benchmark. Prints ONE JSON line per the driver contract.

Workloads:
- crawl pipeline (the north-star path): synthesized pages parquet →
  1-minute rollup → hour/day/week tier chain → checksum (forces full
  materialization). Reports rolled-up points/sec, plus the SEPARATE
  rollup→Gorilla-compress points/sec (the two kinds of work never share
  one metric).
- contract queries on $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
- three-level scaling: the rollup→encode job at local[2]/[4]/[8] on the
  identical parquet input (sandbox proxy for N vs 4N executors,
  BASELINE.json north_rule) → median-ratio efficiency + a throughput-
  per-core regression slope.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
SPARK_GRAFT_BENCH_EVENTS (pages scale, default 4_000_000),
SPARK_GRAFT_SKIP_SCALING=1 to skip the second-parallelism run.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from tslib_spark.datagen.crawl import generate_pages  # noqa: E402
from tslib_spark.operators.downsample import tier_chain  # noqa: E402
from tslib_spark.operators.gapfill import densify_grid, interpolate_linear  # noqa: E402
from tslib_spark.operators.rollup import rollup_pages  # noqa: E402
from tslib_spark.session import get_spark  # noqa: E402

PAGES_PATH = "/tmp/tslib_spark_bench_pages"
KEYS = ["url", "lang"]


def ensure_pages(spark, n_events: int) -> None:
    marker = os.path.join(PAGES_PATH, "_SCALE")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == str(n_events):
                return
        shutil.rmtree(PAGES_PATH, ignore_errors=True)
    pages = generate_pages(spark, n_events=n_events, n_urls=20_000, n_minutes=60 * 24 * 21)
    pages.write.mode("overwrite").parquet(PAGES_PATH)
    with open(marker, "w") as f:
        f.write(str(n_events))


def crawl_pipeline(spark) -> tuple[float, int]:
    """read → rollup 1m → tier chain → force. Returns (seconds, minute-tier rows).

    The minute tier is persisted before deriving coarser tiers — exactly the
    continuous-aggregate shape (hour reads the materialized minute tier, not
    the raw events)."""
    t0 = time.time()
    pages = spark.read.parquet(PAGES_PATH)
    minute = rollup_pages(pages).persist()
    try:
        tiers = tier_chain(minute, KEYS)
        minute_rows = minute.count()
        for t in ("hour", "day", "week"):
            tiers[t].select(F.sum("cnt")).collect()
    finally:
        minute.unpersist()
    return time.time() - t0, minute_rows


def gapfill_bench(spark) -> float:
    t0 = time.time()
    pages = spark.read.parquet(PAGES_PATH)
    minute = rollup_pages(pages).persist()
    try:
        top = minute.join(
            F.broadcast(
                minute.groupBy("url").count().orderBy(F.desc("count")).limit(200).select("url")
            ),
            "url",
        )
        dense = densify_grid(top.select("url", "lang", "bucket_ts", "cnt"), KEYS, "bucket_ts")
        tidy = dense.select(
            "url", "lang",
            (F.unix_timestamp("bucket_ts") / 60).cast("long").alias("bucket_idx"),
            F.col("cnt").cast("double").alias("value"),
        )
        interpolate_linear(tidy, KEYS).select(F.sum("value")).collect()
    finally:
        minute.unpersist()
    return time.time() - t0


def impute_bench(spark, n_groups: int = 512) -> float:
    """Gap-fill + HSVT imputation over the top-N url hourly series — the
    kernel-heavy stage that dominates CPU in the full pipeline (and the
    part that must scale linearly across executors)."""
    from tslib_spark.kernels.svd_kernel import ModelConfig, fit_transform

    t0 = time.time()
    pages = spark.read.parquet(PAGES_PATH)
    hourly = rollup_pages(pages, "hour").persist()
    try:
        N, M = 24, 21  # 3 weeks of hourly buckets per series
        top = hourly.join(
            F.broadcast(
                hourly.groupBy("url").count().orderBy(F.desc("count"), "url")
                .limit(n_groups).select("url")
            ),
            "url",
        )
        dense = densify_grid(top.select("url", "bucket_ts", "cnt"), ["url"], "bucket_ts", step="1 hour")
        from pyspark.sql import Window

        w = Window.partitionBy("url").orderBy("bucket_ts")
        tidy = dense.select(
            F.col("url").alias("group_id"),
            F.lit("activity").alias("series_key"),
            (F.row_number().over(w) - 1).cast("long").alias("bucket_idx"),
            F.col("cnt").cast("double").alias("value"),
        ).filter(F.col("bucket_idx") < N * M)
        ok = tidy.groupBy("group_id").count().filter(F.col("count") >= N * M).select("group_id")
        tidy = tidy.join(ok, "group_id")
        cfg = ModelConfig(target_key="activity", N=N, M=M, k=4)
        fit_transform(tidy, cfg).filter("kind='imputed'").select(F.sum("value")).collect()
    finally:
        hourly.unpersist()
    return time.time() - t0


def scale_job(spark) -> tuple[float, int]:
    """The job for the N→4N scaling evidence: the north-star WRITE path —
    scan → 1-minute rollup → window-salted Gorilla encode — as ONE linear
    action. No cache and no extra driver actions: an in-memory persist is
    memory-bandwidth-bound (ratio ~1 across parallelism on one box) and
    every extra action adds fixed scheduling cost, both of which blur the
    compute-scaling signal the north rule asks about. The tier chain's
    wall-time is covered separately by crawl_pipeline."""
    from tslib_spark.codec.chunks import encode_chunks

    repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "1"))
    t0 = time.time()
    rows = 0
    for _ in range(repeats):
        pages = spark.read.parquet(PAGES_PATH)
        minute = rollup_pages(pages)
        tidy = minute.select(
            "url", "lang",
            (F.unix_timestamp("bucket_ts") / 60).cast("long").alias("bucket_idx"),
            F.col("cnt").cast("double").alias("value"),
        )
        r = encode_chunks(tidy, KEYS).select(
            F.sum(F.length("val_blob")).alias("bytes"),
            F.sum("n_points").alias("pts"),
        ).collect()[0]
        rows = int(r["pts"])
    return time.time() - t0, rows


def codec_bench(spark) -> dict[str, float]:
    """Gorilla read-path throughput: encode the minute tier once (forced to
    a parquet spill), then time the decode scan — the cost every tier read
    pays at 100× scale."""
    from tslib_spark.codec.chunks import decode_chunks, encode_chunks

    path = "/tmp/tslib_spark_bench_chunks"
    pages = spark.read.parquet(PAGES_PATH)
    tidy = rollup_pages(pages).select(
        "url", "lang",
        (F.unix_timestamp("bucket_ts") / 60).cast("long").alias("bucket_idx"),
        F.col("cnt").cast("double").alias("value"),
    )
    encode_chunks(tidy, KEYS).write.mode("overwrite").parquet(path)
    chunks = spark.read.parquet(path)

    def decode_pass() -> tuple[float, int]:
        t0 = time.time()
        n = int(
            decode_chunks(chunks, KEYS)
            .select(F.count(F.lit(1)).alias("n"))
            .collect()[0]["n"]
        )
        return time.time() - t0, n

    decode_pass()  # warm
    secs, pts = min((decode_pass() for _ in range(2)), key=lambda t: t[0])
    return {"decode_secs": round(secs, 3), "decode_points_per_sec": round(pts / secs, 1)}


def contract_queries(spark, sf_dir: str) -> dict[str, float]:
    names = [
        "rollup_minute", "downsample_hour", "downsample_week", "gapfill_interp",
        "rmse_hidden", "sessionize", "topk_users", "tpch_q1ish",
        "join_filter_project", "dedup_exact", "token_stats", "minhash_near_dup",
        "simhash_signatures", "ann_cosine_topk", "ivf_topk", "gorilla_roundtrip",
        "svd_impute", "svd_forecast", "cosine_near_dup", "doc_components",
        "pack_sequences", "hash_split", "substring_dups", "contamination",
        "quality_filter", "repetition_signals", "url_parse",
    ]
    qs = entrymod.queries()
    out = {}
    for name in names:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    return out


def _scaling(result: dict) -> None:
    """Pinned multi-level scaling protocol; writes result["scaling"].

    Three parallelism levels (default 2, 4, 8) well inside this box's
    cores (8→32 hits a memory-bandwidth/co-tenant ceiling ~0.62, see
    BENCH.md calibrations). On a real cluster N→4N executors are
    whole machines, matching the 2→8 shape; the extra middle level
    turns the single hi/lo ratio into a throughput-per-core
    regression, which one noisy leg can't fake.

    Each measurement runs in a FRESH taskset-pinned subprocess
    (scripts/scale_runner.py): pinning caps the JVM's GC/shuffle
    threads and the Python Arrow workers to exactly the advertised
    core budget — an unpinned local[2] silently uses extra cores and
    inflates the lo baseline (round-1's 0.719 artifact).
    """
    import statistics
    import subprocess

    lo_cpus = int(os.environ.get("SPARK_GRAFT_SCALE_LO", "2"))
    hi_cpus = int(os.environ.get("SPARK_GRAFT_SCALE_HI", str(lo_cpus * 4)))
    mid_cpus = int(os.environ.get("SPARK_GRAFT_SCALE_MID", str(lo_cpus * 2)))
    levels = sorted({lo_cpus, mid_cpus, hi_cpus})
    rounds = int(os.environ.get("SPARK_GRAFT_SCALE_PAIRS", "4"))
    here = os.path.dirname(os.path.abspath(__file__))

    # pin away from core 0 by default: host IRQ handling and daemons land
    # on the lowest cores, so a 2-core leg pinned to 0-1 eats interference
    # the 8-core leg amortizes — an asymmetric bias against the lo leg
    base = int(os.environ.get("SPARK_GRAFT_SCALE_CORE_BASE", "16"))

    def run_pinned(c: int) -> tuple[float, int, float]:
        cores = f"{base}-{base + c - 1}"
        cmd = [
            "taskset", "-c", cores, sys.executable,
            os.path.join(here, "scripts", "scale_runner.py"), str(c), "--warm",
        ]
        out = subprocess.run(cmd, capture_output=True, text=True, check=True)
        parsed = json.loads(out.stdout.strip().splitlines()[-1])
        return float(parsed["secs"]), int(parsed["rows"]), float(parsed.get("steal_frac", 0.0))

    # co-tenant load on this shared box drifts on minute scales, so the
    # levels are measured in interleaved rounds (hi→lo within a round).
    # HEADLINE = the median hi/lo ratio: noise on the lo leg of one
    # round *raises* that round's ratio, so max-over-rounds is an
    # upward-biased estimator — the best round is reported only as the
    # quietest-phase sample, never as the claim.
    secs: dict[int, list[float]] = {c: [] for c in levels}
    steals: dict[int, list[float]] = {c: [] for c in levels}
    job_rows = 0
    for _ in range(rounds):
        for c in sorted(levels, reverse=True):
            s, job_rows, st = run_pinned(c)
            secs[c].append(s)
            steals[c].append(st)
    ratios = sorted(l / h for l, h in zip(secs[lo_cpus], secs[hi_cpus]))
    speedup_med = statistics.median(ratios)
    best = {c: min(v) for c, v in secs.items()}
    # ratio-of-mins: co-tenant noise only ever ADDS time, so the per-level
    # min over interleaved rounds approximates the unloaded machine on
    # BOTH legs simultaneously — unlike max-over-round-ratios it cannot
    # be inflated by a noisy lo leg. Reported as the secondary statistic.
    speedup_mins = best[lo_cpus] / best[hi_cpus]
    # steal-clean statistic: the box's only noise source is HYPERVISOR CPU
    # steal (in-VM it idles), and scale_runner measures it per sample from
    # /proc/stat on the pinned cores. A pair is clean when BOTH legs lost
    # < 2% of their core-time to the host — those ratios estimate true
    # machine scaling with the contaminated samples excluded by evidence,
    # not by picking the flattering order statistic.
    clean_thresh = float(os.environ.get("SPARK_GRAFT_STEAL_CLEAN", "0.02"))
    clean_ratios = [
        l / h
        for l, h, sl, sh in zip(
            secs[lo_cpus], secs[hi_cpus], steals[lo_cpus], steals[hi_cpus]
        )
        if sl < clean_thresh and sh < clean_thresh
    ]
    speedup_clean = statistics.median(clean_ratios) if clean_ratios else None
    # throughput-per-core regression across the levels (quietest run
    # per level): OLS slope vs the ideal slope set by the lo level
    thr = {c: job_rows / best[c] for c in levels}
    xs = [float(c) for c in levels]
    ys = [thr[c] for c in levels]
    xbar, ybar = sum(xs) / len(xs), sum(ys) / len(ys)
    slope = sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / sum(
        (x - xbar) ** 2 for x in xs
    )
    ideal_per_core = thr[lo_cpus] / lo_cpus
    result["scaling"] = {
        "job": "scan -> 1-minute rollup -> window-salted Gorilla encode (one linear action)",
        "cpus": levels,
        "secs": {str(c): [round(s, 2) for s in secs[c]] for c in levels},
        "steal_frac": {str(c): [round(s, 4) for s in steals[c]] for c in levels},
        "points_per_sec": {str(c): round(thr[c], 1) for c in levels},
        "speedup": round(speedup_med, 3),
        "efficiency": round(speedup_med / (hi_cpus / lo_cpus), 3),
        "efficiency_steal_clean": (
            round(speedup_clean / (hi_cpus / lo_cpus), 3)
            if speedup_clean is not None else None
        ),
        "clean_pairs": len(clean_ratios),
        "efficiency_ratio_of_mins": round(speedup_mins / (hi_cpus / lo_cpus), 3),
        "efficiency_best_round": round(max(ratios) / (hi_cpus / lo_cpus), 3),
        "slope_points_per_core": round(slope, 1),
        "slope_ideal_fraction": round(slope / ideal_per_core, 3),
        "note": (
            "taskset-pinned fresh-JVM subprocesses per measurement; "
            "interleaved rounds across 3 parallelism levels; headline "
            "efficiency = MEDIAN lo/hi ratio over all rounds; "
            "efficiency_steal_clean = median over pairs where BOTH legs "
            "measured < 2% hypervisor CPU steal on their pinned cores "
            "(/proc/stat, the box's only noise source) — evidence-based "
            "exclusion, preferred when clean_pairs >= 2; ratio_of_mins "
            "and best_round are secondary bounds; slope_ideal_fraction = "
            "OLS throughput-per-core slope vs the lo-level ideal; see "
            "BENCH.md calibrations"
        ),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_events = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "3000000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    timings: dict[str, float] = {}
    # SPARK_GRAFT_SCALING_ONLY=1 skips the workload phase entirely — cheap
    # repeated runs of the pinned scaling protocol for BENCH.md calibration
    scaling_only = os.environ.get("SPARK_GRAFT_SCALING_ONLY") == "1"

    spark = get_spark("bench", master=f"local[{cpus}]")
    ensure_pages(spark, n_events)
    if scaling_only:
        spark.stop()
        result = {
            "metric": "scaling protocol only",
            "unit": "sec",
            "sf": sf,
            "queries": {},
            "bench_events": n_events,
        }
        _scaling(result)
        result["value"] = 0.0
        print(json.dumps(result))
        return

    # JIT/codegen warm-up dominates first executions (5s warm vs 20s+ cold
    # for the same plan) — warm the whole job mix once, then measure min-of-2.
    scale_job(spark)
    gapfill_bench(spark)
    crawl_secs, minute_rows = min(
        (crawl_pipeline(spark) for _ in range(2)), key=lambda t: t[0]
    )
    timings["crawl_rollup_tiers"] = round(crawl_secs, 3)
    # rollup+compress measured SEPARATELY from rollup+tier-chain so the
    # two kinds of work never share one points/sec number (round-2 lesson:
    # a single conflated metric made the trend unreadable across rounds)
    compress_secs, compress_pts = min(
        (scale_job(spark) for _ in range(2)), key=lambda t: t[0]
    )
    timings["crawl_rollup_compress"] = round(compress_secs, 3)
    timings["crawl_gapfill"] = round(min(gapfill_bench(spark) for _ in range(2)), 3)
    timings["crawl_impute_512"] = round(min(impute_bench(spark) for _ in range(2)), 3)
    timings.update(contract_queries(spark, sf_dir))
    codec = codec_bench(spark)
    points_per_sec = minute_rows / crawl_secs
    spark.stop()

    result = {
        "metric": "end-to-end seconds (crawl rollup->tiers + contract queries)",
        "unit": "sec",
        "sf": sf,
        "queries": timings,
        "minute_tier_rows": minute_rows,
        # rollup → hour/day/week tier chain, NO compression (r1-comparable)
        "rolled_points_per_sec": round(points_per_sec, 1),
        # rollup → window-salted Gorilla encode of the minute tier
        "rolled_compressed_points_per_sec": round(compress_pts / compress_secs, 1),
        "bench_events": n_events,
        "gorilla": codec,
    }

    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        _scaling(result)

    result["value"] = round(sum(timings.values()), 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
