"""The /verify drive recipe as a script: exercise the public API end-to-end
on a real SparkSession (tier chain + bit-exact partition-invariance gate +
driver entry), so any commit can cheaply re-run the skill's recipe."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tslib_spark.session import get_spark  # noqa: E402
from tslib_spark.datagen import generate_pages  # noqa: E402
from tslib_spark.operators import rollup_pages, tier_chain  # noqa: E402
from tslib_spark.operators.downsample import tier_state_checksum  # noqa: E402


def main() -> int:
    spark = get_spark("verify-drive", master="local[8]")
    pages = generate_pages(spark, n_events=100_000, n_urls=500)
    tiers = tier_chain(rollup_pages(pages), ["url", "lang"])
    counts = {t: df.count() for t, df in tiers.items()}
    print(counts)
    assert counts["minute"] > counts["hour"] > counts["day"] > counts["week"] > 0
    a = tier_state_checksum(
        tier_chain(rollup_pages(pages).repartition(1), ["url", "lang"])["week"], ["url", "lang"]
    )
    b = tier_state_checksum(
        tier_chain(rollup_pages(pages).repartition(64), ["url", "lang"])["week"], ["url", "lang"]
    )
    assert a == b, "tier parity broken"
    import __spark_entry__ as em

    df = em.entry(spark)
    n = df.count()
    print("entry:", n, df.schema.simpleString())
    assert n >= 0
    spark.stop()
    print("verify-drive OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
