"""Storage backends for TierStore: the catalog seam.

TierStore's behavior (idempotent partition materialization, checksums,
retention gating) is storage-agnostic; everything that actually touches
bytes goes through a backend with four operations:

    exists(spark, tier)              — does the tier table exist yet
    read(spark, tier)                — DataFrame over the stored tier
    write_partitions(spark, tier, df)— dynamic-overwrite the df's
                                       part_key partitions
    drop_partition(spark, tier, pk)  — physically remove one partition

``ParquetManifestBackend`` is the default and the only one exercisable in
this sandbox (no Iceberg runtime jar ships here): a parquet directory per
tier with hive-style ``part_key=`` partitions, plus TierStore's own
checkpoint manifest as the metadata layer (the Iceberg-snapshot stand-in,
SURVEY §1.3).

``IcebergBackend`` is the drop-in for a configured Iceberg catalog: the
same four operations expressed as ``spark.table`` / ``writeTo(...)
.overwritePartitions()`` / ``DELETE WHERE``. Its constructor *verifies*
the catalog is actually configured and fails with instructions otherwise
— the jar's absence must be a loud error, never silently-degraded
behavior. When the jar is available, swapping backends is the only
change; no TierStore logic moves.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class ParquetManifestBackend:
    """Hive-partitioned parquet directories under ``<root>/tiers/<tier>``."""

    def __init__(self, root: str | Path):
        self.root = Path(root)

    def table_path(self, tier: str) -> str:
        return str(self.root / "tiers" / tier)

    def exists(self, spark: SparkSession, tier: str) -> bool:
        return (self.root / "tiers" / tier).exists()

    def read(self, spark: SparkSession, tier: str) -> DataFrame:
        return spark.read.parquet(self.table_path(tier))

    def write_partitions(self, spark: SparkSession, tier: str, df: DataFrame) -> None:
        """Dynamic partition overwrite (TierStore sets the session conf):
        only the part_key values present in ``df`` are replaced."""
        df.write.mode("overwrite").partitionBy("part_key").parquet(
            self.table_path(tier)
        )

    def drop_partition(self, spark: SparkSession, tier: str, part_key: str) -> None:
        part_dir = Path(self.table_path(tier)) / f"part_key={part_key}"
        if part_dir.exists():
            shutil.rmtree(part_dir)


class IcebergBackend:
    """Iceberg-catalog tiers: ``<catalog>.<namespace>.tier_<tier>`` tables.

    Requires a configured Iceberg catalog (``spark.sql.catalog.<name>``
    set and the iceberg-spark-runtime jar on the classpath). This sandbox
    ships neither, so the constructor raising is the expected path here —
    the class documents exactly what the drop-in looks like and keeps the
    call sites honest (no pretend-Iceberg behavior behind the seam)."""

    def __init__(self, spark: SparkSession, catalog: str, namespace: str = "tslib"):
        try:
            impl = spark.conf.get(f"spark.sql.catalog.{catalog}")
        except Exception:
            impl = None
        if not impl:
            raise RuntimeError(
                f"Iceberg catalog {catalog!r} is not configured "
                f"(spark.sql.catalog.{catalog} unset). Add the "
                "iceberg-spark-runtime jar and catalog conf, or use the "
                "default ParquetManifestBackend."
            )
        self.catalog = catalog
        self.namespace = namespace

    def _table(self, tier: str) -> str:
        return f"{self.catalog}.{self.namespace}.tier_{tier}"

    def table_path(self, tier: str) -> str:
        return self._table(tier)

    def exists(self, spark: SparkSession, tier: str) -> bool:
        return spark.catalog.tableExists(self._table(tier))

    def read(self, spark: SparkSession, tier: str) -> DataFrame:
        return spark.table(self._table(tier))

    def write_partitions(self, spark: SparkSession, tier: str, df: DataFrame) -> None:
        name = self._table(tier)
        if not spark.catalog.tableExists(name):
            df.writeTo(name).partitionedBy("part_key").create()
        else:
            df.writeTo(name).overwritePartitions()

    def drop_partition(self, spark: SparkSession, tier: str, part_key: str) -> None:
        # parameter marker, not interpolation: part_key is internally a
        # YYYY-MM-DD string today, but a future caller passing arbitrary
        # keys must not be able to inject into the DELETE
        spark.sql(
            f"DELETE FROM {self._table(tier)} WHERE part_key = :pk",
            args={"pk": part_key},
        )
