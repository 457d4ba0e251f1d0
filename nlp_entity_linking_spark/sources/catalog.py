"""Catalog seam: atomic table commits + manifest, parquet-backed locally
(SURVEY.md §1.3, A5-A7).

The north star targets an Iceberg catalog; this sandbox has no Iceberg
runtime jar (verified: no iceberg/delta/hudi in the Spark jars, no network),
so the seam reproduces the two Iceberg semantics the north rule actually
depends on:

  * atomic visibility  — a stage output EXISTS iff its commit marker was
    fsync'd after the data write completed (write data -> write marker),
    mimicking Iceberg snapshot commit;
  * resume             — a run re-executes only stages whose marker is
    missing ("any failed run resumes from the last committed checkpoint").

Production deployment swaps `write`/`read` bodies for:

    spark.sql("CREATE TABLE IF NOT EXISTS cat.db.pages (...) USING iceberg")
    df.writeTo(f"cat.db.{name}").createOrReplace()
    spark.read.table(f"cat.db.{name}")

with spark.sql.catalog.cat=org.apache.iceberg.spark.SparkCatalog on the
cluster classpath; commit markers map onto Iceberg snapshots and resume
onto snapshot existence per stage table.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "run_id string, stage string, partition_file string, rows_out long, "
    "wall_ms long, committed_at string"
)


@dataclass
class Catalog:
    root: str
    run_id: str

    @property
    def base(self) -> str:
        return os.path.join(self.root, self.run_id)

    def _marker(self, name: str) -> str:
        return os.path.join(self.base, "_commits", f"{name}.json")

    def table_path(self, name: str) -> str:
        return os.path.join(self.base, name)

    def is_committed(self, name: str) -> bool:
        return os.path.exists(self._marker(name))

    def committed_meta(self, name: str) -> dict | None:
        if not self.is_committed(name):
            return None
        with open(self._marker(name)) as f:
            return json.load(f)

    def commit(self, name: str, meta: dict) -> None:
        os.makedirs(os.path.dirname(self._marker(name)), exist_ok=True)
        tmp = self._marker(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._marker(name))  # atomic rename = commit point

    def write(self, df: DataFrame, name: str, meta: dict | None = None) -> None:
        df.write.mode("overwrite").parquet(self.table_path(name))
        self.commit(name, {"name": name, "ts": time.time(), **(meta or {})})

    def write_alias(self, name: str, target: str) -> None:
        """Commit `name` as a pointer to an already-committed table —
        Iceberg-snapshot-pointer semantics: readers of a logical table name
        atomically flip to a new physical version, never overwriting a path
        that a live plan may still be reading (self-overwrite hazard in
        incremental/streaming updates)."""
        self.commit(name, {"alias_for": target, "ts": time.time()})

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        meta = self.committed_meta(name)
        if meta and meta.get("alias_for"):
            return self.read(spark, meta["alias_for"])
        return spark.read.parquet(self.table_path(name))

    # ------------------------------------------------------------------
    # staged execution with lineage
    # ------------------------------------------------------------------

    def stage(
        self,
        spark: SparkSession,
        name: str,
        build,
        resume: bool = False,
    ) -> DataFrame:
        """Run one pipeline stage with atomic commit + per-partition lineage.

        On resume, a committed stage is NOT recomputed — downstream reads
        the committed parquet (exactly-once table state from at-least-once
        execution). Returns the committed DataFrame (parquet-backed, so the
        logical plan is truncated at every stage boundary)."""
        if resume and self.is_committed(name):
            return self.read(spark, name)
        t0 = time.perf_counter()
        df = build()
        self.write(df, name)
        wall_ms = int((time.perf_counter() - t0) * 1000)
        out = self.read(spark, name)
        self._log_lineage(spark, name, out, wall_ms)
        return out

    def _log_lineage(
        self, spark: SparkSession, stage: str, committed: DataFrame, wall_ms: int
    ) -> None:
        """Per-partition lineage rows (SURVEY.md A6/D6): one row per
        committed parquet file with its row count + stage metrics."""
        rows = (
            committed.groupBy(
                F.input_file_name().alias("partition_file")
            )
            .agg(F.count("*").alias("rows_out"))
            .select(
                F.lit(self.run_id).alias("run_id"),
                F.lit(stage).alias("stage"),
                "partition_file",
                "rows_out",
                F.lit(wall_ms).alias("wall_ms"),
                F.lit(time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())).alias(
                    "committed_at"
                ),
            )
        )
        rows.write.mode("append").parquet(os.path.join(self.base, "lineage"))

    def read_lineage(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(LINEAGE_SCHEMA).parquet(
            os.path.join(self.base, "lineage")
        )
