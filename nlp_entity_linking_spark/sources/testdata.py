"""Loaders for the driver-provided read-only parquet testdata.

TESTDATA.md: tables ``region nation customer supplier part orders lineitem
events documents embeddings`` live at /root/testdata/sf{0.001,0.01,0.1}/.
Parquet carries its own schema; Catalyst pushes projections/filters into the
scan (verify with ``df.explain`` -> PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (columnar parquet scan)."""
    if name not in TABLES:
        raise ValueError(f"unknown testdata table {name!r}; one of {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
