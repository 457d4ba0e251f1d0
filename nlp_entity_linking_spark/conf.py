"""SparkSession construction with the explicit tuning the north rule demands.

BASELINE.json north_rule: "repartitioning, AQE skew handling, and broadcast
thresholds tuned explicitly rather than defaulted". Every knob below is set
on purpose; `get_spark` is the single session factory used by main.py,
bench.py, tests and the driver entry.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

# Explicit tuning (SURVEY.md §4.2). These are the *local-mode* values; the
# cluster deployment section in README.md documents how they scale with
# executors (shuffle partitions ~ 2-3x total cores, broadcast threshold by
# driver memory).
DEFAULT_CONF: dict[str, str] = {
    # local mode = single JVM: driver memory is the only heap knob that
    # matters (container has 128 GiB). Must be set before JVM launch —
    # which means these two entries only take effect when the session is
    # created FROM PYTHON (python main.py / pytest / bench.py: py4j
    # launches the JVM after the builder runs). Under spark-submit the
    # driver JVM is already up, both are silently ignored, and the job
    # runs on the 1g default — pass `--driver-memory` (and
    # `--conf spark.driver.extraJavaOptions=...`) on the spark-submit
    # line for any input beyond toy scale (README launch form;
    # tools/bench_e2e_scale.py does this).
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "96g"),
    # pin the initial heap: growing a heap from the ~1g default under 32
    # allocating task threads causes GCLocker retry stalls in the Arrow
    # (native <-> JVM) path — first jobs run 3-5x slow until the heap grows.
    "spark.driver.extraJavaOptions": "-Xms32g -XX:+UseG1GC",
    "spark.driver.maxResultSize": "4g",
    # shuffle width ~ cores for local mode; cluster: 2-3x total cores.
    "spark.sql.shuffle.partitions": str(os.cpu_count() or 8),
    # explicit broadcast threshold (64 MiB): dimension tables / IDF maps /
    # hot-key sets are broadcast; candidate-pair fact tables never are.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # AQE: runtime coalescing + skew-join splitting as the *second* line of
    # defense behind explicit hot-key salting (operators/blocking.py).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(64 * 1024 * 1024),
    # Arrow boundary: every Python crossing is a columnar batch. Batch size
    # capped so wide binary (html) rows don't blow the Python worker heap.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Determinism: timestamps pinned to UTC so duckdb-oracle comparison and
    # cross-run hashes are stable.
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
}


def get_spark(
    app_name: str = "nlp_entity_linking_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    master precedence: explicit arg > $SPARK_GRAFT_MASTER >
    local[$SPARK_GRAFT_CPUS] > local[*].
    """
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Reliable checkpoint dir for the iterative connected-components loop
    # (plan-lineage truncation; SURVEY.md §4.2 "iterative-plan blowup").
    if not spark.sparkContext.getCheckpointDir():
        spark.sparkContext.setCheckpointDir(
            tempfile.mkdtemp(prefix="erlink_ckpt_")
        )
    return spark
