"""Stress the connected-components loop well past pipeline scale.

The driver bench's CC stage runs sub-second because planted ER clusters are
tiny; this tool builds a 10^7-edge graph mixing the two adversarial shapes:

* CHAINS of length L — the O(diameter) killer for naive label propagation;
  alternating large-star/small-star must close them in O(log L) rounds
  (Kiveris et al., SoCC'14).
* STARS of size L — wide components exercising the groupBy-min skew path.

Reports iteration count (the O(log n) claim: expect ~log2(L) + small
constant, NOT ~L), wall time, and labels-correctness spot checks (every
chain/star collapses to its min node id; component count exact).

Usage: python tools/bench_cc.py [total_edges] [chain_len]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    total_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    from pyspark.sql import functions as F

    from nlp_entity_linking_spark.conf import get_spark
    from nlp_entity_linking_spark.operators.cc import connected_components

    spark = get_spark(app_name="bench_cc")

    half = total_edges // 2
    # chains over node ids [0, half): edges (i, i+1) within each block of L
    chains = (
        spark.range(half)
        .filter(F.pmod("id", F.lit(L)) != L - 1)
        .select(F.col("id").alias("u"), (F.col("id") + 1).alias("v"))
    )
    # stars over node ids [half, 2*half): hub = block start, spokes direct
    stars = (
        spark.range(half, 2 * half)
        .filter(F.pmod("id", F.lit(L)) != 0)
        .select(
            ((F.col("id") / L).cast("long") * L).alias("u"),
            F.col("id").alias("v"),
        )
    )
    edges = chains.unionByName(stars).persist()
    n_edges = edges.count()
    # components = global L-blocks over [0, 2*half): every node connects to
    # its block start (the block straddling the chain/star boundary fuses
    # both halves into ONE component, so count blocks, not regions)
    n_components = -(-2 * half // L)

    iters = []

    def on_iteration(i, df):
        iters.append(i)
        return df

    t0 = time.perf_counter()
    labels = connected_components(edges, max_iter=30, on_iteration=on_iteration)
    labels = labels.persist()
    n_labeled = labels.count()
    wall = time.perf_counter() - t0

    got_components = labels.select("cluster_id").distinct().count()
    # every component's label is its min node id = the block start
    bad = labels.filter(
        F.col("cluster_id") != (F.col("record_id") / L).cast("long") * L
    ).count()
    n_iter = len(iters)
    import math

    result = {
        "n_edges": n_edges,
        "chain_len": L,
        "n_components_expected": n_components,
        "n_components_got": got_components,
        "n_nodes_labeled": n_labeled,
        "bad_labels": bad,
        "iterations": n_iter,
        "log2_chain_len": round(math.log2(L), 1),
        "wall_sec": round(wall, 1),
        "sec_per_iteration": round(wall / max(n_iter, 1), 1),
    }
    print(json.dumps(result))
    assert bad == 0 and got_components == n_components
    assert n_iter <= math.log2(L) + 6, f"not O(log n): {n_iter} iterations"
    spark.stop()


if __name__ == "__main__":
    main()
