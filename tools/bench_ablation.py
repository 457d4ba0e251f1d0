"""Per-feature calibration ablation at bench scale (VERDICT r4 item #4).

The sf0.1 end-to-end fit measured a NEGATIVE Jaro-Winkler weight
(w = (-0.957, 3.566, 17.204)): after tsl + cos, jw is anti-predictive on
this corpus. This tool quantifies what each feature buys at the fitted
operating point by refitting the calibration on feature subsets over the
SAME labeled sample and re-running cluster-level threshold selection +
F1 for each:

  all      — jw + tsl + cos (the full model; auto-drop disabled here so
             the measured negative w1 is visible)
  tsl+cos  — the jw-free model (w1 pinned to exactly 0.0 -> score_pairs
             takes the pure-JVM fast path; no Arrow crossing at all)
  jw-only  — jw alone (how much signal the Python feature carries by
             itself)

Each variant also times its scoring pass (min of k repeats; shared-host
interference only ever adds time) so the wall saved by dropping the
Arrow crossing is measured, not asserted.

  python tools/bench_ablation.py [--n-pages 100000] [--cpus 32] [--k 2]

One JSON line on stdout; paste the table into README.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = (
    ("all", ("jw", "tsl", "cos")),
    ("tsl+cos", ("tsl", "cos")),
    ("jw-only", ("jw",)),
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=100_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--k", type=int, default=2, help="scoring-wall repeats")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from nlp_entity_linking_spark.conf import get_spark
    from nlp_entity_linking_spark.functions import similarity as S
    from nlp_entity_linking_spark.operators.evaluate import gen_labeled_pairs
    from nlp_entity_linking_spark.plans import pipeline as P
    from nlp_entity_linking_spark.sources.synthetic import gen_pages

    spark = get_spark(app_name="bench-ablation", master=f"local[{args.cpus}]")
    cfg = P.PipelineConfig()
    pages, gold = gen_pages(spark, args.n_pages)
    records = P.build_records(pages, cfg).persist()
    pairs = P.build_candidate_pairs(records, cfg).persist()
    n_pairs = pairs.count()
    feats = (
        P.build_features(records, pairs, cfg)
        .repartition(2 * args.cpus)
        .persist()
    )
    feats.count()
    rg = records.join(gold, "url").select("record_id", "entity_id")
    labeled = gen_labeled_pairs(pairs, rg).persist()
    labeled.count()

    # one labeled sample, scored once with the default model to materialize
    # jw, shared by every fit — variants differ only in the feature subset.
    lf = feats.join(
        labeled.select("id_a", "id_b", "is_match"), ["id_a", "id_b"]
    )
    lf = P.bounded_labeled_sample(lf, P.CALIBRATION_SAMPLE_CAP)
    sample = (
        S.score_pairs(lf, cfg.model)
        .select("jw", "tsl", "cos", "is_match")
        .toPandas()
    )

    out: dict = {
        "n_pages": args.n_pages,
        "n_candidate_pairs": n_pairs,
        "n_labeled_sample": len(sample),
        "master": f"local[{args.cpus}]",
        "variants": {},
    }
    for name, feat_subset in VARIANTS:
        model, thr0 = S.fit_calibration(sample, features=feat_subset)
        vcfg = P.PipelineConfig(model=model, score_threshold=thr0)
        walls = []
        scored = None
        for _ in range(args.k):
            if scored is not None:
                scored.unpersist(blocking=True)
            scored = S.score_pairs(feats, model).persist()
            t0 = time.perf_counter()
            scored.count()
            walls.append(round(time.perf_counter() - t0, 3))
        thr, metrics = P.select_threshold(scored, records, labeled, vcfg)
        out["variants"][name] = {
            "weights": [round(w, 4) for w in model.weights],
            "bias": round(model.bias, 4),
            "version": model.version,
            "threshold": thr,
            "f1": round(metrics["f1"], 5),
            "precision": round(metrics["precision"], 5),
            "recall": round(metrics["recall"], 5),
            "score_wall_s": min(walls),
            "score_walls": walls,
            "jvm_only_scoring": model.weights[0] == 0.0,
        }
        scored.unpersist(blocking=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
