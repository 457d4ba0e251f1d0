"""Streaming exactly-once certification at scale: SIGKILL mid-micro-batch,
restart from the checkpoint, prove the final state equals an uninterrupted
twin run.

The BATCH path's durability claim is certified at 1M pages
(tools/bench_e2e_scale.py: kill mid-CC, resume, byte-equal). The STREAMING
path's claim — "a crash mid-batch leaves the previous state intact, and
the re-delivered batch anti-joins its records away (exactly-once table
state from at-least-once delivery)", incremental_er docstring — is proven
only by unit-scale pytest (test_incremental_er_resumes_across_restarts
restarts a FINISHED query; no test kills one mid-flight). This tool:

1. writes a deterministic 100k-page corpus as `n_files` parquet files
   (maxFilesPerTrigger=8 -> n_files/8 micro-batches);
2. run A (uninterrupted): incremental_er over the corpus to completion in
   a subprocess, one catalog + checkpoint;
3. run B: same input, fresh catalog + checkpoint, SIGKILLed the moment the
   2nd epoch's marker lands + a delay that parks the kill INSIDE batch 3
   (epoch tables half-written, marker not yet flipped), then relaunched
   with the same checkpoint — Structured Streaming's WAL retries the
   interrupted batch under the same batch id, process_batch's anti-join
   drops any records the killed attempt already committed;
4. verdict: killed-and-resumed catalog vs uninterrupted catalog — record
   sets, final cluster maps, and the UNION of per-epoch edge sets must be
   equal (epoch lists too: WAL replay reassigns identical batch ids).

Usage: python tools/bench_streaming_kill.py [n_pages] [n_files] [artifact]
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

REPO = "/root/repo"

RUNNER = """
import sys
sys.path.insert(0, "/root/repo")
from nlp_entity_linking_spark.conf import get_spark
from nlp_entity_linking_spark.plans import pipeline as P
from nlp_entity_linking_spark.streaming import stream_ops as ST

src, out, run_id, ckpt = sys.argv[1:5]
spark = get_spark(app_name="stream-kill-" + run_id, master="local[32]")
cfg = P.PipelineConfig(use_snb=False)
q = ST.incremental_er(
    spark, ST.read_pages_stream(spark, src), out, run_id,
    checkpoint_dir=ckpt, cfg=cfg,
)
q.awaitTermination(3600)
spark.stop()
print("RUNNER_DONE")
"""


def _launch(runner_path: str, src: str, out: str, run_id: str, ckpt: str):
    return subprocess.Popen(
        [sys.executable, runner_path, src, out, run_id, ckpt],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,
    )


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    artifact = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(REPO, "BENCH", "streaming_kill_r6.json")
    )

    sys.path.insert(0, REPO)
    from nlp_entity_linking_spark.conf import get_spark
    from nlp_entity_linking_spark.sources.catalog import Catalog
    from nlp_entity_linking_spark.sources.synthetic import gen_pages
    from nlp_entity_linking_spark.streaming import stream_ops as ST

    work = tempfile.mkdtemp(prefix="stream_kill_")
    src = os.path.join(work, "pages_in")
    runner_path = os.path.join(work, "runner.py")
    with open(runner_path, "w") as f:
        f.write(RUNNER)

    # stage input once (deterministic: seed 42 inside gen_pages)
    spark = get_spark(app_name="stream-kill-stage", master="local[32]")
    gen_pages(spark, n_pages)[0].repartition(n_files).write.parquet(src)
    spark.stop()

    # ---- run A: uninterrupted -------------------------------------------
    t0 = time.perf_counter()
    pa = _launch(runner_path, src, work, "full", os.path.join(work, "ck_full"))
    out_a, _ = pa.communicate(timeout=3600)
    wall_a = time.perf_counter() - t0
    if pa.returncode != 0 or "RUNNER_DONE" not in out_a:
        raise RuntimeError(f"run A failed rc={pa.returncode}")

    # ---- run B: SIGKILL inside batch 3 ----------------------------------
    commits = os.path.join(work, "killed", "_commits")

    def n_epochs() -> int:
        if not os.path.isdir(commits):
            return 0
        return sum(
            1
            for f in os.listdir(commits)
            if f.startswith("records_epoch_")
        )

    pb = _launch(runner_path, src, work, "killed", os.path.join(work, "ck_kill"))
    t1 = time.perf_counter()
    killed_at = None
    while pb.poll() is None:
        if n_epochs() >= 2:
            # epoch 2's marker just landed; batch 3 starts immediately in
            # the sequential foreachBatch loop — park the kill inside it
            time.sleep(5.0)
            killed_at = time.perf_counter() - t1
            os.killpg(pb.pid, signal.SIGKILL)
            break
        time.sleep(0.05)
    if killed_at is None:
        raise RuntimeError("run B finished before 2 epochs committed")
    pb.wait()
    epochs_at_kill = n_epochs()
    total_batches = (n_files + 7) // 8
    assert epochs_at_kill < total_batches, (
        f"kill landed after all {total_batches} batches — nothing interrupted"
    )

    # ---- run B resume: same checkpoint, same catalog ---------------------
    t2 = time.perf_counter()
    pr = _launch(runner_path, src, work, "killed", os.path.join(work, "ck_kill"))
    out_r, _ = pr.communicate(timeout=3600)
    resume_wall = time.perf_counter() - t2
    if pr.returncode != 0 or "RUNNER_DONE" not in out_r:
        raise RuntimeError(f"run B resume failed rc={pr.returncode}")

    # ---- verdict ---------------------------------------------------------
    spark = get_spark(app_name="stream-kill-verdict", master="local[32]")
    cat_a = Catalog(work, "full")
    cat_b = Catalog(work, "killed")
    ep_a = cat_a.committed_meta("epoch")["epochs"]
    ep_b = cat_b.committed_meta("epoch")["epochs"]
    rec_a = {r.record_id for r in ST.read_er_records(spark, work, "full").collect()}
    rec_b = {r.record_id for r in ST.read_er_records(spark, work, "killed").collect()}
    clu_a = {
        (r.record_id, r.cluster_id)
        for r in cat_a.read(spark, "clusters").collect()
    }
    clu_b = {
        (r.record_id, r.cluster_id)
        for r in cat_b.read(spark, "clusters").collect()
    }

    def edge_union(cat, eps):
        s = set()
        for e in eps:
            s |= {
                (r.id_a, r.id_b)
                for r in cat.read(spark, f"edges_epoch_{e}").collect()
            }
        return s

    edg_a = edge_union(cat_a, ep_a)
    edg_b = edge_union(cat_b, ep_b)
    spark.stop()

    result = {
        "n_pages": n_pages,
        "n_files": n_files,
        "micro_batches": total_batches,
        "uninterrupted_wall_sec": round(wall_a, 1),
        "killed_after_sec": round(killed_at, 1),
        "epochs_committed_at_kill": epochs_at_kill,
        "resume_wall_sec": round(resume_wall, 1),
        "epochs_equal": ep_a == ep_b,
        "records_equal": rec_a == rec_b,
        "n_records": [len(rec_a), len(rec_b)],
        "clusters_equal": clu_a == clu_b,
        "n_cluster_rows": [len(clu_a), len(clu_b)],
        "edge_union_equal": edg_a == edg_b,
        "n_edges": [len(edg_a), len(edg_b)],
    }
    print(json.dumps(result))
    with open(artifact, "w") as f:
        json.dump(result, f, indent=1)
    shutil.rmtree(work, ignore_errors=True)
    # the artifact records the verdicts, but a certification tool must also
    # FAIL when they are false — otherwise a future exactly-once regression
    # writes a false-flagged artifact without tripping any gate.
    bad = [k for k in ("epochs_equal", "records_equal", "clusters_equal",
                       "edge_union_equal") if not result[k]]
    if bad:
        raise SystemExit(f"EXACTLY-ONCE CERTIFICATION FAILED: {bad} are false")


if __name__ == "__main__":
    main()
