"""E2E certification at 10x bench scale with a mid-CC kill/resume proof.

Every component is individually scale-certified (CC at 10^8 edges, ANN at
100k x 768, scaling efficiency at 300k records), but the COMPOSED stage
graph — records -> blocking -> features -> calibrate -> score -> edges ->
CC -> eval, with catalog commits between stages — needs its own
certification above bench scale, and the north rule's headline durability
claim (checkpointed resume) needs a proof at that scale too. This tool:

1. runs the full spark-submit launch form UNINTERRUPTED at `n_pages`
   (default 1,000,000 — 10x the per-round bench), recording per-stage
   walls from the committed lineage table, end-to-end wall, peak RSS of
   the whole process tree (driver JVM + Python workers), and F1;
2. runs the SAME job again under a different run id, SIGKILLs the entire
   process tree the moment the second CC iteration's commit marker lands
   (mid-loop, state half-written), relaunches with --resume, and proves
   the resumed output is BYTE-EQUAL to the uninterrupted run: identical
   clusters table, identical match-edge table, identical F1 — via DuckDB
   EXCEPT over the committed parquet (no Spark in the verdict path);
3. writes one JSON artifact (BENCH/e2e_1m_r6.json by default).

The synthetic corpus is deterministic (seed 42 inside gen_pages), so runs
A and B see byte-identical input without staging it.

Usage: python tools/bench_e2e_scale.py [n_pages] [out_root] [artifact]
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REPO = "/root/repo"
ZIP = os.path.join(REPO, "dist", "nlp_entity_linking_spark.zip")


def _tree_rss_bytes(sid: int) -> int:
    """Sum RSS over every process in session `sid` (driver JVM forks +
    Python workers all inherit the launch session)."""
    total = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                # comm (field 2) may contain spaces — split after the ')'
                rest = f.read().rsplit(")", 1)[1].split()
            if int(rest[3]) != sid:  # session id
                continue
            # statm field 1 = resident pages
            with open(f"/proc/{pid}/statm") as f:
                total += int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE")
        except (OSError, IndexError, ValueError):
            continue
    return total


def _launch(run_id: str, out_root: str, n_pages: int, resume: bool = False):
    # driver memory MUST be passed at spark-submit time: in spark-submit
    # mode the driver JVM is already up before conf.py's session builder
    # runs, so spark.driver.memory/extraJavaOptions set there are silently
    # ignored and the job runs on the 1g default — which is exactly how the
    # first 1M-page certification attempt died (24-minute GC-thrashed
    # records stage, then HashAggregate/broadcast OOMs in blocking).
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "96g")
    cmd = [
        "spark-submit",
        "--master",
        "local[32]",
        "--driver-memory",
        mem,
        "--conf",
        "spark.driver.extraJavaOptions=-Xms32g -XX:+UseG1GC",
        "--py-files",
        ZIP,
        os.path.join(REPO, "main.py"),
        "--n-pages",
        str(n_pages),
        "--run-id",
        run_id,
        "--out",
        out_root,
    ]
    if resume:
        cmd.append("--resume")
    return subprocess.Popen(
        cmd,
        cwd="/tmp",  # imports must come from the zip, not the repo
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,
    )


def _run_to_completion(run_id: str, out_root: str, n_pages: int, resume=False):
    """Run, polling tree RSS; return (summary dict, wall_sec, peak_rss)."""
    t0 = time.perf_counter()
    proc = _launch(run_id, out_root, n_pages, resume)
    peak = 0
    while proc.poll() is None:
        peak = max(peak, _tree_rss_bytes(proc.pid))
        time.sleep(0.5)
    wall = time.perf_counter() - t0
    out = proc.stdout.read()
    if proc.returncode != 0:
        raise RuntimeError(f"run {run_id} failed rc={proc.returncode}: {out[-2000:]}")
    summary = json.loads(out.strip().splitlines()[-1])
    return summary, wall, peak


def _stage_walls(out_root: str, run_id: str) -> dict:
    import duckdb

    path = os.path.join(out_root, run_id, "lineage", "*.parquet")
    rows = duckdb.sql(
        f"SELECT stage, max(wall_ms)/1000.0 AS sec FROM read_parquet('{path}') "
        "GROUP BY stage ORDER BY sec DESC"
    ).fetchall()
    return {s: round(sec, 3) for s, sec in rows}


def _tables_equal(a: str, b: str, cols: str) -> tuple[bool, int, int]:
    import duckdb

    na = duckdb.sql(f"SELECT count(*) FROM read_parquet('{a}/*.parquet')").fetchone()[0]
    nb = duckdb.sql(f"SELECT count(*) FROM read_parquet('{b}/*.parquet')").fetchone()[0]
    diff = duckdb.sql(
        f"SELECT count(*) FROM ("
        f"(SELECT {cols} FROM read_parquet('{a}/*.parquet') EXCEPT "
        f" SELECT {cols} FROM read_parquet('{b}/*.parquet')) UNION ALL "
        f"(SELECT {cols} FROM read_parquet('{b}/*.parquet') EXCEPT "
        f" SELECT {cols} FROM read_parquet('{a}/*.parquet')))"
    ).fetchone()[0]
    return diff == 0 and na == nb, na, nb


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/erlink_e2e_scale"
    artifact = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(REPO, "BENCH", "e2e_1m_r6.json")
    )
    subprocess.run(["bash", "scripts/package.sh"], cwd=REPO, check=True,
                   stdout=subprocess.DEVNULL)
    subprocess.run(["rm", "-rf", out_root], check=True)

    # ---- run A: uninterrupted -------------------------------------------
    print(f"run A (uninterrupted, {n_pages} pages) ...", flush=True)
    summary_a, wall_a, peak_a = _run_to_completion("full", out_root, n_pages)
    print(json.dumps({"run": "A", "wall_sec": round(wall_a, 1),
                      "peak_rss_gib": round(peak_a / 2**30, 2),
                      "f1": summary_a.get("eval", {}).get("f1")}), flush=True)

    # ---- run B: SIGKILL mid-CC, then resume ------------------------------
    print("run B (kill mid-CC) ...", flush=True)
    kill_marker = os.path.join(out_root, "killed", "_commits", "cc_iter_1.json")
    done_marker = os.path.join(out_root, "killed", "_commits", "clusters.json")
    proc = _launch("killed", out_root, n_pages)
    killed_at = None
    t0 = time.perf_counter()
    while proc.poll() is None:
        if os.path.exists(kill_marker):
            killed_at = time.perf_counter() - t0
            os.killpg(proc.pid, signal.SIGKILL)
            break
        time.sleep(0.05)
    if killed_at is None:
        raise RuntimeError(
            "run B finished before cc_iter_1 committed — kill point missed; "
            "raise n_pages or poll faster"
        )
    proc.wait()
    assert not os.path.exists(done_marker), "clusters committed despite kill"
    committed_iters = sorted(
        f for f in os.listdir(os.path.join(out_root, "killed", "_commits"))
        if f.startswith("cc_iter_")
    )
    print(json.dumps({"run": "B", "killed_after_sec": round(killed_at, 1),
                      "cc_iters_committed_at_kill": len(committed_iters)}),
          flush=True)

    print("run B resume ...", flush=True)
    summary_b, wall_b, peak_b = _run_to_completion(
        "killed", out_root, n_pages, resume=True
    )

    # ---- byte-equality verdict (DuckDB, no Spark) ------------------------
    clusters_eq, n_ca, n_cb = _tables_equal(
        os.path.join(out_root, "full", "clusters"),
        os.path.join(out_root, "killed", "clusters"),
        "record_id, cluster_id",
    )
    edges_eq, n_ea, n_eb = _tables_equal(
        os.path.join(out_root, "full", "match_edges"),
        os.path.join(out_root, "killed", "match_edges"),
        "id_a, id_b, score",
    )
    result = {
        "n_pages": n_pages,
        "master": "local[32]",
        "uninterrupted": {
            "wall_sec": round(wall_a, 1),
            "peak_rss_gib": round(peak_a / 2**30, 2),
            "stage_walls_sec": _stage_walls(out_root, "full"),
            "summary": summary_a,
        },
        "kill_resume": {
            "killed_after_sec": round(killed_at, 1),
            "cc_iters_committed_at_kill": len(committed_iters),
            "resume_wall_sec": round(wall_b, 1),
            "resume_peak_rss_gib": round(peak_b / 2**30, 2),
            "resume_summary": summary_b,
        },
        "byte_equal": {
            "clusters": clusters_eq,
            "clusters_rows": [n_ca, n_cb],
            "match_edges": edges_eq,
            "match_edges_rows": [n_ea, n_eb],
            "f1_equal": summary_a.get("eval") == summary_b.get("eval"),
        },
    }
    print(json.dumps(result))
    with open(artifact, "w") as fh:
        json.dump(result, fh, indent=1)
    if not (clusters_eq and edges_eq):
        raise SystemExit("BYTE-EQUALITY FAILED")


if __name__ == "__main__":
    main()
