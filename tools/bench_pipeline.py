"""Bench-scale run of the composed web pipeline (VERDICT r4 "Next #3"):
the same extract -> dedup -> rewrite -> PR/CC/LP/triangles composition
the toy pytest exercises, at the scale the individual queries are
benched (default 100k pages on local[32]), plus ONE kill-and-resume
demonstration through the pipeline path (not just the operator test).

Three sequenced subprocess runs (never two Spark sessions at once):
  A. uninterrupted run with durable checkpoints — the reference result
     and the per-stage walls for BENCH/;
  B. same run SIGKILLed once the PageRank _meta shows >=2 complete
     iterations (mid-iterative-stage by construction);
  C. run B's command again with --resume — must report
     pagerank.resumed_from >= 2 and finish.
The A-vs-C pagerank rank vectors are then compared in DuckDB (reads
both parquet outputs driver-side; no Spark session needed), expecting
max |diff| < 1e-12 — resume restores float64 state exactly, so only
summation-order noise remains.

Usage: python tools/bench_pipeline.py [SITES:PAGES_PER_SITE] [cpus]
Prints RUN_A / RUN_C summary lines, a KILL line, and a COMPARE line.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env(cpus: int) -> dict:
    env = dict(os.environ)
    # local stand-in for `spark-submit --py-files dist/rad_ecg_spark.zip`
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["PYSPARK_SUBMIT_ARGS"] = (
        f"--master local[{cpus}] --driver-memory 48g "
        f"--conf spark.sql.shuffle.partitions={cpus} "
        f"--conf spark.ui.showConsoleProgress=false pyspark-shell"
    )
    return env


def _cmd(pages_spec: str, out: str, ck: str, resume: bool) -> list[str]:
    cmd = [
        sys.executable, os.path.join(REPO, "jobs", "run_web_pipeline.py"),
        "--synth-pages", pages_spec, "--out", out,
        "--checkpoint-dir", ck, "--verify-extract",
    ]
    if resume:
        cmd.append("--resume")
    return cmd


def run_full(pages_spec: str, out: str, ck: str, cpus: int, resume: bool) -> dict:
    p = subprocess.run(
        _cmd(pages_spec, out, ck, resume), capture_output=True, text=True,
        cwd=REPO, env=_env(cpus), timeout=5400,
    )
    lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
    if p.returncode != 0 or not lines:
        raise RuntimeError(
            f"pipeline run failed rc={p.returncode}\n"
            f"{p.stdout[-1500:]}\n{p.stderr[-1500:]}"
        )
    return json.loads(lines[-1])


def run_and_kill(pages_spec: str, out: str, ck: str, cpus: int,
                 min_iters: int = 2, timeout_s: float = 3600.0) -> int:
    """Start the pipeline, SIGKILL it once >= min_iters PageRank
    checkpoints have landed; returns the last complete iteration seen."""
    meta_dir = os.path.join(ck, "pagerank", "_meta")
    p = subprocess.Popen(
        _cmd(pages_spec, out, ck, resume=False),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        cwd=REPO, env=_env(cpus), start_new_session=True,
    )
    t0 = time.monotonic()
    try:
        while time.monotonic() - t0 < timeout_s:
            if p.poll() is not None:
                raise RuntimeError(
                    f"pipeline finished (rc={p.returncode}) before the kill "
                    f"landed — raise min_iters polling speed or corpus size"
                )
            metas = (
                [f for f in os.listdir(meta_dir) if f.endswith(".parquet")]
                if os.path.isdir(meta_dir) else []
            )
            if len(metas) >= min_iters:
                os.killpg(p.pid, signal.SIGKILL)
                p.wait()
                return len(metas)
            time.sleep(0.05)
        raise RuntimeError("kill window timed out")
    finally:
        if p.poll() is None:
            os.killpg(p.pid, signal.SIGKILL)
            p.wait()


def compare_ranks(out_a: str, out_c: str) -> dict:
    import duckdb

    row = duckdb.sql(
        f"""
        SELECT count(*) AS n, max(abs(a.rank - c.rank)) AS maxdiff
        FROM read_parquet('{out_a}/pagerank/*.parquet') a
        JOIN read_parquet('{out_c}/pagerank/*.parquet') c USING (id)
        """
    ).fetchone()
    only = duckdb.sql(
        f"""
        SELECT count(*) FROM read_parquet('{out_a}/pagerank/*.parquet') a
        ANTI JOIN read_parquet('{out_c}/pagerank/*.parquet') c USING (id)
        """
    ).fetchone()[0]
    return {"vertices_joined": row[0], "max_abs_rank_diff": row[1],
            "vertices_only_in_A": only}


def main() -> None:
    pages_spec = sys.argv[1] if len(sys.argv) > 1 else "2000:50"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    with tempfile.TemporaryDirectory(prefix="pipe_bench_") as td:
        out_a, ck_a = os.path.join(td, "outA"), os.path.join(td, "ckA")
        out_c, ck_c = os.path.join(td, "outC"), os.path.join(td, "ckC")

        t0 = time.monotonic()
        summary_a = run_full(pages_spec, out_a, ck_a, cpus, resume=False)
        print("RUN_A " + json.dumps(summary_a), flush=True)
        print(f"RUN_A_WALL {round(time.monotonic() - t0, 1)}", flush=True)

        seen = run_and_kill(pages_spec, out_c, ck_c, cpus)
        print("KILL " + json.dumps({"complete_iters_at_kill": seen}), flush=True)

        summary_c = run_full(pages_spec, out_c, ck_c, cpus, resume=True)
        print("RUN_C " + json.dumps(summary_c), flush=True)
        assert summary_c["pagerank"]["resumed_from"] is not None, (
            "resume must restart from a checkpoint"
        )

        print("COMPARE " + json.dumps(compare_ranks(out_a, out_c)), flush=True)


if __name__ == "__main__":
    main()
