"""Memory-pressure job proof (round-4 verdict item 3).

Runs ``python -m raykg.job`` at 512x replication of the sf0.1 corpus
(2.56M turns) with the plasma store capped, so the run exercises
object-store eviction + spill-to-disk — the mechanism a 100 TB run
lives on.  (The sandbox has 128 GiB of RAM; capping the store reaches
the same code paths as out-sizing it.)

Protocol:
  1. write the 512x transcripts input once (deterministic shifted ids);
  2. run the job and ``kill -9`` it mid-run;
  3. re-run: the resumable writer must complete ONLY the missing
     partitions;
  4. run a third time: everything skips;
  5. validate total rows == 4x the recorded 128x row counts
     (replication is linear in every table except concept_scores);
  6. record wall, rows/s, spill bytes (parsed from the session's raylet
     logs) into BENCH/job512x_r04.json.

Usage: python scripts/job_pressure.py [--replication 512]
                                      [--object-store-gb 2.0]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# per-replica row counts, derived from the recorded 128x run
# (BENCH/job128x_r03b.json) and a 32x run: mentions/edges are EXACTLY
# linear in replication; nodes are near-linear (18,172/replica ±
# a small shared tool/concept remainder deduped across replicas);
# concept_scores stays 6 rows at any replication
PER_REPLICA = {"mentions": 28_286, "edges": 18_548}
NODES_PER_REPLICA = 18_172


def write_input(sf_dir: str, replication: int, path: str) -> int:
    import ray

    ray.init(address="local", num_cpus=16, include_dashboard=False,
             logging_level="ERROR")
    from raykg.pipeline.transcripts import read_transcripts_scaled

    ds = read_transcripts_scaled(sf_dir, replication)
    ds.write_parquet(path)
    n = ray.data.read_parquet(path).count()
    ray.shutdown()
    return n


def spill_stats(since: float) -> dict:
    """Max cumulative spill volume from the raylet logs of EVERY Ray
    session started after ``since`` (wall time).  Each harness leg is its
    own session (and Ray's temp root varies: /tmp/ray or $RAY_TMPDIR/ray),
    so scraping only session_latest would read the no-spill skip-all leg
    and report 0 even when the kill/resume legs spilled tens of GiB."""
    best = {"spilled_mib": 0.0, "spilled_objects": 0, "restored_mib": 0.0}
    roots = ("/tmp/ray/session_*", "/tmp/ray/ray/session_*",
             os.path.join(os.environ.get("RAY_TMPDIR", "/tmp/ray"),
                          "ray", "session_*"))
    seen = set()
    for pat in roots:
        for s in glob.glob(pat):
            if s in seen or os.path.islink(s):
                continue
            seen.add(s)
            try:
                if os.path.getmtime(s) < since:
                    continue
            except OSError:
                continue
            for f in glob.glob(os.path.join(s, "logs", "raylet*.out")):
                try:
                    text = open(f, errors="replace").read()
                except OSError:
                    continue
                mib = obj = rest = 0.0
                for m in re.finditer(r"Spilled (\d+) MiB, (\d+) objects", text):
                    mib = max(mib, float(m.group(1)))
                    obj = max(obj, int(m.group(2)))
                for m in re.finditer(r"Restored (\d+) MiB", text):
                    rest = max(rest, float(m.group(1)))
                best["spilled_mib"] += mib
                best["spilled_objects"] += int(obj)
                best["restored_mib"] += rest
    return best


def run_job(input_path: str, out: str, store_gb: float, kill_after: float | None):
    cmd = [
        sys.executable, "-m", "raykg.job",
        "--input", input_path, "--out", out,
        "--num-partitions", "512", "--num-cpus", "32",
        "--object-store-gb", str(store_gb),
    ]
    t0 = time.perf_counter()
    proc = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True)
    if kill_after is not None:
        # adaptive kill: fire once manifests start landing (mid-write of
        # the first table) so the resume leg has genuinely partial state;
        # kill_after is the fallback deadline if none appear in time
        deadline = t0 + kill_after
        # poll FAST: a fast run can blow through the whole manifest window
        # between coarse polls (observed: 0 -> 1153 inside one 2 s sleep),
        # leaving the fallback to fire after the job already finished —
        # a completed run, not a mid-write kill
        while time.perf_counter() < deadline:
            n = manifests_done(out)
            if 32 <= n < 1000:
                break
            if n >= 1000:  # run already (nearly) done — kill now anyway
                break
            time.sleep(0.1)
        killed_at = time.perf_counter() - t0
        proc.send_signal(signal.SIGKILL)
        proc.wait()
        return {"killed_after_sec": round(killed_at, 1)}, killed_at
    out_text, _ = proc.communicate()
    wall = time.perf_counter() - t0
    report = {}
    for line in out_text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                report = json.loads(line)
            except json.JSONDecodeError:
                pass
    return report, wall


def manifests_done(out: str) -> int:
    return len(glob.glob(os.path.join(out, "*", "part=*", "manifest.json")))


def manifest_rows(out: str) -> dict:
    """Total rows per table summed over ALL completed partition manifests.

    This is the authoritative output count: the resume leg's own report
    only covers the partitions IT wrote (everything run 1 finished before
    the kill is skipped and thus absent from that report)."""
    totals: dict[str, int] = {}
    for m in glob.glob(os.path.join(out, "*", "part=*", "manifest.json")):
        table = os.path.basename(os.path.dirname(os.path.dirname(m)))
        with open(m) as f:
            totals[table] = totals.get(table, 0) + json.load(f).get("rows", 0)
    return totals


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replication", type=int, default=512)
    # 4 GB store: small enough that the 512x job MUST spill (the input's
    # working set is ~6 GB of blocks), large enough not to thrash — at
    # 2 GB the executor grinds to a backpressured crawl (~10x wall).
    ap.add_argument("--object-store-gb", type=float, default=4.0)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    # fallback only: the adaptive loop above kills as soon as the first
    # table's manifests start landing, so the kill is mid-write by
    # construction; 900 s covers a slow spilling run reaching that point
    ap.add_argument("--kill-after", type=float, default=900.0)
    ap.add_argument("--out", default="BENCH/job512x_r04.json")
    args = ap.parse_args()

    work = "/tmp/raykg_job_pressure"
    input_path = os.path.join(work, f"input_x{args.replication}")
    out_dir = os.path.join(work, f"out_x{args.replication}")
    subprocess.run(["rm", "-rf", out_dir], check=True)

    if not os.path.isdir(input_path):
        print("writing input ...", flush=True)
        n_rows = write_input(args.sf, args.replication, input_path)
    else:
        import pyarrow.parquet as pq
        n_rows = pq.ParquetDataset(input_path).read(columns=["turn_idx"]).num_rows
    size_mb = sum(
        os.path.getsize(p) for p in glob.glob(os.path.join(input_path, "*"))
    ) / 1e6
    print(f"input: {n_rows} turns, {size_mb:.0f} MB", flush=True)

    load_before = os.getloadavg()[0]
    print(f"loadavg before: {load_before:.2f}", flush=True)
    t_start = time.time()

    # run 1: kill mid-run (adaptive: as manifests start landing)
    print(f"run 1 (kill -9, fallback at {args.kill_after}s) ...", flush=True)
    r1, wall1 = run_job(input_path, out_dir, args.object_store_gb,
                        kill_after=args.kill_after)
    done_after_kill = manifests_done(out_dir)
    print(f"manifests complete after kill: {done_after_kill}", flush=True)

    # run 2: resume to completion
    print("run 2 (resume) ...", flush=True)
    report2, wall2 = run_job(input_path, out_dir, args.object_store_gb, None)
    spill2 = spill_stats(t_start)  # run 1 + resume legs (skip-all not run yet)
    done_after_resume = manifests_done(out_dir)

    # run 3: everything skips
    print("run 3 (skip-all) ...", flush=True)
    report3, wall3 = run_job(input_path, out_dir, args.object_store_gb, None)

    expected = {k: v * args.replication for k, v in PER_REPLICA.items()}
    # authoritative totals from the partition manifests (run 1's completed
    # partitions + run 2's) — report2 alone only counts what run 2 wrote
    all_rows = manifest_rows(out_dir)
    got = {k: all_rows.get(k) for k in ("mentions", "edges", "nodes")}
    n_nodes = got["nodes"] or 0
    rows_ok = (
        all(got[k] == expected[k] for k in expected)
        and 0 <= n_nodes - NODES_PER_REPLICA * args.replication <= 1000
    )
    total_rows = sum(v for v in got.values() if v) + all_rows.get(
        "concept_scores", 0
    )
    skip_all_zero = all(
        t.get("rows") == 0 and t.get("partitions") == 0
        for t in report3.get("tables", {}).values()
    )

    artifact = {
        "harness": "scripts/job_pressure.py",
        "replication": args.replication,
        "input_turns": n_rows,
        "input_mb": round(size_mb, 1),
        "object_store_gb": args.object_store_gb,
        "loadavg_before": round(load_before, 2),
        "run1_killed_after_sec": r1.get("killed_after_sec"),
        "manifests_after_kill": done_after_kill,
        "resume_wall_sec": round(wall2, 1),
        "resume_report": report2,
        "manifests_after_resume": done_after_resume,
        "skip_all_wall_sec": round(wall3, 1),
        "skip_all_wrote_nothing": skip_all_zero,
        "spill": spill2,
        "rows_expected_linear": expected,
        "nodes_expected_at_least": NODES_PER_REPLICA * args.replication,
        "rows_got": got,
        "rows_linear_in_replication": rows_ok,
        "total_output_rows": total_rows,
        "turns_per_sec_resume_leg": round(n_rows / wall2, 1),
        "rows_written_resume_leg": sum(
            t.get("rows") or 0 for t in report2.get("tables", {}).values()
        ),
        "value": round(wall2, 1),
        "unit": "sec",
    }
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main()
