"""Kill/resume + memory-pressure proof for the PREP-CORPUS job chain
(round-5: filter -> near-dup dedup -> pack through the partitioned
writer), the prep-side analogue of scripts/job_pressure.py.

Input: the sf0.1 documents table replicated with SALTED vocabulary
(`read_documents_scaled(salt_vocab=True)`) — a per-replica word
bijection keeps every intra-replica n-gram relation exactly while
making cross-replica shingle sets disjoint, so every stage's row count
is EXACTLY linear in replication (the dedup stage cannot collapse
across replicas).  Expected counts come from an in-process 1x probe of
the same chain, not hand-maintained constants.

Protocol (mirrors job_pressure.py):
  1. probe the chain at replication 1 -> per-replica row counts;
  2. write the Rx salted input once;
  3. run `python -m raykg.job --prep` with a capped object store and
     kill -9 as soon as kept-stage manifests start landing;
  4. resume to completion; 5. skip-all re-run;
  6. assert per-table totals == R x probe and write the artifact.

Usage: python scripts/job_prep_pressure.py [--replication 512]
                                           [--object-store-gb 4.0]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from job_pressure import manifest_rows, spill_stats  # noqa: E402


def probe_per_replica(sf_dir: str) -> dict:
    """Run the chain once at replication 1 (salted) -> per-table rows."""
    import shutil

    import ray

    ray.init(address="local", num_cpus=16, include_dashboard=False,
             logging_level="ERROR")
    from raykg.job import build_prep_corpus
    from raykg.pipeline.transcripts import read_documents_scaled

    out = "/tmp/raykg_prep_probe"
    shutil.rmtree(out, ignore_errors=True)
    docs = read_documents_scaled(sf_dir, 1, salt_vocab=True)
    rep = build_prep_corpus(docs, out, num_partitions=32)
    ray.shutdown()
    return {k: v["rows"] for k, v in rep["tables"].items()}


def write_input(sf_dir: str, replication: int, path: str) -> int:
    import ray

    ray.init(address="local", num_cpus=16, include_dashboard=False,
             logging_level="ERROR")
    from raykg.pipeline.transcripts import read_documents_scaled

    ds = read_documents_scaled(sf_dir, replication, salt_vocab=True)
    ds.write_parquet(path)
    n = ray.data.read_parquet(path).count()
    ray.shutdown()
    return n


def manifests_done(out: str) -> int:
    return len(glob.glob(os.path.join(out, "*", "part=*", "manifest.json")))


def run_job(input_path: str, out: str, store_gb: float,
            kill_after: float | None, num_partitions: int):
    cmd = [
        sys.executable, "-m", "raykg.job", "--prep",
        "--input", input_path, "--out", out,
        "--num-partitions", str(num_partitions), "--num-cpus", "32",
        "--object-store-gb", str(store_gb),
    ]
    t0 = time.perf_counter()
    proc = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True)
    if kill_after is not None:
        deadline = t0 + kill_after
        while time.perf_counter() < deadline:
            n = manifests_done(out)
            if n >= num_partitions // 8:  # kept stage mid-write
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replication", type=int, default=512)
    ap.add_argument("--object-store-gb", type=float, default=4.0)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--num-partitions", type=int, default=512)
    ap.add_argument("--kill-after", type=float, default=900.0)
    ap.add_argument("--out", default="BENCH/job_prep512x_r05.json")
    args = ap.parse_args()

    work = "/tmp/raykg_prep_pressure"
    input_path = os.path.join(work, f"input_x{args.replication}")
    out_dir = os.path.join(work, f"out_x{args.replication}")
    subprocess.run(["rm", "-rf", out_dir], check=True)

    print("probing per-replica counts ...", flush=True)
    per_replica = probe_per_replica(args.sf)
    print("per replica:", per_replica, flush=True)

    if not os.path.isdir(input_path):
        print("writing input ...", flush=True)
        n_rows = write_input(args.sf, args.replication, input_path)
    else:
        import pyarrow.parquet as pq

        n_rows = sum(
            pq.read_metadata(p).num_rows
            for p in glob.glob(os.path.join(input_path, "*.parquet"))
        )
    size_mb = sum(
        os.path.getsize(p) for p in glob.glob(os.path.join(input_path, "*"))
    ) / 1e6
    print(f"input: {n_rows} docs, {size_mb:.0f} MB", flush=True)
    t_start = time.time()

    print("run 1 (kill -9 mid-write) ...", flush=True)
    r1, wall1 = run_job(input_path, out_dir, args.object_store_gb,
                        args.kill_after, args.num_partitions)
    done_after_kill = manifests_done(out_dir)
    print(f"manifests complete after kill: {done_after_kill}", flush=True)

    print("run 2 (resume) ...", flush=True)
    report2, wall2 = run_job(input_path, out_dir, args.object_store_gb,
                             None, args.num_partitions)
    spill2 = spill_stats(t_start)
    done_after_resume = manifests_done(out_dir)

    print("run 3 (skip-all) ...", flush=True)
    report3, wall3 = run_job(input_path, out_dir, args.object_store_gb,
                             None, args.num_partitions)

    expected = {k: v * args.replication for k, v in per_replica.items()}
    got = manifest_rows(out_dir)
    rows_ok = all(got.get(k) == v for k, v in expected.items())
    skip_rows_stable = report3.get("tables", {}) == report2.get("tables", {})

    artifact = {
        "harness": "scripts/job_prep_pressure.py",
        "chain": "filter -> ngram-jaccard dedup + components -> pack",
        "replication": args.replication,
        "input_docs": n_rows,
        "input_mb": round(size_mb, 1),
        "object_store_gb": args.object_store_gb,
        "num_partitions": args.num_partitions,
        "run1_killed_after_sec": r1.get("killed_after_sec"),
        "manifests_after_kill": done_after_kill,
        "resume_wall_sec": round(wall2, 1),
        "resume_report": report2,
        "manifests_after_resume": done_after_resume,
        "skip_all_wall_sec": round(wall3, 1),
        "skip_all_rows_stable": skip_rows_stable,
        "spill": spill2,
        "per_replica_probe": per_replica,
        "rows_expected_linear": expected,
        "rows_got": got,
        "rows_linear_in_replication": rows_ok,
        "docs_per_sec_resume_leg": round(n_rows / wall2, 1),
        "value": round(wall2, 1),
        "unit": "sec",
    }
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main()
