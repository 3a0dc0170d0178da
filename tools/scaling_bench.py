"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real multi-node cluster exists in this sandbox, so per the task protocol
the N→4N executor criterion is evidenced by running the IDENTICAL
spark-submit job at local[8] and local[32] on the same deterministic input
(same seed + n → bit-identical clips) and reporting throughput at both plus
scaling efficiency = (rate_32 / rate_8) / 4.

Each job runs with --warmup so the measurement is steady-state validation
throughput (JVM/Python-worker startup excluded at both sizes alike).

Usage: python tools/scaling_bench.py [--n 131072] [--trials 2]
Appends a result table to BENCH/BASELINE.md and writes BENCH/scaling.json.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _submit(extra: list[str], cores: int) -> dict:
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
    cmd = [
        "spark-submit",
        "--driver-memory",
        mem,
        # pinned pre-touched heap: without it G1 heap uncommit + this
        # kernel's proactive reclaim cause fault storms (see session.py)
        "--driver-java-options",
        f"-Xms{mem} -XX:+AlwaysPreTouch",
        "--py-files",
        "/tmp/dps_bench.zip",
        os.path.join(REPO, "jobs", "validate_clips.py"),
        "--cores",
        str(cores),
        *extra,
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    last = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(last)


def write_input(n: int) -> str:
    """Materialize the synthetic clips+transcripts tables ONCE (untimed).

    The timed runs at both parallelism levels then SCAN the same parquet —
    the production shape (the engine validates an existing Iceberg table; it
    does not share a pipeline with a data generator), and it removes
    generator cost from the measured metric."""
    d = tempfile.mkdtemp(prefix="dps_scale_input_")
    res = _submit(["--n", str(n), "--output", d, "--write-input", d], cores=32)
    print(f"input materialized: {res}", file=sys.stderr)
    return d


def run_once(cores: int, n: int, input_dir: str) -> dict:
    out = tempfile.mkdtemp(prefix=f"dps_scale_{cores}_")
    return _submit(
        [
            "--n",
            str(n),
            "--output",
            out,
            "--partitions",
            "64",
            "--warmup",
            "--clips-path",
            f"{input_dir}/clips",
            "--transcripts-path",
            f"{input_dir}/transcripts",
        ],
        cores=cores,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()

    subprocess.run(
        f"cd {REPO} && rm -f /tmp/dps_bench.zip && zip -qr /tmp/dps_bench.zip data_profiler_spark",
        shell=True,
        check=True,
    )
    input_dir = write_input(args.n)
    results: dict[int, dict] = {}
    for cores in (8, 32):
        best = None
        for t in range(args.trials):
            res = run_once(cores, args.n, input_dir)
            print(f"local[{cores}] trial {t}: {res}", file=sys.stderr)
            if best is None or res["clips_per_sec"] > best["clips_per_sec"]:
                best = res
        results[cores] = best

    r8, r32 = results[8]["clips_per_sec"], results[32]["clips_per_sec"]
    eff = (r32 / r8) / 4 if r8 else 0.0
    summary = {
        "n_clips": args.n,
        "rate_local8": r8,
        "rate_local32": r32,
        "wall_local8_sec": results[8]["wall_sec"],
        "wall_local32_sec": results[32]["wall_sec"],
        "scaling_efficiency": round(eff, 3),
        "protocol": "identical spark-submit --py-files job, same seed/n input, "
        "--warmup steady-state, best of trials",
        "date": datetime.date.today().isoformat(),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(summary, f, indent=2)
    md = (
        f"\n## Scaling run {summary['date']} (n={args.n} clips)\n\n"
        f"| parallelism | clips/sec | wall sec |\n|---|---|---|\n"
        f"| local[8] (N) | {r8} | {results[8]['wall_sec']} |\n"
        f"| local[32] (4N) | {r32} | {results[32]['wall_sec']} |\n\n"
        f"**Scaling efficiency (rate32/rate8)/4 = {summary['scaling_efficiency']}**"
        f" (target ≥ 0.8, BASELINE.json north_rule).\n"
        f"Protocol: {summary['protocol']}.\n"
    )
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(md)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
