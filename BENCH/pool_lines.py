#!/usr/bin/env python
"""Spark-free control for line_dedup's 2->8 scaling: the bare per-doc
string-reassembly work (split lines, trim, drop empties, rejoin) in a
plain multiprocessing pool over the SAME 2M-doc curate corpus, pinned
with taskset exactly like BENCH/scaling_ops.py.

Purpose: isolate whether line_dedup's below-bar 2->8 efficiency is an
engine/plan defect or host physics. The pool runs no Spark, no JVM, no
shuffle, no parquet writes — just CPython doing the identical string
transformations. If THIS scales at the same sub-0.8 efficiency, the
bound is the socket's shared resources (DRAM/LLC bandwidth for
string-heavy work), not the operator's plan — the same argument
BENCH/BASELINE.md makes for the extraction 8->32 pair with the bare
extraction kernel.

Protocol: parent loads the corpus texts once per level (outside the
timed region), forks a pool of N workers over doc-index chunks, times
only the map. taskset pins the process tree to N cores. 3 independent
pairs, median efficiency reported.

Run: python BENCH/pool_lines.py           # driver: one JSON line
     python BENCH/pool_lines.py --workers N   # worker (internal)
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
N_DOCS = 2_000_000
CORPUS = Path("/tmp/ocr_spark_bench") / f"curate_corpus_{N_DOCS}.parquet"
PAIR = (2, 8)
REPS = 3

_TEXTS: list[str] = []


def _chunk_work(bounds: tuple[int, int]) -> int:
    lo, hi = bounds
    total = 0
    for t in _TEXTS[lo:hi]:
        kept = [s for s in (ln.strip() for ln in t.split("\n")) if s]
        total += len("\n".join(kept))
    return total


def worker(n_workers: int) -> int:
    import pyarrow.dataset as ds

    global _TEXTS
    _TEXTS = (
        ds.dataset(str(CORPUS))
        .to_table(columns=["text"])
        .column("text")
        .to_pylist()
    )
    n = len(_TEXTS)
    # chunk count FIXED across levels (like the fixed shuffle-partition
    # count in scaling_ops.py): both levels schedule identical units
    n_chunks = 64
    chunks = [
        (i * n // n_chunks, (i + 1) * n // n_chunks)
        for i in range(n_chunks)
    ]
    walls = []
    for _ in range(2):  # first run pays pool warmup; keep min
        with mp.Pool(n_workers) as pool:
            t0 = time.time()
            total = sum(pool.map(_chunk_work, chunks))
            walls.append(time.time() - t0)
    print(
        json.dumps(
            {"workers": n_workers, "wall": min(walls), "bytes": total}
        )
    )
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=None)
    args = ap.parse_args()
    if args.workers:
        return worker(args.workers)

    if not (CORPUS / "_SUCCESS").exists():
        raise SystemExit(
            f"corpus missing: {CORPUS} — run BENCH/scaling_ops.py first"
        )
    have_taskset = shutil.which("taskset") is not None
    lo, hi = PAIR
    effs = []
    for _ in range(REPS):
        walls = {}
        for level in (lo, hi):
            cmd = [
                sys.executable,
                str(REPO / "BENCH" / "pool_lines.py"),
                "--workers", str(level),
            ]
            if have_taskset:
                cmd = ["taskset", "-c", f"0-{level - 1}"] + cmd
            proc = subprocess.run(
                cmd, capture_output=True, text=True, cwd=str(REPO)
            )
            if proc.returncode != 0:
                sys.stderr.write(proc.stderr)
                raise RuntimeError(f"pool level {level} failed")
            walls[level] = json.loads(
                proc.stdout.strip().splitlines()[-1]
            )["wall"]
        effs.append(round((walls[lo] / walls[hi]) / (hi / lo), 3))
        print(
            f"[pool-lines] {lo}->{hi}: lo={walls[lo]:.1f}s "
            f"hi={walls[hi]:.1f}s eff={effs[-1]}",
            file=sys.stderr,
        )
    effs.sort()
    print(
        json.dumps(
            {
                "metric": "sparkfree_line_reassembly_scaling",
                "pair": f"{lo}->{hi}",
                "median_eff": effs[len(effs) // 2],
                "eff_runs": effs,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
