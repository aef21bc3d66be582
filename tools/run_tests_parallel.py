"""Parallel test-suite runner: N pytest subprocesses, one Spark
session each (VERDICT r11 item 6 — the suite runs 27+ min
single-process while local[32] sits mostly idle between Spark jobs).

pytest-xdist is not installed in this container (and nothing may be
pip-installed), so parallelism is process-level: test FILES are
partitioned into N buckets by longest-processing-time-first over a
weight table (observed runtimes for the known-heavy files, file size
as the fallback proxy), and each bucket runs as its own
``python -m pytest <files>`` subprocess with its own JVM/SparkSession
(local[8] inside; 4 workers x 8 threads = the 32 cores). Safe by
construction: the suite uses no Hive metastore / saveAsTable /
shared-warehouse state, temp views are session-scoped, and pytest's
tmp_path roots are per-process-unique.

Usage: python tools/run_tests_parallel.py [-n WORKERS] [pytest args…]
Exit code is nonzero if any bucket fails. Per-bucket logs land in
/tmp/gw_suite_<i>.log; the summary prints each bucket's tail line.
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import time

# observed single-process runtimes (seconds) for the heavy files —
# everything else is estimated from file size (≈1 s per 700 bytes,
# the suite-wide median ratio); only RELATIVE weight matters for LPT
_KNOWN_S = {
    "test_manifest_checkpoint.py": 165,
    "test_snapshots.py": 140,
    "test_lakehouse_sql.py": 95,
    "test_streaming.py": 150,
    "test_snapshot_source.py": 120,
    "test_catalog.py": 100,
    "test_ivm.py": 100,
    "test_catalog_fuzz.py": 80,
    "test_timeseries.py": 80,
    "test_pipeline.py": 70,
    "test_plan_audit.py": 150,
    "test_entry_contract.py": 90,
    "test_optimize.py": 70,
    "test_deletion_vectors.py": 60,
    "test_curation.py": 60,
    "test_zonemap.py": 60,
    "test_similarity.py": 50,
    "test_geo.py": 50,
}


def _weight(path: str) -> float:
    name = os.path.basename(path)
    if name in _KNOWN_S:
        return float(_KNOWN_S[name])
    return os.path.getsize(path) / 700.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--workers", type=int, default=4)
    ap.add_argument("rest", nargs="*", help="extra pytest args")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(root, "tests", "test_*.py")))
    if not files:
        print("no test files found", file=sys.stderr)
        return 2
    # LPT: heaviest first, always into the lightest bucket
    buckets: list[list[str]] = [[] for _ in range(args.workers)]
    loads = [0.0] * args.workers
    for f in sorted(files, key=_weight, reverse=True):
        i = loads.index(min(loads))
        buckets[i].append(f)
        loads[i] += _weight(f)

    t0 = time.time()
    procs = []
    for i, bucket in enumerate(buckets):
        if not bucket:
            continue
        log = open(f"/tmp/gw_suite_{i}.log", "w")
        cmd = [
            sys.executable, "-m", "pytest", "-q",
            "-p", "no:cacheprovider", *args.rest, *bucket,
        ]
        # GW_SUITE_CHILD: the conftest whole-suite dispatch hook must
        # never re-trigger inside a bucket (round 14)
        env = dict(os.environ, GW_SUITE_CHILD="1")
        procs.append(
            (
                i,
                subprocess.Popen(
                    cmd, cwd=root, stdout=log,
                    stderr=subprocess.STDOUT, env=env,
                ),
                log,
            )
        )
        print(
            f"[bucket {i}] {len(bucket)} files, est "
            f"{loads[i]:.0f}s -> /tmp/gw_suite_{i}.log"
        )
    rc = 0
    import re as _re

    ran = 0
    for i, p, log in procs:
        p.wait()
        log.close()
        with open(f"/tmp/gw_suite_{i}.log") as f:
            tail = [
                ln.strip() for ln in f.readlines()[-15:]
                if " passed" in ln or " failed" in ln or " error" in ln
            ]
        status = "OK" if p.returncode == 0 else f"FAIL rc={p.returncode}"
        print(f"[bucket {i}] {status}  {'; '.join(tail[-1:])}")
        for ln in tail[-1:]:
            ran += sum(
                int(n)
                for n, _w in _re.findall(
                    r"(\d+) (passed|failed|skipped|error"
                    r"|xfailed|xpassed)", ln
                )
            )
        if p.returncode != 0:
            rc = 1
    # coverage equality vs the canonical serial run: the buckets
    # partition test FILES, so the union must collect exactly the IDs
    # `pytest tests/` collects — assert it so a bucketing bug can
    # never silently drop a file (VERDICT r12 item 5). Only when the
    # whole suite ran (no extra pytest args like -k) AND no bucket
    # failed: under -x a failing bucket legitimately stops early, so
    # ran < collected would print a spurious MISMATCH on every
    # ordinary failure and train readers to ignore the real guard
    # (round-14 review fix; rc is already nonzero in that case).
    if rc == 0 and not set(args.rest) - {"-x", "--exitfirst"}:
        out = subprocess.run(
            [
                sys.executable, "-m", "pytest", "--collect-only", "-q",
                "-p", "no:cacheprovider", os.path.join(root, "tests"),
            ],
            cwd=root, capture_output=True, text=True,
            env=dict(os.environ, GW_SUITE_CHILD="1"),
        )
        m = _re.search(
            r"(\d+) tests collected", out.stdout
        ) or _re.search(r"(\d+)/\d+ tests collected", out.stdout)
        if m:
            collected = int(m.group(1))
            ok = ran == collected
            print(
                f"coverage: ran {ran} vs serial-collected {collected} "
                f"-> {'MATCH' if ok else 'MISMATCH'}"
            )
            if not ok:
                rc = rc or 3
        else:
            print("coverage: could not parse collect-only output")
            rc = rc or 3
    print(f"wall: {time.time() - t0:.0f}s, exit {rc}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
