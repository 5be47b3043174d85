"""Process-parallel test runner — the <10 min iteration lane
(round-4 verdict ask #6).

The image has no pytest-xdist, so this shards the COLLECTED test ids
round-robin across N subprocess pytest workers (each with its own
Spark session, local[4] as in conftest).  Round-robin over ids — not
files — is what balances the big parametrized modules
(test_oracle_parity.py alone is ~400 parity cases).  The pass SET is
identical to the serial run: same collection, every id runs exactly
once; only the interleaving differs.  The closing/CI run stays the
serial ``python -m pytest tests/ -q`` for determinism.

Usage: ``python tools/partest.py [-n WORKERS] [pytest args...]``
e.g. ``python tools/partest.py -n 6 -m "not slow"``.

Exit code 0 iff every shard passed; each shard's tail is echoed, and a
one-line total summary printed last.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def collect_ids(extra: list[str]) -> list[str]:
    res = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only",
         "-q", "-p", "no:cacheprovider", *extra],
        capture_output=True, text=True, cwd=REPO, timeout=600,
    )
    ids = [
        line.strip()
        for line in res.stdout.splitlines()
        if line.strip().startswith("tests/") and "::" in line
    ]
    if not ids:
        sys.stderr.write(res.stdout[-2000:] + res.stderr[-2000:])
        raise SystemExit("collection found no tests")
    return ids


def main(argv=None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    workers = min(8, max(1, (os.cpu_count() or 8) // 4))
    if "-n" in args:
        i = args.index("-n")
        workers = int(args[i + 1])
        del args[i:i + 2]

    ids = collect_ids(args)
    shards: list[list[str]] = [[] for _ in range(workers)]
    for i, tid in enumerate(ids):  # round-robin balances big modules
        shards[i % workers].append(tid)

    t0 = time.perf_counter()
    procs = []
    for w, shard in enumerate(shards):
        if not shard:
            continue
        procs.append((w, subprocess.Popen(
            [sys.executable, "-m", "pytest", "-q",
             "-p", "no:cacheprovider", *args, *shard],
            cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )))
    passed = failed = errors = 0
    rc = 0
    for w, p in procs:
        out, _ = p.communicate()
        tail = out.strip().splitlines()[-8:]
        print(f"--- shard {w} (rc={p.returncode}) ---")
        print("\n".join(tail))
        for n, kind in re.findall(r"(\d+) (passed|failed|error)", out):
            if kind == "passed":
                passed += int(n)
            elif kind == "failed":
                failed += int(n)
            else:
                errors += int(n)
        if p.returncode not in (0, 5):  # 5 = no tests in shard
            rc = 1
    dt = time.perf_counter() - t0
    print(f"TOTAL: {passed} passed, {failed} failed, {errors} errors"
          f" across {len(procs)} shards in {dt:.0f}s"
          f" (collected {len(ids)})")
    if passed + failed + errors < len(ids):
        print("WARNING: summary counts below collected total —"
              " inspect shard tails above")
        rc = rc or 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
