"""Driver-shape dry run over a slice of the ``__spark_entry__`` ordering.

The driver checks a fixed ~50-key prefix of ``queries()`` per round; this
script replays that exact contract (same ordering function, same sf0.01
fixtures, same comparator as ``tests.oracle.compare``) for an arbitrary
slice, so future rounds' samples can be pre-verified before the driver
takes them. Run it from a NON-repo working directory in a fresh process
to also exercise the worker-portability path the r03 dry-run caught bugs
in (cloudpickle by-name closures).

Usage: python scripts/prefix_dryrun.py [start] [end] [sf_dir]
  start/end: 0-based slice into the queries() ordering (default 0..52)
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    end = int(sys.argv[2]) if len(sys.argv) > 2 else 52
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"

    import __spark_entry__ as entrymod
    from engine.io import get_spark
    from tests.oracle import compare

    q = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = list(q)[start:end]
    spark = get_spark(app=f"dryrun-{start}-{end}")
    spark.sparkContext.setLogLevel("ERROR")

    failures: list[tuple[str, str]] = []
    t0 = time.time()
    for i, name in enumerate(names, start):
        t = time.time()
        try:
            df = q[name](spark, sf_dir)
            if name in oracles:
                ok, msg = compare(df, sf_dir, oracles[name])
            else:
                ok, msg = df.count() >= 0, "rows-only (no oracle)"
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            ok, msg = False, f"{type(e).__name__}: {e}"[:200]
        status = "ok" if ok else "FAIL"
        print(f"[{i:3d}] {name:34s} {status} ({time.time() - t:.1f}s)", flush=True)
        if not ok:
            failures.append((name, msg))
    print(
        f"RESULT slice=[{start}:{end}] checked={len(names)} "
        f"failures={len(failures)} total={time.time() - t0:.0f}s"
    )
    for name, msg in failures:
        print(f"  FAIL {name}: {msg}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
