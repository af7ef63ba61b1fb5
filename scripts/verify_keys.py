#!/usr/bin/env python
"""Targeted parity re-check: run a comma-separated key list against the
DuckDB oracle at one or more fixture dirs in a single session.

The full-registry sweeps (scripts/scaled_parity.py) take ~1 h at sf10;
after fixing a key they flagged, this re-verifies JUST the touched keys
at every scale the fix must hold at — the per-fix loop the r07/r08
determinism work runs dozens of times.

Usage: python scripts/verify_keys.py key1,key2 sf_dir1 [sf_dir2 ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    keys = [k for k in sys.argv[1].split(",") if k]
    dirs = sys.argv[2:] or ["/root/testdata/sf0.01"]

    import __spark_entry__ as entrymod
    from engine.io import get_spark
    from tests.oracle import compare

    spark = get_spark(app="verify_keys")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    n_bad = 0
    for sf_dir in dirs:
        for name in keys:
            t0 = time.time()
            try:
                df = queries[name](spark, sf_dir)
                if name in oracles:
                    ok, msg = compare(df, sf_dir, oracles[name])
                else:
                    ok, msg = df.count() >= 0, "rows-only"
                tag = "ok" if ok else "FAIL"
            except Exception as e:  # keep going: report every key x dir
                ok, msg, tag = False, f"{type(e).__name__}: {e}", "ERROR"
            if not ok:
                n_bad += 1
            print(
                f"[{os.path.basename(sf_dir):8s}] {name:35s} {tag}"
                f" ({time.time() - t0:.1f}s)"
                + ("" if ok else f" :: {str(msg)[:300]}"),
                flush=True,
            )
    print(f"RESULT bad={n_bad}", flush=True)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
