#!/usr/bin/env python
"""Full-registry DuckDB parity sweep at a SCALED fixture (sf1/sf10/...).

The driver gate runs at sf0.01 and the suite at sf0.01/sf0.1 — small
enough that summation-order float noise stays under every rounding grid
and fixture columns stay accidentally unique. The first sweep of this
kind (r07, sf1) caught six keys whose engine/oracle agreement was a
property of the SMALL fixtures, not of the queries (half-cent drift in
~2e10-magnitude double money sums; min_by ties impossible only below
sf1; round() half-boundary divergence) — run one of these whenever a
new decade fixture exists.

Differences from scripts/partition_invariance.py (which this otherwise
mirrors — same comparator, same registry order):

- per-key isolation: an oracle that errors (e.g. DuckDB spilling the
  sf1 recursive-CTE oracle past the disk — the failure that killed the
  first r07 attempt at ~90% coverage) records ERROR and the sweep
  continues instead of dying with unknown coverage;
- line-buffered per-key progress, so a crash still tells you exactly
  what was covered;
- an explicit skip list for oracles known intractable at scale, each
  printed as SKIP so the final RESULT line can't silently over-claim.

Usage: python scripts/scaled_parity.py [sf_dir] [skip_csv]
  sf_dir:   scaled fixture dir (default /tmp/engine_sf1)
  skip_csv: extra keys to skip (adds to the built-in list)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Oracles known intractable at scaled fixtures (the ENGINE side of each
# is still exercised by bench/stress at these scales; what cannot run is
# DuckDB's side of the comparison). EMPTY since r09: the one former
# entry (llm_dedup_clusters — its recursive-CTE transitive closure took
# 115 s at sf0.1 and spilled >40 GB of DuckDB temp at sf1) now runs an
# unrolled pointer-jumping oracle with a fixpoint certificate
# (engine/similarity.py:_clusters_oracle): 21 s at sf0.1, minutes not
# disks at sf1.
DEFAULT_SKIP: set[str] = set()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/engine_sf1"
    skip = set(DEFAULT_SKIP)
    if len(sys.argv) > 2 and sys.argv[2]:
        skip |= set(sys.argv[2].split(","))

    import __spark_entry__ as entrymod
    from engine.io import get_spark
    from tests.oracle import compare

    spark = get_spark(app="scaled_parity")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    checked = failures = errors = skipped = rows_only = 0
    bad: list[str] = []
    t_all = time.time()
    for i, (name, fn) in enumerate(queries.items()):
        if name in skip:
            print(f"[{i:3d}] {name:35s} SKIP (oracle intractable at scale)", flush=True)
            skipped += 1
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                ok, msg = compare(df, sf_dir, oracles[name])
                checked += 1
            else:
                # weaker evidence: count separately so `checked` reports
                # only true oracle comparisons (ADVICE r07 — the RESULT
                # line must not over-claim parity coverage)
                ok, msg = df.count() >= 0, "rows-only"
                rows_only += 1
            if ok:
                print(f"[{i:3d}] {name:35s} ok ({time.time() - t0:.1f}s)", flush=True)
            else:
                failures += 1
                bad.append(name)
                print(f"[{i:3d}] FAIL {name}: {str(msg)[:400]}", flush=True)
        except Exception as e:  # isolate: one bad key must not kill coverage
            errors += 1
            bad.append(name)
            print(f"[{i:3d}] ERROR {name}: {type(e).__name__}: {str(e)[:300]}", flush=True)
    print(
        f"RESULT sf_dir={sf_dir} checked={checked} rows_only={rows_only} "
        f"failures={failures} errors={errors} skipped={skipped} bad={bad} "
        f"total={time.time() - t_all:.0f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
