"""Sweep banded-LSH (bands, bits) against brute-force truth (VERDICT r02 item 6).

Measures, for each (bits-per-band, n-bands) config, the recall of the
banded hyperplane-LSH candidate stage vs the exact cos >= tau pair set at
sf0.1, plus the number of distinct candidate pairs (post _BUCKET_CAP).
Pure numpy — the band-id computation here is bit-identical to
engine.similarity._band_ids_udf (same md5-derived planes, same packing),
so the measured frontier transfers directly to the Spark path.

Usage: python scripts/lsh_sweep.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import numpy as np

sys.path.insert(0, ".")

TAU = 0.35
BUCKET_CAP = 512
DIM = 64


def plane(p: int) -> np.ndarray:
    return np.array(
        [
            1.0 if hashlib.md5(f"{p}:{i}".encode()).digest()[0] & 1 else -1.0
            for i in range(DIM)
        ]
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    x = np.array([r[1] for r in rows], dtype=np.float64)
    n = len(ids)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    c = xn @ xn.T
    iu = np.triu_indices(n, k=1)
    truth_mask = c[iu] >= TAU
    truth = set(
        (ids[iu[0][k]] << 32) | ids[iu[1][k]] for k in np.nonzero(truth_mask)[0]
    )
    print(f"n={n} truth_pairs={len(truth)} (cos>={TAU})")

    max_planes = 8 * 32
    planes = np.stack([plane(p) for p in range(max_planes)]).T  # DIM x P
    bits_all = (x @ planes) > 0

    for b, k in [(6, 12), (6, 16), (6, 18), (6, 20), (5, 12), (5, 16), (5, 20),
                 (7, 18), (7, 24), (8, 24), (8, 32)]:
        weights = 1 << np.arange(b)
        cand: set[int] = set()
        for j in range(k):
            seg = bits_all[:, b * j : b * (j + 1)]
            bv = (seg * weights).sum(axis=1)
            order = np.argsort(bv, kind="stable")
            sv = bv[order]
            starts = np.flatnonzero(np.r_[True, sv[1:] != sv[:-1]])
            ends = np.r_[starts[1:], len(sv)]
            for s, e in zip(starts, ends):
                if e - s < 2 or e - s > BUCKET_CAP:
                    continue
                mem = np.sort(ids[order[s:e]])
                mi, mj = np.triu_indices(len(mem), k=1)
                cand.update(((mem[mi] << 32) | mem[mj]).tolist())
        hit = len(cand & truth)
        rec = hit / max(len(truth), 1)
        print(
            f"bits={b} bands={k} planes={b*k}: recall={rec:.3f} "
            f"candidates={len(cand)} hit={hit}"
        )


if __name__ == "__main__":
    main()
