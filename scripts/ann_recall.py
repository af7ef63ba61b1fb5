"""ANN recall audit: recall@3 of the IVF cell-probe path vs brute force.

Numpy twin of engine/similarity.py:llm_ann_ivf — the LEARNED coarse
quantizer (k=10 cells, 2 quantized Lloyd iterations, init vec_id % k,
min-score/min-c assignment — bit-compatible with llm_ext.lloyd_fit) —
swept over nprobe. Also reports the round-2 LABEL-cell design for the
record: the fixture's labels carry no geometric signal (within-label
mean cos ≈ 0.000 = global), so label cells were a random sample and
recall ≈ scan fraction; learned cells beat that at the same cost.

Usage: python scripts/ann_recall.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np

K = 10
ITERS = 2


def topk(scores: np.ndarray, ids: np.ndarray, k: int = 3) -> set:
    order = np.lexsort((ids, -np.round(scores, 6)))
    return set(ids[order[:k]].tolist())


def lloyd(x: np.ndarray, ids: np.ndarray) -> tuple:
    assign = (ids % K).astype(np.int64)
    cents = None
    for _ in range(ITERS):
        cents = np.stack(
            [
                np.round(x[assign == c].mean(axis=0) * 100000) / 100000
                for c in range(K)
            ]
        )
        score = (cents * cents).sum(axis=1)[None, :] - 2 * (x @ cents.T)
        assign = np.argmin(score, axis=1)  # ties: argmin takes lowest c
    return assign, cents


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, label, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    labels = np.array([r[1] for r in rows], dtype=np.int64)
    x = np.array([r[2] for r in rows], dtype=np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)

    qids = ids[ids < 20]
    truth = {}
    for qi in qids:
        i = int(np.flatnonzero(ids == qi)[0])
        others = ids != qi
        truth[qi] = topk(xn[others] @ xn[i], ids[others])

    assign, cents = lloyd(x, ids)
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    for name, cell in (("learned(k-means)", assign), ("label(r02)", labels)):
        if name.startswith("label"):
            cc = np.stack(
                [np.round(x[labels == c].mean(axis=0), 5) for c in range(K)]
            )
            ccn = cc / np.linalg.norm(cc, axis=1, keepdims=True)
        else:
            ccn = cn
        for nprobe in (1, 2, 3):
            hit = tot = 0
            scanned = 0.0
            for qi in qids:
                i = int(np.flatnonzero(ids == qi)[0])
                ccos = np.round(ccn @ xn[i], 6)
                order = np.lexsort((np.arange(K), -ccos))
                probe = set(order[:nprobe].tolist())
                mask = np.isin(cell, list(probe)) & (ids != qi)
                scanned += mask.sum() / len(ids)
                got = topk(xn[mask] @ xn[i], ids[mask])
                hit += len(got & truth[qi])
                tot += len(truth[qi])
            print(
                f"{name} nprobe={nprobe}: recall@3={hit / tot:.3f} "
                f"corpus_scanned={scanned / len(qids):.1%}"
            )


if __name__ == "__main__":
    main()
