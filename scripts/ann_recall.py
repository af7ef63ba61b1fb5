"""ANN recall audit: recall@3 of the IVF cell-probe and PQ pipelines vs
brute force — on the parquet fixture AND on a deterministic CLUSTERED
synthetic corpus (centroid + gaussian noise, the shape real embedding
corpora have; the parquet fixture's vectors are isotropic noise, the
hardest possible case for any coarse quantizer — within-label mean
cos ≈ 0.000 — so its recall numbers are a lower bound, not the
operating point).

IVF twin: engine/similarity.py:llm_ann_ivf — LEARNED coarse quantizer
(k=10 cells, 2 quantized Lloyd iterations, init vec_id % k,
min-score/min-c assignment — bit-compatible with llm_ext.lloyd_fit),
swept over nprobe. The round-2 LABEL-cell design is reported for the
record on the fixture.

PQ twin: engine/similarity.py:llm_ann_pq — 8 subspaces x 16 codes,
vec_id % 16 seeding + one averaging round on the 1e-5 grid, ADC lanes
on the 1e-9 integer grid, shortlist -> exact re-rank top-3.

Usage:
    python scripts/ann_recall.py [sf_dir]       # fixture eval
    python scripts/ann_recall.py --clustered    # synthetic clustered eval
"""

from __future__ import annotations

import sys

import numpy as np

K = 10
ITERS = 2
PQ_SUB = 8
PQ_K = 16
PQ_SHORTLIST = 256
PQ_GRID = 1_000_000_000


def half_up(x: np.ndarray, grid: float) -> np.ndarray:
    """HALF_UP (round half away from zero) grid snap matching the
    engine/oracle (Spark F.round / DuckDB round), unlike np.round's
    half-to-even — exact .5 grid ties would otherwise diverge from the
    engine's codes/shortlist (ADVICE r04). Sign-aware (ADVICE r05):
    floor(|x|·g + .5) on the magnitude then reapply the sign, because
    floor(x·g + .5) alone rounds NEGATIVE exact ties toward +inf while
    both engines round them away from zero (e.g. -0.5/grid must snap to
    -1/grid, not 0)."""
    return np.copysign(np.floor(np.abs(x) * grid + 0.5), x) / grid


def topk(scores: np.ndarray, ids: np.ndarray, k: int = 3) -> set:
    order = np.lexsort((ids, -np.round(scores, 6)))
    return set(ids[order[:k]].tolist())


def lloyd(x: np.ndarray, ids: np.ndarray, k: int = K) -> tuple:
    assign = (ids % k).astype(np.int64)
    cents = None
    for _ in range(ITERS):
        cents = np.stack(
            [
                half_up(x[assign == c].mean(axis=0), 100000)
                for c in range(k)
            ]
        )
        score = (cents * cents).sum(axis=1)[None, :] - 2 * (x @ cents.T)
        assign = np.argmin(score, axis=1)  # ties: argmin takes lowest c
    return assign, cents


def brute_truth(ids: np.ndarray, xn: np.ndarray, qids: np.ndarray) -> dict:
    truth = {}
    for qi in qids:
        i = int(np.flatnonzero(ids == qi)[0])
        others = ids != qi
        truth[qi] = topk(xn[others] @ xn[i], ids[others])
    return truth


def eval_ivf(
    ids: np.ndarray, x: np.ndarray, cell: np.ndarray, ccn: np.ndarray,
    truth: dict, qids: np.ndarray, tag: str,
) -> None:
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    k = len(ccn)
    for nprobe in (1, 2, 3):
        hit = tot = 0
        scanned = 0.0
        for qi in qids:
            i = int(np.flatnonzero(ids == qi)[0])
            ccos = np.round(ccn @ xn[i], 6)
            order = np.lexsort((np.arange(k), -ccos))
            probe = set(order[:nprobe].tolist())
            mask = np.isin(cell, list(probe)) & (ids != qi)
            scanned += mask.sum() / len(ids)
            got = topk(xn[mask] @ xn[i], ids[mask])
            hit += len(got & truth[qi])
            tot += len(truth[qi])
        print(
            f"{tag} nprobe={nprobe}: recall@3={hit / tot:.3f} "
            f"corpus_scanned={scanned / len(qids):.1%}"
        )


def eval_pq(
    ids: np.ndarray, x: np.ndarray, truth: dict, qids: np.ndarray, tag: str
) -> None:
    """Numpy twin of llm_ann_pq: train codebooks, assign codes, ADC-score
    every (query, vector), shortlist, exact re-rank, recall@3."""
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    n, dim = xn.shape
    sd = dim // PQ_SUB
    subs = xn.reshape(n, PQ_SUB, sd)
    c0 = (ids % PQ_K).astype(np.int64)
    # one averaging round on the 1e-5 grid, then min-dist assignment
    cents = np.zeros((PQ_SUB, PQ_K, sd))
    for s in range(PQ_SUB):
        for c in range(PQ_K):
            cents[s, c] = half_up(subs[c0 == c, s].mean(axis=0), 100000)
    codes = np.zeros((n, PQ_SUB), dtype=np.int64)
    for s in range(PQ_SUB):
        score = (cents[s] * cents[s]).sum(axis=1)[None, :] - 2 * (
            subs[:, s] @ cents[s].T
        )
        codes[:, s] = np.argmin(score, axis=1)
    hit = tot = 0
    for qi in qids:
        i = int(np.flatnonzero(ids == qi)[0])
        # integer-grid ADC lanes, summed per candidate
        adc = np.zeros(n, dtype=np.int64)
        for s in range(PQ_SUB):
            lane = np.floor(cents[s] @ subs[i, s] * PQ_GRID + 0.5).astype(np.int64)
            adc += lane[codes[:, s]]
        mask = ids != qi
        order = np.lexsort((ids[mask], -adc[mask]))
        short = np.flatnonzero(mask)[order[:PQ_SHORTLIST]]
        got = topk(xn[short] @ xn[i], ids[short])
        hit += len(got & truth[qi])
        tot += len(truth[qi])
    print(
        f"{tag} shortlist={PQ_SHORTLIST}: recall@3={hit / tot:.3f} "
        f"exact_scanned={PQ_SHORTLIST / n:.1%}"
    )


def clustered_corpus(
    sigma: float, n: int = 2000, dim: int = 64, n_clusters: int = K
) -> tuple:
    """Deterministic label-correlated corpus: n_clusters unit centroids
    (seeded), each vector = centroid[label] + N(0, sigma) noise. sigma
    dials the cluster tightness; real text-embedding corpora sit around
    the point where within-cluster cos >> cross-cluster cos."""
    rng = np.random.default_rng(42)
    cents = rng.standard_normal((n_clusters, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    ids = np.arange(n, dtype=np.int64)
    labels = ids % n_clusters
    x = cents[labels] + sigma * rng.standard_normal((n, dim))
    return ids, labels, x


def run_corpus(ids: np.ndarray, x: np.ndarray, tag: str, k: int = K) -> None:
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    qids = ids[ids < 20]
    truth = brute_truth(ids, xn, qids)
    assign, cents = lloyd(x, ids, k)
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    eval_ivf(ids, x, assign, cn, truth, qids, f"{tag} ivf-learned(k={k})")
    eval_pq(ids, x, truth, qids, f"{tag} pq")


def main_fixture(sf_dir: str) -> None:
    import duckdb

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
    truth = brute_truth(ids, xn, qids)
    assign, cents = lloyd(x, ids)
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    eval_ivf(ids, x, assign, cn, truth, qids, "fixture ivf-learned(k-means)")
    cc = np.stack([half_up(x[labels == c].mean(axis=0), 100000) for c in range(K)])
    ccn = cc / np.linalg.norm(cc, axis=1, keepdims=True)
    eval_ivf(ids, x, labels, ccn, truth, qids, "fixture ivf-label(r02)")
    eval_pq(ids, x, truth, qids, "fixture pq")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--clustered":
        for sigma in (0.1, 0.3, 0.5, 0.8):
            ids, labels, x = clustered_corpus(sigma)
            run_corpus(ids, x, f"clustered sigma={sigma}")
        # the 1-5%-scan regime: a bigger corpus with k=40 cells, so one
        # probe = ~2.5% of the corpus, and the 256-shortlist re-rank is
        # ~3% — the operating shape of a real deployment. The dense σ
        # grid maps the recall CLIFF between the tight-cluster regime
        # (σ=0.1, recall 1.0 at nprobe=1) and the mixed regime (σ=0.3,
        # recall 0.35) — VERDICT r05 item 7. Measured r06, IVF nprobe=1
        # at 2.5% scan: σ=0.15 → 0.983, σ=0.2 → 0.883, σ=0.25 → 0.617,
        # σ=0.3 → 0.350 — the cliff edge sits near σ≈0.2-0.25 (noise a
        # fifth-to-quarter of centroid scale per dim); nprobe=3 holds
        # 1.000 through σ=0.2 and 0.783 at σ=0.25. PQ's 256-shortlist
        # degrades earlier (0.80 / 0.60 / 0.55): code collisions between
        # neighboring clusters dominate before cell routing does.
        for sigma in (0.1, 0.15, 0.2, 0.25, 0.3):
            ids, labels, x = clustered_corpus(sigma, n=8000, n_clusters=40)
            run_corpus(ids, x, f"clustered8k sigma={sigma}", k=40)
    else:
        main_fixture(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")


if __name__ == "__main__":
    main()
