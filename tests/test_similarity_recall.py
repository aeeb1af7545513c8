"""Recall floor for the approximate ANN operators vs the exact
brute-force baseline, on the driver's sf0.001 embeddings table —
i.i.d. random vectors, the structure-free WORST case for any space
partitioner (real embedding corpora cluster, which only helps).

Pins VERDICT r2 task #6: multiprobe LSH must recover recall ≥ 0.5
at n_planes=6 where single-probe measures ~0.12.
"""

import os

import pytest
from pyspark.sql import functions as F

from cocrawler_spark.operators.similarity import (
    cosine_topk_bruteforce,
    lsh_ann_topk,
)

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF, "embeddings.parquet")),
    reason="driver testdata not present",
)


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(approx, exact):
    hits = total = 0
    for qid, truth in exact.items():
        got = approx.get(qid, set())
        hits += len(got & truth)
        total += len(truth)
    return hits / total if total else 0.0


def test_multiprobe_lsh_recall_floor(spark):
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 16)
    exact = _topk_sets(cosine_topk_bruteforce(emb, queries, k=5))
    single = _topk_sets(lsh_ann_topk(emb, queries, k=5, n_planes=6))
    multi = _topk_sets(
        lsh_ann_topk(emb, queries, k=5, n_planes=6, multiprobe=2)
    )
    r_single = _recall(single, exact)
    r_multi = _recall(multi, exact)
    # multiprobe strictly widens the candidate set → recall can only rise
    assert r_multi >= r_single
    assert r_multi >= 0.5, f"multiprobe recall@5 = {r_multi:.3f} (single {r_single:.3f})"


def test_multiprobe_superset_of_single_probe(spark):
    """Every single-probe candidate pair survives multiprobe (the extra
    probes only ADD buckets), so top-k can only improve."""
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet")).filter(
        F.col("vec_id") < 120
    )
    queries = emb.filter(F.col("vec_id") < 8)
    single = lsh_ann_topk(emb, queries, k=1000, n_planes=6)
    multi = lsh_ann_topk(emb, queries, k=1000, n_planes=6, multiprobe=2)
    s_pairs = {(r["query_id"], r["neighbor_id"]) for r in single.collect()}
    m_pairs = {(r["query_id"], r["neighbor_id"]) for r in multi.collect()}
    assert s_pairs <= m_pairs


def test_ivfpq_candidates_and_signal(spark):
    """IVF-PQ sanity on the md5 stand-in codebooks: (1) PQ top-k stays
    inside the IVF-probed candidate pool (cluster probing is shared
    plan machinery); (2) on a CLUSTERED fixture — the data regime PQ
    exists for — ADC ranking carries real signal: recall@5 vs exact
    cosine far above the ~5% chance floor of picking 5 from the ~100-
    candidate pool. Absolute recall is bounded by the tiny code budget
    (4 subspaces x 8 codes = 12 bits) and the untrained stand-in
    codebooks — the production path swaps in trained k-means books via
    pq_codebooks, the plan shape is identical (docstring)."""
    import numpy as np

    from cocrawler_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_ann_topk,
        ivfpq_ann_topk,
    )

    rng = np.random.RandomState(7)
    centers = rng.randn(20, 64)
    rows = [
        (i, [float(x) for x in centers[i % 20] + 0.15 * rng.randn(64)])
        for i in range(400)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") < 16)
    pq = ivfpq_ann_topk(
        emb, queries, k=5, n_centroids=8, nprobe=2, m_sub=4, k_codes=8
    )
    pq_top = _topk_sets(pq)
    # (1) candidates subset of the IVF-probed pool
    pool = _topk_sets(
        ivf_ann_topk(emb, queries, k=1000, n_centroids=8, nprobe=2)
    )
    for qid, got in pq_top.items():
        assert got <= pool[qid]
        assert len(got) == 5
    # (2) ADC signal: recall@5 vs exact cosine >= 0.2 (measured 0.375
    # on this fixture; chance over the probed pool is ~0.05)
    exact = _topk_sets(cosine_topk_bruteforce(emb, queries, k=5))
    assert _recall(pq_top, exact) >= 0.2


def test_random_projection_mirror_and_jl_property(spark):
    """random_projection equals a pure-Python mirror exactly (same sign
    matrix, fold order, rounding), and the JL property holds on the
    driver embeddings: squared norms are preserved in expectation
    (mean ratio within ±30% at out_dim=16)."""
    from cocrawler_spark.operators.similarity import (
        random_projection,
        rp_sign_matrix,
    )

    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet")).filter(
        F.col("vec_id") < 50
    )
    rows = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    got = {}
    for r in random_projection(emb, out_dim=16, in_dim=64, seed=1).collect():
        got.setdefault(r["vec_id"], {})[r["dim"]] = r["value"]

    mat = rp_sign_matrix(64, 16, seed=1)
    scale = 1.0 / 16 ** 0.5
    ratios = []
    for vid, v in rows.items():
        proj = []
        for j in range(16):
            acc = 0.0
            for i in range(64):
                acc += float(v[i]) * mat[j][i]
            proj.append(round(acc * scale, 6))
        assert [got[vid][j] for j in range(16)] == pytest.approx(proj, abs=2e-6)
        n_in = sum(float(x) * float(x) for x in v)
        n_out = sum(p * p for p in proj)
        if n_in > 0:
            ratios.append(n_out / n_in)
    mean = sum(ratios) / len(ratios)
    assert 0.7 < mean < 1.3, mean


def test_ivf_trained_recall_floor(spark):
    """VERDICT r3 next-round #2: k-means-TRAINED IVF must reach
    recall@5 >= 0.6 vs exact bruteforce at nprobe=4 of 8 clusters on
    the driver embeddings (i.i.d. vectors — the worst case), and must
    not be worse than the md5 stand-in quantizer at the same probes."""
    from cocrawler_spark.operators.similarity import (
        ivf_ann_topk,
        ivf_trained_ann_topk,
    )

    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 16)
    exact = _topk_sets(cosine_topk_bruteforce(emb, queries, k=5))
    trained = _topk_sets(
        ivf_trained_ann_topk(emb, queries, k=5, n_centroids=8, nprobe=4)
    )
    standin = _topk_sets(
        ivf_ann_topk(emb, queries, k=5, n_centroids=8, nprobe=4)
    )
    r_trained = _recall(trained, exact)
    r_standin = _recall(standin, exact)
    assert r_trained >= 0.6, (
        f"trained IVF recall@5 = {r_trained:.3f} (stand-in {r_standin:.3f})"
    )
    assert r_trained >= r_standin - 1e-9


def test_ivfpq_trained_codebooks_cut_distortion(spark):
    """Trained PQ codebooks must (a) cut sub-vector reconstruction MSE
    — the quantity k-means optimizes and the quantity that bounds ADC
    error (Jégou TPAMI'11 §III) — well below the md5 stand-in books,
    and (b) keep ADC recall above the chance floor. Recall itself is
    NOT asserted trained > stand-in here: on a clustered fixture a
    well-trained codebook maps every same-center doc to the SAME codes,
    so ADC ties within a center and tie-break order decides — the
    measured pools are identical (probe recall 1.0 both ways) and the
    within-center discrimination PQ loses is what residual encoding
    exists for (see the residual variant's test)."""
    import numpy as np

    from cocrawler_spark.operators.similarity import (
        cosine_topk_bruteforce as _bf,
        ivfpq_trained_ann_topk,
        pq_codebooks,
        pq_trained_codebooks,
    )

    rng = np.random.RandomState(7)
    centers = rng.randn(20, 64)
    rows = [
        (i, [float(x) for x in centers[i % 20] + 0.15 * rng.randn(64)])
        for i in range(400)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    X = np.array([v for _, v in rows])

    def mse(books, trained):
        tot = 0.0
        for s in range(4):
            sub = X[:, s * 16 : (s + 1) * 16]
            cw = np.array(
                [c for _, c in books[s]] if trained else [c for c, _ in books[s]]
            )
            d = ((sub[:, None, :] - cw[None, :, :]) ** 2).sum(axis=2)
            tot += d.min(axis=1).sum()
        return tot / X.size

    trained_books = pq_trained_codebooks(emb, m_sub=4, k_codes=8, dim_sub=16)
    standin_books = pq_codebooks(m_sub=4, k_codes=8, dim_sub=16)
    m_t = mse(trained_books, trained=True)
    m_s = mse(standin_books, trained=False)
    assert m_t < 0.6 * m_s, f"trained MSE {m_t:.4f} vs stand-in {m_s:.4f}"

    queries = emb.filter(F.col("vec_id") < 16)
    exact = _topk_sets(_bf(emb, queries, k=5))
    trained = _topk_sets(
        ivfpq_trained_ann_topk(
            emb, queries, k=5, n_centroids=8, nprobe=4, m_sub=4, k_codes=8
        )
    )
    r = _recall(trained, exact)
    assert r >= 0.2, f"trained IVF-PQ recall@5 = {r:.3f}"


def test_ivfpq_residual_restores_within_cluster_discrimination(spark):
    """IVFADC (residual coding) must beat plain trained PQ at the SAME
    code budget in PQ's own regime (coarse clusters ≈ true centers, so
    the residual is the pure within-center noise): plain PQ's codes
    collapse within a center and tie-break order decides; residual
    codes spend the budget on exactly the within-center differences.
    Everything here is deterministic (seeded fixture, deterministic
    k-means), so the measured recalls (plain 0.3125, residual 0.3750
    at 12 code bits) are exact regression pins, not noisy floors — the
    absolute gap is bounded by the tiny test budget (4 subspaces × 8
    codes); production budgets (m_sub 8-16, k_codes 256) widen it."""
    import numpy as np

    from cocrawler_spark.operators.similarity import (
        ivfpq_residual_ann_topk,
        ivfpq_trained_ann_topk,
    )

    rng = np.random.RandomState(7)
    centers = rng.randn(20, 64)
    rows = [
        (i, [float(x) for x in centers[i % 20] + 0.15 * rng.randn(64)])
        for i in range(400)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") < 16)
    exact = _topk_sets(cosine_topk_bruteforce(emb, queries, k=5))
    plain = _topk_sets(
        ivfpq_trained_ann_topk(
            emb, queries, k=5, n_centroids=20, nprobe=4, m_sub=4,
            k_codes=8, iters=3,
        )
    )
    resid = _topk_sets(
        ivfpq_residual_ann_topk(
            emb, queries, k=5, n_centroids=20, nprobe=4, m_sub=4,
            k_codes=8, iters=3,
        )
    )
    r_plain = _recall(plain, exact)
    r_resid = _recall(resid, exact)
    assert r_resid > r_plain, (r_resid, r_plain)
    assert r_resid >= 0.35, f"residual IVF-PQ recall@5 = {r_resid:.3f}"


def test_ivf_trained_dataframe_centroids_equal_literal_path(spark):
    """ivf_trained_ann_topk with a centroid DATAFRAME (the large-k
    path: broadcast-join assignment + windowed probe) must return
    exactly the literal-path result."""
    from cocrawler_spark.operators.embedding_cluster import (
        kmeans_fit,
        kmeans_fit_df,
    )
    from cocrawler_spark.operators.similarity import ivf_trained_ann_topk

    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet")).filter(
        F.col("vec_id") < 200
    )
    queries = emb.filter(F.col("vec_id") < 8)
    lit_cents = kmeans_fit(emb, k=4, iters=2)
    df_cents = kmeans_fit_df(emb, k=4, iters=2)
    a = sorted(
        tuple(r)
        for r in ivf_trained_ann_topk(
            emb, queries, k=5, nprobe=2, cents=lit_cents
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in ivf_trained_ann_topk(
            emb, queries, k=5, nprobe=2, cents=df_cents
        ).collect()
    )
    assert a == b
