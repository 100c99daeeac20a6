"""IVF index: build (KMeans codebook), persist partitionBy(cell), probe,
and measure recall against brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def corpus(spark):
    from azure_serverless_etl_pipeline_spark.sources import load_table

    return load_table(spark, SF_ORACLE, "embeddings")


def test_build_and_probe_recall(spark, corpus, tmp_path_factory):
    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        build_ivf_index,
        probe_ivf,
    )
    from azure_serverless_etl_pipeline_spark.operators.similarity import cosine_topk

    path = str(tmp_path_factory.mktemp("ivf") / "index")
    indexed, centroids = build_ivf_index(corpus, k=8, index_path=path)
    assert centroids.shape == (8, 64)
    # every vector got a cell; cells partition the corpus
    assert indexed.filter("cell IS NULL").count() == 0
    assert indexed.count() == corpus.count()

    queries = corpus.filter(F.col("vec_id") < 20)
    approx = probe_ivf(indexed, queries, centroids, k=5, nprobe=3).toPandas()
    exact = cosine_topk(corpus, queries, k=5).toPandas()

    a = set(map(tuple, approx[["query_id", "neighbor_id"]].to_numpy().tolist()))
    e = set(map(tuple, exact[["query_id", "neighbor_id"]].to_numpy().tolist()))
    recall = len(a & e) / len(e)
    assert recall >= 0.5  # random gaussian-ish corpus, 3/8 cells probed
    # scored cosine values must be identical to the exact path's for hits
    merged = approx.merge(exact, on=["query_id", "neighbor_id"], suffixes=("_a", "_e"))
    assert (merged["cos_sim_a"] == merged["cos_sim_e"]).all()

    # the persisted index is partition-pruned on cell
    back = spark.read.parquet(path)
    plan = (
        back.filter(F.col("cell") == 3)._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan


def test_probe_more_cells_more_recall(spark, corpus):
    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        build_ivf_index,
        probe_ivf,
    )
    from azure_serverless_etl_pipeline_spark.operators.similarity import cosine_topk

    indexed, centroids = build_ivf_index(corpus, k=8)
    queries = corpus.filter(F.col("vec_id") < 20)
    exact = set(
        map(
            tuple,
            cosine_topk(corpus, queries, k=5)
            .toPandas()[["query_id", "neighbor_id"]]
            .to_numpy()
            .tolist(),
        )
    )

    def recall(nprobe):
        got = set(
            map(
                tuple,
                probe_ivf(indexed, queries, centroids, k=5, nprobe=nprobe)
                .toPandas()[["query_id", "neighbor_id"]]
                .to_numpy()
                .tolist(),
            )
        )
        return len(got & exact) / len(exact)

    r1, r8 = recall(1), recall(8)
    assert r8 == 1.0  # probing all cells == exact
    assert r1 <= r8


def test_lsh_multiprobe_improves_recall(spark, corpus):
    from azure_serverless_etl_pipeline_spark.operators.similarity import (
        cosine_topk,
        lsh_ann_topk,
    )

    queries = corpus.filter(F.col("vec_id") < 20)
    exact = set(
        map(
            tuple,
            cosine_topk(corpus, queries, k=5)
            .toPandas()[["query_id", "neighbor_id"]]
            .to_numpy()
            .tolist(),
        )
    )

    def recall(multiprobe):
        got = set(
            map(
                tuple,
                lsh_ann_topk(corpus, queries, k=5, multiprobe=multiprobe)
                .toPandas()[["query_id", "neighbor_id"]]
                .to_numpy()
                .tolist(),
            )
        )
        return len(got & exact) / len(exact)

    r_single, r_multi = recall(False), recall(True)
    assert r_multi >= r_single
    assert r_multi >= 0.3  # 5/16 of the corpus probed on gaussian-ish data


def test_pq_roundtrip_and_recall(spark, corpus):
    """PQ: codes have the right shape/range; ADC + exact re-rank recall vs
    brute force is high (the refine step recovers ADC quantization loss);
    encoding is deterministic across runs."""
    import numpy as np

    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        encode_pq,
        search_pq,
        train_pq_codebooks,
    )
    from azure_serverless_etl_pipeline_spark.operators.similarity import cosine_topk

    books = train_pq_codebooks(corpus, m=8, k=16)
    assert books.shape == (8, 16, 8)
    encoded = encode_pq(corpus, books).cache()
    pdf = encoded.toPandas()
    assert len(pdf) == corpus.count()
    codes = np.vstack(pdf["codes"].to_numpy())
    assert codes.shape[1] == 8 and codes.min() >= 0 and codes.max() < 16
    # deterministic: re-encoding yields identical codes
    pdf2 = encode_pq(corpus, books).toPandas()
    merged = pdf.merge(pdf2, on="vec_id")
    assert all((a == b).all() for a, b in zip(merged["codes_x"], merged["codes_y"]))

    queries = corpus.filter("vec_id < 20")
    approx = search_pq(encoded, corpus, queries, books, k=5, shortlist=50).toPandas()
    exact = cosine_topk(corpus, queries, k=5).toPandas()
    a = set(map(tuple, approx[["query_id", "neighbor_id"]].to_numpy().tolist()))
    e = set(map(tuple, exact[["query_id", "neighbor_id"]].to_numpy().tolist()))
    assert len(a & e) / len(e) >= 0.8  # shortlist=10% of corpus + exact rerank
    # exact-cosine scores on the overlap agree with brute force bit-for-bit
    j = approx.merge(exact, on=["query_id", "neighbor_id"], suffixes=("_pq", "_bf"))
    assert (j["cos_sim_pq"] == j["cos_sim_bf"]).all()
    encoded.unpersist()


def test_pq_shortlist_grows_recall(spark, corpus):
    """The ADC shortlist is the recall knob: widening it can only help."""
    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        encode_pq,
        search_pq,
        train_pq_codebooks,
    )
    from azure_serverless_etl_pipeline_spark.operators.similarity import cosine_topk

    books = train_pq_codebooks(corpus, m=8, k=16)
    encoded = encode_pq(corpus, books).cache()
    queries = corpus.filter("vec_id < 10")
    exact = cosine_topk(corpus, queries, k=5).toPandas()
    e = set(map(tuple, exact[["query_id", "neighbor_id"]].to_numpy().tolist()))

    def recall(sl):
        ap = search_pq(encoded, corpus, queries, books, k=5, shortlist=sl).toPandas()
        a = set(map(tuple, ap[["query_id", "neighbor_id"]].to_numpy().tolist()))
        return len(a & e) / len(e)

    r_narrow, r_wide = recall(10), recall(100)
    assert r_wide >= r_narrow
    assert r_wide >= 0.9
    encoded.unpersist()


def test_pq_train_tiny_corpus_raises(spark, corpus):
    """train_pq_codebooks must fail loudly (not with an opaque numpy
    error) when the training sample is smaller than k."""
    import pytest

    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        train_pq_codebooks,
    )

    tiny = corpus.filter("vec_id < 5")
    with pytest.raises(ValueError, match="k=16"):
        train_pq_codebooks(tiny, m=8, k=16)


def test_covariance_gemm_matches_exact(spark, corpus):
    """The scale-path GEMM covariance (per-partition numpy partials, no
    corpus fan-out) must equal the exact decimal grid to one 1e-9
    quantum — the only divergence allowed is float partial-merge order."""
    from azure_serverless_etl_pipeline_spark.operators.linalg import (
        embedding_covariance,
        embedding_covariance_gemm,
    )

    exact = embedding_covariance(corpus, dim=64).toPandas()
    gemm = embedding_covariance_gemm(corpus, dim=64).toPandas()
    assert len(exact) == len(gemm) == 64 * 65 // 2

    key = ["i", "j"]
    merged = exact.merge(gemm, on=key, suffixes=("_e", "_g"))
    assert len(merged) == len(exact)
    assert (merged["n_e"] == merged["n_g"]).all()
    assert (merged["cov_e"] - merged["cov_g"]).abs().max() <= 1e-9

    # ...and the result is invariant under a different partitioning to
    # within the same quantum (merge order is the only moving part)
    reparted = embedding_covariance_gemm(corpus.repartition(13), dim=64).toPandas()
    m2 = gemm.merge(reparted, on=key, suffixes=("_a", "_b"))
    assert (m2["cov_a"] - m2["cov_b"]).abs().max() <= 1e-9


def test_embedding_spectrum_matches_numpy(spark, corpus):
    """x137's eigenvalues must match numpy's eigvalsh of the sample
    covariance computed directly on the collected vectors (the operator
    goes through the distributed GEMM partials + rounded cell quantum,
    so agreement is to ~1e-7, far tighter than any diagnostic use)."""
    import numpy as np

    from azure_serverless_etl_pipeline_spark.operators.linalg import (
        embedding_spectrum,
    )

    got = embedding_spectrum(corpus, dim=64, k=8).toPandas()
    assert list(got["component"]) == list(range(1, 9))
    # monotone non-increasing spectrum, ratios in (0, 1], cum monotone
    assert (got["eigenvalue"].diff().dropna() <= 1e-12).all()
    assert ((got["explained_var"] > 0) & (got["explained_var"] <= 1)).all()
    assert (got["cum_explained"].diff().dropna() > 0).all()

    x = np.vstack(
        [r["embedding"] for r in corpus.select("embedding").collect()]
    ).astype(np.float64)
    cov = np.cov(x, rowvar=False, bias=True)
    want = np.linalg.eigvalsh(cov)[::-1][:8]
    assert np.abs(got["eigenvalue"].to_numpy() - want).max() <= 1e-7
