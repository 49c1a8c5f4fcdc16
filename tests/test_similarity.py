"""Similarity-search tests: exact top-k vs the IVF scale path (recall) and
the hyperplane LSH bucket path."""

from pyspark.sql import functions as F

from rdf_tabular_spark.operators.similarity import (cosine_topk, ivf_index,
                                                    ivf_search,
                                                    lsh_bucket_topk)

SF = "/root/testdata/sf0.001"


def test_ivf_recall_vs_exact(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {r["vec_id"] for r in cosine_topk(emb, query_id=0, k=10).collect()}

    assigned, centroids = ivf_index(emb, k=8)
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    got = ivf_search(assigned.filter(F.col("vec_id") != 0), centroids,
                     [float(x) for x in q], k=10, n_probe=3)
    ivf_ids = {r["vec_id"] for r in got.collect()}
    # probing 3/8 cells must recover most of the true top-10
    assert len(exact & ivf_ids) >= 6, (exact, ivf_ids)


def test_ivf_deterministic(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    _, c1 = ivf_index(emb, k=8)
    _, c2 = ivf_index(emb, k=8)
    assert c1 == c2  # seeded KMeans


def test_lsh_bucket_subset_of_corpus(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = lsh_bucket_topk(emb, query_id=0, dim=64, k=10, n_planes=8)
    rows = got.collect()
    # bucket path returns ≤ k results, all with valid sims
    assert len(rows) <= 10
    assert all(-1.0 <= r["sim"] <= 1.0 for r in rows)
