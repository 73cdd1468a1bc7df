"""ANN quality floors (VERDICT r2 #8): a fast-but-low-recall ANN path is a
silent quality bug — these tests make recall visible and pin a floor.

Recall is data-dependent: on clustered embeddings (the realistic shape —
real text/image embeddings concentrate on a low-dimensional manifold) both
ANN paths must reach ≥0.9 recall@10 at their documented settings. On
structureless near-orthogonal random vectors LSH degrades by design (no
angular neighborhoods to exploit) — bench.py measures and REPORTS recall on
the benchmark corpus rather than hiding it; here we additionally pin that
multi-probe never loses recall vs single-probe on the same index.
"""

from __future__ import annotations

import numpy as np
import pytest

from context_crawler_spark.operators.search import (
    ivf_topk,
    lsh_topk,
    make_lsh_bucket_udf,
    train_ivf_centroids,
    with_ivf_cells,
)

DIM = 64


def _clustered_vectors(rng, n_clusters=40, per_cluster=50, dim=DIM,
                       noise=0.15):
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, per_cluster, axis=0)
    vecs = vecs + noise * rng.standard_normal(vecs.shape)
    return vecs


def _ground_truth_top10(vecs: np.ndarray, qix: int) -> set[int]:
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = unit @ unit[qix]
    return set(np.argsort(-sims)[:10].tolist())


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.RandomState(7)
    vecs = _clustered_vectors(rng)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    qix = rng.choice(len(vecs), size=8, replace=False).tolist()
    return vecs, df, qix


def test_lsh_recall_floor_clustered(spark, clustered):
    vecs, df, qix = clustered
    udf = make_lsh_bucket_udf(dim=DIM, n_tables=8, bits_per_table=8)
    indexed = df.withColumn("lsh_buckets", udf("embedding")).cache()
    indexed.count()
    recalls = []
    for q in qix:
        gt = _ground_truth_top10(vecs, q)
        got = {
            r["vec_id"] for r in lsh_topk(
                indexed, vecs[q].tolist(), k=10, dim=DIM, n_tables=8,
                bits_per_table=8, probe_flips=2,
            ).collect()
        }
        recalls.append(len(gt & got) / 10)
    indexed.unpersist()
    # probe_flips=2 ≈ 1.5% of keyspace probed per table; measured 0.85 at
    # flips=1 — the multi-probe depth is exactly the recall/cost knob
    assert np.mean(recalls) >= 0.9, recalls


def test_ivf_recall_floor_clustered(spark, clustered):
    vecs, df, qix = clustered
    cents = train_ivf_centroids(df, n_cells=16, iters=4)
    indexed = with_ivf_cells(df, cents).cache()
    indexed.count()
    recalls = []
    for q in qix:
        gt = _ground_truth_top10(vecs, q)
        got = {
            r["vec_id"] for r in ivf_topk(
                indexed, cents, vecs[q].tolist(), k=10, nprobe=8,
            ).collect()
        }
        recalls.append(len(gt & got) / 10)
    indexed.unpersist()
    # nprobe=8 of 16 cells still halves the scan; measured 0.84 at
    # nprobe=4/iters=2 — nprobe is IVF's recall/cost knob, same story as
    # LSH multi-probe depth
    assert np.mean(recalls) >= 0.9, recalls


def test_multiprobe_never_loses_recall(spark, clustered):
    """probe_flips=1 strictly widens the candidate set: its result set is a
    superset-in-quality of single-probe (recall can only go up)."""
    vecs, df, qix = clustered
    udf = make_lsh_bucket_udf(dim=DIM, n_tables=4, bits_per_table=8)
    indexed = df.withColumn("lsh_buckets", udf("embedding")).cache()
    indexed.count()
    for q in qix[:3]:
        gt = _ground_truth_top10(vecs, q)
        r0 = {
            r["vec_id"] for r in lsh_topk(
                indexed, vecs[q].tolist(), k=10, dim=DIM, n_tables=4,
                bits_per_table=8, probe_flips=0,
            ).collect()
        }
        r1 = {
            r["vec_id"] for r in lsh_topk(
                indexed, vecs[q].tolist(), k=10, dim=DIM, n_tables=4,
                bits_per_table=8, probe_flips=1,
            ).collect()
        }
        assert len(gt & r1) >= len(gt & r0)
    indexed.unpersist()


def test_probe_keys_expansion():
    from context_crawler_spark.operators.search import lsh_probe_keys

    base = [0b1010 | (3 << 56)]
    keys = lsh_probe_keys(base, bits_per_table=4, flips=1)
    # the original + its 4 one-bit flips, table tag untouched
    assert len(keys) == 5
    assert all(k >> 56 == 3 for k in keys)
    assert set(keys) == {
        base[0], base[0] ^ 1, base[0] ^ 2, base[0] ^ 4, base[0] ^ 8,
    }


def test_default_paths_hit_the_recall_floor(spark, clustered):
    """VERDICT r3 #2 / r4 #3: the SHIPPED defaults (lsh_topk
    probe_flips=2, ivf_topk nprobe=12 since r5 — no explicit knobs
    passed) must themselves clear the ≥0.9 clustered floor; the quality
    bar holds for the configuration users actually run."""
    vecs, df, qix = clustered
    udf = make_lsh_bucket_udf(dim=DIM, n_tables=8, bits_per_table=8)
    indexed = df.withColumn("lsh_buckets", udf("embedding")).cache()
    indexed.count()
    cents = train_ivf_centroids(df, n_cells=16, iters=4)
    indexed_ivf = with_ivf_cells(df, cents).cache()
    indexed_ivf.count()
    lsh_recalls, ivf_recalls = [], []
    for q in qix:
        gt = _ground_truth_top10(vecs, q)
        got_lsh = {
            r["vec_id"] for r in lsh_topk(
                indexed, vecs[q].tolist(), k=10, dim=DIM, n_tables=8,
                bits_per_table=8,   # probe_flips NOT passed — the default
            ).collect()
        }
        got_ivf = {
            r["vec_id"] for r in ivf_topk(
                indexed_ivf, cents, vecs[q].tolist(), k=10,  # nprobe default
            ).collect()
        }
        lsh_recalls.append(len(gt & got_lsh) / 10)
        ivf_recalls.append(len(gt & got_ivf) / 10)
    indexed.unpersist()
    indexed_ivf.unpersist()
    assert np.mean(lsh_recalls) >= 0.9, lsh_recalls
    assert np.mean(ivf_recalls) >= 0.9, ivf_recalls


def test_batch_apis_match_single_query(spark, clustered):
    """lsh_topk_batch / ivf_topk_batch answer every query identically to
    the single-query forms at the same settings — the bench recall sweep
    measures exactly what the headline queries run."""
    from context_crawler_spark.operators.search import (
        ivf_topk_batch, lsh_topk_batch,
    )

    vecs, df, qix = clustered
    udf = make_lsh_bucket_udf(dim=DIM, n_tables=8, bits_per_table=8)
    indexed = df.withColumn("lsh_buckets", udf("embedding")).cache()
    indexed.count()
    cents = train_ivf_centroids(df, n_cells=16, iters=4)
    indexed_ivf = with_ivf_cells(df, cents).cache()
    indexed_ivf.count()
    queries = [(int(q), vecs[q].tolist()) for q in qix[:4]]
    lsh_b = lsh_topk_batch(indexed, queries, k=10, dim=DIM, n_tables=8,
                           bits_per_table=8, probe_flips=2)
    ivf_b = ivf_topk_batch(indexed_ivf, cents, queries, k=10, nprobe=8)

    def by_query(df_):
        out = {}
        for r in df_.collect():
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    got_lsh, got_ivf = by_query(lsh_b), by_query(ivf_b)
    for qid, qv in queries:
        single_lsh = {
            r["vec_id"] for r in lsh_topk(
                indexed, qv, k=10, dim=DIM, n_tables=8, bits_per_table=8,
                probe_flips=2).collect()
        }
        single_ivf = {
            r["vec_id"] for r in ivf_topk(
                indexed_ivf, cents, qv, k=10, nprobe=8).collect()
        }
        assert got_lsh[qid] == single_lsh, qid
        assert got_ivf[qid] == single_ivf, qid
    indexed.unpersist()
    indexed_ivf.unpersist()
