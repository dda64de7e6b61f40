"""recall@k report for the ANN operators against the brute-force cosine
baseline (VERDICT r2 item 7 — report, not gate).

Measures, on the same query set the oracle-checked entries use
(vec_id < 20, k=3, dim=64):

- LSH ANN (emb_ann_topk's parameters: 12 planes × 6 bands)
- IVF untrained (emb_ivf_topk's parameters: 8 cells, probe 2,
  deterministic seed centroids — the oracle-checkable configuration)
- IVF with k-means-trained centroids (train_ivf_centroids, 3 Lloyd
  rounds) at probe 1 and 2 — the production swap-in; training changes
  ONLY the centroid table, not the plan shape.

Plus (r4 VERDICT ask #2) the same comparison on CLUSTERED embeddings —
a deterministic mixture-of-Gaussians fixture (synth_clustered_embeddings:
8 well-separated centers, within-cluster cone wide enough that arbitrary
centroids split clusters). On near-uniform data IVF recall can only track
the probed cell fraction regardless of training; on clustered data the
trained centroid table captures whole neighborhoods per cell — trained
probe-1 recall ≥ 0.9 at settings the uniform table cannot reach.

Measured on this box (recorded in BENCH/BASELINE.md):
  uniform  sf0.01:  untrained_p2 0.50, kmeans3_p1 0.40, kmeans3_p2 0.62
  clustered n=2000: untrained_p2 0.60, kmeans3_p1 1.00, kmeans3_p2 1.00

Usage: python tools/ann_recall_report.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from biosd_feature_annotator_spark.operators import similarity as S  # noqa: E402
from biosd_feature_annotator_spark.session import get_spark  # noqa: E402


def report(spark, sf: str, k: int = 3, dim: int = 64) -> dict:
    e = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    q = e.where("vec_id < 20")
    exact = S.cosine_topk(q, e, k=k).where("query_id != neighbor_id").cache()
    exact.count()

    out = {
        "lsh_12x6": S.ann_recall(
            S.lsh_cosine_topk(q, e, k=k, n_planes=12, bands=6, dim=dim), exact
        ),
        "ivf_untrained_p2": S.ann_recall(
            S.ivf_cosine_topk(q, e, k=k, n_cells=8, n_probe=2, dim=dim), exact
        ),
    }
    cents = S.train_ivf_centroids(e, n_cells=8, dim=dim, rounds=3)
    for p in (1, 2):
        out[f"ivf_kmeans3_p{p}"] = S.ann_recall(
            S.ivf_cosine_topk(q, e, k=k, n_cells=8, n_probe=p, dim=dim,
                              centroids=cents),
            exact,
        )
    exact.unpersist()
    return {name: round(v, 4) for name, v in out.items()}


def report_clustered(
    spark, n: int = 2000, dim: int = 64, k: int = 3, n_cells: int = 8
) -> dict:
    """Same untrained-vs-trained comparison on the clustered MoG fixture
    (8 centers = n_cells, 40 queries). Exact top-k here is same-cluster
    by construction, so recall measures whether the cell table keeps
    clusters together — the thing training is FOR."""
    e = S.synth_clustered_embeddings(spark, n, dim=dim, k_centers=n_cells)
    e = e.cache()
    e.count()
    q = e.where("vec_id < 40")
    exact = S.cosine_topk(q, e, k=k).cache()
    exact.count()
    out = {
        "ivf_untrained_p2": S.ann_recall(
            S.ivf_cosine_topk(q, e, k=k, n_cells=n_cells, n_probe=2, dim=dim),
            exact,
        ),
    }
    cents = S.train_ivf_centroids(e, n_cells=n_cells, dim=dim, rounds=3)
    for p in (1, 2):
        out[f"ivf_kmeans3_p{p}"] = S.ann_recall(
            S.ivf_cosine_topk(q, e, k=k, n_cells=n_cells, n_probe=p, dim=dim,
                              centroids=cents),
            exact,
        )
    exact.unpersist()
    e.unpersist()
    return {name: round(v, 4) for name, v in out.items()}


def report_pq(spark, sf: str, k: int = 3, dim: int = 64) -> dict:
    """PQ-ADC recall@k against the exact squared-L2 top-k (ADC
    approximates L2, so that is the honest baseline), seed codebooks vs
    3-round Lloyd-trained — training changes only the codebook literals,
    never the plan — plus the reconstruction MSE both configurations,
    the quantity training minimizes."""
    e = spark.read.parquet(os.path.join(sf, "embeddings.parquet")).cache()
    e.count()
    q = e.where("vec_id < 20")
    exact = S.l2_topk(q, e, k=k).cache()
    exact.count()
    seed = S.pq_seed_codebooks(m=4, k=16, dim=dim)
    trained = S.train_pq_codebooks(e, m=4, k=16, dim=dim, rounds=3)
    out = {
        "pq_seed_m4k16": S.ann_recall(
            S.pq_adc_topk(q, e, seed, k=k), exact),
        "pq_lloyd3_m4k16": S.ann_recall(
            S.pq_adc_topk(q, e, trained, k=k), exact),
        "mse_seed": S.pq_reconstruction_mse(e, seed),
        "mse_lloyd3": S.pq_reconstruction_mse(e, trained),
    }
    exact.unpersist()
    e.unpersist()
    return {name: round(v, 4) for name, v in out.items()}


def main() -> None:
    sfs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    spark = get_spark(master="local[8]", app_name="ann-recall",
                      shuffle_partitions=8)
    for sf in sfs:
        print(json.dumps({"sf_dir": sf, "recall_at_3": report(spark, sf)}))
        print(json.dumps({"sf_dir": sf, "pq_vs_exact_l2": report_pq(spark, sf)}))
    print(json.dumps({
        "fixture": "clustered_mog_n2000_dim64_k8",
        "recall_at_3": report_clustered(spark),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
