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


def main() -> None:
    sfs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    spark = get_spark(master="local[8]", app_name="ann-recall",
                      shuffle_partitions=8)
    for sf in sfs:
        print(json.dumps({"sf_dir": sf, "recall_at_3": report(spark, sf)}))
    spark.stop()


if __name__ == "__main__":
    main()
