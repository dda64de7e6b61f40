"""Regenerate (and cross-check) the frozen BPE merge table.

Trains operators.bpe.train_bpe_merges (DataFrame algebra) on the sf0.01
documents slice (doc_id < 300, n_merges=32), trains the pure-Python
reference on the same texts, asserts the two agree merge-for-merge, and
asserts the result equals the committed BPE_MERGES_V1 constant (drift
check — if this fails, either the corpus or the algorithm changed and
BOTH the constant and the bpe_tokenize_docs oracle need retraining).

Usage: python tools/train_bpe.py [sf_dir]   (prints the table literal)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from biosd_feature_annotator_spark.operators import bpe  # noqa: E402
from biosd_feature_annotator_spark.session import get_spark  # noqa: E402

N_MERGES = 32
SLICE = "doc_id < 300"


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(master="local[8]", app_name="train-bpe",
                      shuffle_partitions=8)
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet")).where(SLICE)
    spark_merges = bpe.train_bpe_merges(docs, n_merges=N_MERGES)
    texts = [r.text for r in docs.select("text").collect()]
    py_merges = bpe.py_train_bpe(texts, n_merges=N_MERGES)
    assert spark_merges == py_merges, (
        "DataFrame trainer diverged from the Python reference:\n"
        f"  spark: {spark_merges}\n  py:    {py_merges}"
    )
    print("BPE_MERGES_V1: list[tuple[str, str]] = [")
    for a, b in spark_merges:
        print(f"    ({a!r}, {b!r}),")
    print("]")
    if bpe.BPE_MERGES_V1:
        assert spark_merges == bpe.BPE_MERGES_V1, (
            "retrained table differs from the committed BPE_MERGES_V1 — "
            "update the constant AND the bpe_tokenize_docs oracle together"
        )
        print("# matches committed BPE_MERGES_V1 ✓")
    spark.stop()


if __name__ == "__main__":
    main()
