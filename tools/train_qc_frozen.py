"""Reproducibly train the FROZEN quality-classifier model whose
6dp-quantized weights are embedded in queries.py (the qc_* graded
columns of docs_sample_split).

Labels: the heuristic quality score's top half of the sf0.001
documents corpus (the same bootstrap-from-a-heuristic recipe CCNet
uses with Wikipedia as the "good" side). Featurization is the
engine-portable md5 scheme (hash_fn='md5') at dim=128 so the DuckDB
oracle can recompute the exact feature indices; dim is deliberately
tiny because the model exists to GRADE the scoring path, not to win a
quality benchmark (the production path scales dim to 2^18).

Training itself is order-dependent double math (the gradient sums),
so the frozen artifact is the QUANTIZED weights: once rounded to 6dp
and summed as DECIMALs, scoring is bit-identical on any cluster shape
and in DuckDB. Re-running this script on the same corpus reproduces
the same weights up to double-sum noise far below the 6dp quantum at
this scale; the committed literals are the contract either way (the
graded columns test scoring, and training stays NumPy-parity-tested
in tests/test_quality_classifier.py).

Usage: python tools/train_qc_frozen.py [sf_dir]  (default sf0.001)
Prints the QC_FROZEN_W6 / QC_FROZEN_BIAS6 literals to paste into
queries.py.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from globalweather_etl_spark.functions.text import quality_score
from globalweather_etl_spark.operators.quality_classifier import (
    train_quality_classifier,
)
from globalweather_etl_spark.session import get_spark
from globalweather_etl_spark.sources import load_table

DIM = 128
NGRAMS = 2
EPOCHS = 40
LR = 1.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    docs = load_table(spark, sf_dir, "documents")
    # label: top half by the heuristic quality score (ties -> good)
    q = docs.select(
        "doc_id", "text", F.round(quality_score(F.col("text")), 9).alias("q")
    )
    thr = q.agg(F.expr("percentile(q, 0.5)")).collect()[0][0]
    labeled = q.select(
        "doc_id", "text", (F.col("q") >= F.lit(thr)).cast("int").alias("y")
    )
    n_good = labeled.agg(F.sum("y")).collect()[0][0]
    n = labeled.count()
    print(f"# corpus {sf_dir}: {n} docs, {n_good} good, thr={thr}")
    model = train_quality_classifier(
        labeled, "doc_id", "text", "y",
        dim=DIM, ngrams=NGRAMS, epochs=EPOCHS, lr=LR, hash_fn="md5",
    )
    w6 = [round(float(x), 6) for x in model.weights]
    b6 = round(float(model.bias), 6)
    print(f"QC_FROZEN_DIM = {DIM}")
    print(f"QC_FROZEN_BIAS6 = {b6}")
    print("QC_FROZEN_W6 = [")
    for i in range(0, DIM, 8):
        print("    " + ", ".join(f"{x}" for x in w6[i : i + 8]) + ",")
    print("]")
    spark.stop()


if __name__ == "__main__":
    main()
