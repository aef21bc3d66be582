"""Frozen quality-classifier model for the GRADED scoring path.

Produced by ``python tools/train_qc_frozen.py`` (hashed-n-gram
logistic regression, operators/quality_classifier.py): trained on the
sf0.001 documents corpus with labels = top half by the heuristic
quality score (284/500 good, threshold 1.0), dim=128, ngrams=2,
epochs=40, lr=1.0, hash_fn='md5' (the engine-portable 60-bit scheme,
operators/dedup.py:89).

The weights are QUANTIZED to 6 decimal places: scoring sums them in
exact integer micro-units, so a document's score is bit-identical on
any cluster shape and recomputable in DuckDB (the qc_* graded columns
of docs_sample_split). Training itself stays NumPy-parity-tested
(tests/test_quality_classifier.py) — it is order-dependent double
math and is NOT the graded artifact; these literals are.

dim=128 is deliberately tiny: this model exists to grade the scoring
path end-to-end (featurize -> hash -> gather -> dot product ->
threshold), not to win a quality benchmark. The production path uses
dim=2^18 and hash_fn='xxhash64'.
"""

from __future__ import annotations

QC_FROZEN_DIM = 128
QC_FROZEN_NGRAMS = 2
QC_FROZEN_BIAS6 = -1.833474
QC_FROZEN_W6 = [
    0.326683, 0.477332, 0.379232, 0.536055, -0.301983, 0.823849, 0.424835, -0.655314,
    0.408607, -0.248389, 0.631745, 0.433719, 0.143678, 0.384892, 0.407247, 0.451483,
    0.496221, -0.250974, 0.210536, 0.085811, 0.542877, 0.374128, 0.534072, -1.072939,
    -0.16492, 0.801575, 0.177687, 0.396929, 0.359546, 0.078813, 0.537424, 0.197897,
    0.185281, -0.192724, -1.048845, 0.482593, -0.353719, 0.287272, 0.159609, 0.389772,
    0.422763, 0.15984, 0.599014, 0.450576, 0.134044, 0.33239, -0.615169, 0.208607,
    0.688058, 0.244336, 0.355925, 0.448728, -0.835388, 0.585803, 0.082156, 0.210677,
    0.361334, 0.255358, -0.155529, 0.193257, 0.537416, 0.474344, 0.49249, -0.480052,
    -0.494251, 0.199557, 0.388685, 0.308411, 0.165093, 0.430298, 0.413435, 0.658149,
    0.596015, 0.595649, -0.223745, 0.492326, 0.567419, 0.426311, 0.364928, 0.296261,
    0.501855, -0.225789, -0.298534, 0.112397, 0.233821, 0.709854, 0.522198, 0.634602,
    0.38409, -0.331537, 0.280502, 0.117526, 0.323685, -0.088388, 0.369564, 0.474654,
    0.348155, 0.424179, -0.528335, 0.461533, 0.583849, 0.275346, 0.100982, 0.518337,
    0.284933, -1.083577, -1.198941, 0.5055, -0.325014, -0.264202, 0.47551, 0.498429,
    0.20106, 0.192679, 0.044886, -0.410923, 0.24818, -0.01344, 0.475491, 0.658255,
    0.516018, 0.255802, 0.378337, 0.313183, 0.504096, 0.191965, 0.594541, 0.476348,
]

# integer micro-units (w * 1e6) — the exact-arithmetic form both the
# Spark scorer and the DuckDB oracle sum (long addition is associative;
# rounded-double addition is not)
QC_FROZEN_W_MICRO = [int(round(w * 1e6)) for w in QC_FROZEN_W6]
QC_FROZEN_BIAS_MICRO = int(round(QC_FROZEN_BIAS6 * 1e6))
