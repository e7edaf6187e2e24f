"""In-engine trained quality classifier (U5 + "model in the engine"
family, alongside k-means in operators/similarity.py): batch-gradient
logistic regression where each training iteration is ONE map-side-
combinable aggregate over the corpus and the weight vector is
model-sized driver state — the fastText-style "train a tiny quality
classifier on your own corpus" curation step, with no ML library.

Cross-engine determinism: the gradient aggregate's double sums depend
on partition/accumulation order, so raw weights differ between engines
in the last ulps. Weights are therefore rounded to float32 after every
update (the same device as the f32 score policy and the 1e-4-rounded
Gumbel key): double-sum noise (~1e-13 relative) is far below f32
resolution (~6e-8), so Spark and a SQL engine replaying the same
unrolled iterations land on bit-identical weights, and the training
trajectory itself becomes hash-checkable. This is a probabilistic
guarantee, not an absolute one: if an iteration's true gradient
average happens to land WITHIN the ~1e-13 noise band of an f32
rounding boundary, the two engines can round to adjacent f32 values,
and because weights feed the next iteration the divergence compounds.
Treat a trajectory-hash mismatch as this rare boundary-straddle case
(re-pin the oracle or round more coarsely, e.g. fixed 1e-4 decimal
rounding where a sub-noise perturbation provably cannot flip the
rounded value) rather than as an engine bug.

Scale design (100 TB): per iteration one aggregate (partial aggregation
before the shuffle, 1 output row); driver state is len(features)+1
floats; scoring is pure column math at scan speed.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _logit(feature_cols: list[str], w: list[float]) -> Column:
    z = F.lit(float(w[0]))
    for wi, c in zip(w[1:], feature_cols):
        z = z + F.lit(float(wi)) * F.col(c)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def train_logreg(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_iter: int = 5,
    lr: float = 0.5,
) -> list[float]:
    """Batch-GD logistic regression; returns [bias, w_1..w_k] as
    float32-rounded Python floats. One corpus aggregate per iteration."""
    w = [0.0] * (len(feature_cols) + 1)
    for _ in range(n_iter):
        err = _logit(feature_cols, w) - F.col(label_col)
        aggs = [F.avg(err).alias("g0")] + [
            F.avg(err * F.col(c)).alias(f"g{i + 1}")
            for i, c in enumerate(feature_cols)
        ]
        g = df.agg(*aggs).first()
        w = [float(np.float32(wj - lr * g[j])) for j, wj in enumerate(w)]
    return w


def logreg_score(feature_cols: list[str], w: list[float]) -> Column:
    """Predicted probability column under trained weights."""
    return _logit(feature_cols, w)
