"""Vectorized RealAdaBoost stump-ensemble scoring.

Spark-first replacement for the reference's Boost predictor
(``/root/reference/ml.c:527-612`` predictTrees: walk 100 depth-1 trees,
``val <= split.c -> left else right``, sum leaf values; wrapper predict_ml
ml.c:681-691) and the logistic correction applied by the cascade
(``erfilter.c:201-215`` evalNM1, ``erfilter.c:218-233`` evalNM2).

The model is *data*: arrays ``(var, le, left_val, right_val)`` of shape
(n_stumps,), broadcast once per executor (SURVEY.md §2.4 C3) and evaluated
over the whole Arrow batch with numpy — zero per-row Python.

Sign convention: we use ``p = 1/(1+exp(-2*votes))`` so positive votes mean
"content".  The reference uses the mirrored form ``1 - 1/(1+exp(-2*votes))``
(erfilter.c:214) because OpenCV's NM models were trained with the character
class negative; the mapping is votes -> -votes, semantics identical.
"""

from __future__ import annotations

import numpy as np


class StumpModel:
    """Columnar stump ensemble. Feature matrix X is (n_rows, n_features)."""

    __slots__ = ("var", "le", "left_val", "right_val", "n_features")

    def __init__(self, var, le, left_val, right_val, n_features: int) -> None:
        self.var = np.asarray(var, dtype=np.int32)
        self.le = np.asarray(le, dtype=np.float64)
        self.left_val = np.asarray(left_val, dtype=np.float64)
        self.right_val = np.asarray(right_val, dtype=np.float64)
        self.n_features = n_features

    @classmethod
    def from_rows(cls, rows, n_features: int) -> "StumpModel":
        """rows: iterable of dicts with var/le/left_val/right_val."""
        rows = list(rows)
        return cls(
            [r["var"] for r in rows],
            [r["le"] for r in rows],
            [r["left_val"] for r in rows],
            [r["right_val"] for r in rows],
            n_features,
        )

    def to_rows(self, stage: int) -> list[dict]:
        return [
            {
                "stage": stage,
                "tree_id": i,
                "var": int(self.var[i]),
                "le": float(self.le[i]),
                "left_val": float(self.left_val[i]),
                "right_val": float(self.right_val[i]),
            }
            for i in range(len(self.var))
        ]

    def votes(self, X: np.ndarray) -> np.ndarray:
        """Sum of stump leaf values per row; vectorized over rows AND stumps.

        Equivalent relational plan (the oracle shadow, SURVEY.md §2.4 C3):
        rows CROSS JOIN broadcast(stumps) -> CASE WHEN x[var] <= le THEN
        left ELSE right END -> groupBy(row).sum().
        """
        X = np.asarray(X, dtype=np.float64)
        if X.ndim == 1:
            X = X[None, :]
        vals = X[:, self.var]                      # (n_rows, n_stumps)
        return np.where(vals <= self.le, self.left_val, self.right_val).sum(axis=1)

    def probability(self, X: np.ndarray) -> np.ndarray:
        """Logistic correction of the summed votes (evalNM1/2 analog)."""
        v = self.votes(X)
        return 1.0 / (1.0 + np.exp(-2.0 * v))
