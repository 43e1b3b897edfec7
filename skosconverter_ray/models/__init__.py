"""Tiny in-engine model artifacts (T3: the GPU-shaped stateful-scorer
slot, SURVEY.md §2.3).

No ML framework is installable in this environment, so the "model" is
a numpy MLP whose weights are a REAL trained artifact: built by
``tools/train_mention_scorer.py`` (deterministic seed, training data
from the pinned generator corpus), committed as ``.npz``, loaded ONCE
per actor / worker process in the stage's ``__init__``/resolve step,
and applied per batch as one matmul — exactly the load-once /
score-batched shape a real GPU scorer would use.
"""

from __future__ import annotations

import os

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
MENTION_SCORER_PATH = os.path.join(_DIR, "mention_scorer.npz")

# feature layout shared by training and inference — keep in sync with
# tools/train_mention_scorer.py
FEATURE_SPEC = ("is_pref", "is_alt", "is_hidden",
                "n_tokens", "n_chars_x10", "coverage")
_KIND_COL = {"pref": 0, "alt": 1, "hidden": 2}


def mention_features(kinds, surfaces, span_norm_lens) -> np.ndarray:
    """Vectorized (k x 6) feature matrix for mention candidates:
    label-kind one-hot, surface token count, surface char length / 10,
    and the fraction of the normalized span text the surface covers."""
    k = len(kinds)
    f = np.zeros((k, len(FEATURE_SPEC)), np.float64)
    if not k:
        return f
    for i, kind in enumerate(kinds):
        f[i, _KIND_COL[kind]] = 1.0
    n_chars = np.fromiter((len(s) for s in surfaces), np.float64, count=k)
    f[:, 3] = np.fromiter((s.count(" ") + 1 for s in surfaces),
                          np.float64, count=k)
    f[:, 4] = n_chars / 10.0
    lens = np.asarray(span_norm_lens, np.float64)
    f[:, 5] = n_chars / np.maximum(lens, 1.0)
    return f


class MentionScorer:
    """Numpy MLP (6 -> 16 tanh -> 1 sigmoid) over mention-candidate
    features. Weights load once from the committed artifact; scoring a
    batch is two matmuls."""

    def __init__(self, path: str = MENTION_SCORER_PATH):
        with np.load(path) as z:
            self.w1 = z["w1"]
            self.b1 = z["b1"]
            self.w2 = z["w2"]
            self.b2 = z["b2"]
            self.mu = z["mu"]
            self.sigma = z["sigma"]

    def predict(self, features: np.ndarray) -> np.ndarray:
        """(k x 6) features -> (k,) calibrated link scores in (0, 1)."""
        if not len(features):
            return np.zeros(0, np.float32)
        x = (features - self.mu) / self.sigma
        h = np.tanh(x @ self.w1 + self.b1)
        z = h @ self.w2 + self.b2
        return (1.0 / (1.0 + np.exp(-z))).ravel().astype(np.float32)
