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


# ---------------------------------------------------------------------------
# Distilled quality scorer (T3 over documents): the curation quality
# RULE distilled into a trained, integer-quantized linear model whose
# margin is bit-exactly reproducible in SQL.
# ---------------------------------------------------------------------------

QUALITY_SCORER_PATH = os.path.join(_DIR, "quality_scorer.npz")

# feature layout shared by training, inference, and the SQL oracle —
# every feature is an INTEGER both engines compute identically
QUALITY_FEATURES = ("n_chars", "n_tokens", "n_alpha", "n_stop")
_STOP_RE = r"\b(the|a|of|and|to|in|is)\b"
_TOK_RE = r"[a-z0-9]+"
_ALPHA_RE = r"[A-Za-z]"


def quality_features(texts) -> np.ndarray:
    """Texts -> (n, 4) int64 feature matrix, vectorized Arrow RE2
    kernels (count_substring_regex) so the engine and the DuckDB
    oracle (len(regexp_extract_all(...))) agree exactly."""
    import pyarrow as pa
    import pyarrow.compute as pc

    t = pa.array(list(texts), pa.string()) \
        if not isinstance(texts, (pa.Array, pa.ChunkedArray)) else texts
    low = pc.utf8_lower(t)
    f = np.empty((len(t), 4), np.int64)
    f[:, 0] = pc.utf8_length(t).to_numpy(zero_copy_only=False)
    f[:, 1] = pc.count_substring_regex(low, _TOK_RE) \
        .to_numpy(zero_copy_only=False)
    f[:, 2] = pc.count_substring_regex(t, _ALPHA_RE) \
        .to_numpy(zero_copy_only=False)
    f[:, 3] = pc.count_substring_regex(low, _STOP_RE) \
        .to_numpy(zero_copy_only=False)
    return f


class QualityScorer:
    """Actor-pool inference stage: integer weights load once per actor
    from the committed artifact; a batch scores as one integer matvec.
    margin_milli = f @ w + b (int64, exact — the SQL oracle recomputes
    it from the same committed weights); predicted = margin >= 0."""

    def __init__(self, path: str = QUALITY_SCORER_PATH):
        import pyarrow as pa  # noqa: F401  (worker import warm-up)

        with np.load(path) as z:
            self.w = z["w"].astype(np.int64)
            self.b = int(z["b"])

    def __call__(self, batch):
        import pyarrow as pa

        f = quality_features(batch["text"])
        margin = f @ self.w + self.b
        return pa.table({
            "doc_id": batch["doc_id"],
            "margin_milli": pa.array(margin, pa.int64()),
            "predicted": pa.array(margin >= 0),
        })
