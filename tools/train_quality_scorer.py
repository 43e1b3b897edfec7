"""Build-time trainer for the distilled quality scorer (T3 slot over
documents).

Distills the curation quality RULE (n_chars >= 20 AND alpha_ratio >=
0.5) into a linear model: deterministic synthetic corpus (clean word
docs, symbol floods, digit floods, truncated stubs, mixed cases),
labels from the rule, logistic regression by full-batch gradient
descent on standardized features, then the standardization is folded
into the weights and QUANTIZED to integer milli-units so the margin is
bit-exactly reproducible in SQL. Writes
skosconverter_ray/models/quality_scorer.npz and prints held-out
accuracy (pre- and post-quantization; asserts >= 0.95).

Run: python tools/train_quality_scorer.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from skosconverter_ray.models import (  # noqa: E402
    QUALITY_FEATURES,
    QUALITY_SCORER_PATH,
    quality_features,
)

SEED = 42
WORDS = ("table query row scan batch merge value part key line sort "
         "window group order data column the of and to in is a").split()
SYMS = list("!?#$%&*@^~|\\/<>[]{}()+=;:,.")


def synth_docs(n: int, rng: np.random.RandomState) -> list[str]:
    docs = []
    for i in range(n):
        kind = i % 5
        if kind == 0:  # clean prose
            k = rng.randint(8, 80)
            docs.append(" ".join(rng.choice(WORDS) for _ in range(k)))
        elif kind == 1:  # symbol flood (alpha ratio sinks)
            k = rng.randint(10, 60)
            toks = [rng.choice(WORDS) if rng.rand() < 0.25
                    else "".join(rng.choice(SYMS)
                                 for _ in range(rng.randint(1, 5)))
                    for _ in range(k)]
            docs.append(" ".join(toks))
        elif kind == 2:  # digit flood
            k = rng.randint(10, 60)
            toks = [rng.choice(WORDS) if rng.rand() < 0.3
                    else str(rng.randint(0, 10 ** 6)) for _ in range(k)]
            docs.append(" ".join(toks))
        elif kind == 3:  # truncated stub
            docs.append(" ".join(rng.choice(WORDS)
                                 for _ in range(rng.randint(1, 4)))
                        [:rng.randint(3, 25)])
        else:  # borderline mix
            k = rng.randint(5, 30)
            toks = [rng.choice(WORDS) if rng.rand() < 0.55
                    else rng.choice(SYMS) * rng.randint(1, 3)
                    for _ in range(k)]
            docs.append(" ".join(toks))
    return docs


def rule_labels(docs: list[str]) -> np.ndarray:
    y = np.empty(len(docs), np.float64)
    for i, t in enumerate(docs):
        alpha = sum(c.isalpha() for c in t)
        y[i] = float(len(t) >= 20 and alpha >= 0.5 * max(len(t), 1))
    return y


def main() -> None:
    rng = np.random.RandomState(SEED)
    docs = synth_docs(6000, rng)
    y = rule_labels(docs)
    f = quality_features(docs).astype(np.float64)

    n_tr = 5000
    mu, sd = f[:n_tr].mean(axis=0), f[:n_tr].std(axis=0) + 1e-9
    x = (f - mu) / sd

    w = np.zeros(f.shape[1])
    b = 0.0
    lr = 0.5
    for _ in range(3000):
        z = x[:n_tr] @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y[:n_tr]
        w -= lr * (x[:n_tr].T @ g) / n_tr
        b -= lr * g.mean()

    # fold standardization into raw-feature weights, quantize to milli
    w_raw = w / sd
    b_raw = b - float(mu @ w_raw)
    w_int = np.round(w_raw * 1000).astype(np.int64)
    b_int = int(round(b_raw * 1000))

    acc_f = ((x @ w + b >= 0) == (y > 0.5)).mean()
    margin = f.astype(np.int64) @ w_int + b_int
    acc_q = ((margin >= 0) == (y > 0.5))[n_tr:].mean()
    print(f"features={QUALITY_FEATURES}")
    print(f"float acc (all)     = {acc_f:.4f}")
    print(f"quantized acc (held-out) = {acc_q:.4f}")
    print(f"w_int={w_int.tolist()} b_int={b_int}")
    assert acc_q >= 0.95, "quantized model too weak to ship"

    np.savez(QUALITY_SCORER_PATH, w=w_int, b=np.int64(b_int),
             features=np.array(QUALITY_FEATURES))
    print(f"wrote {QUALITY_SCORER_PATH}")


if __name__ == "__main__":
    main()
