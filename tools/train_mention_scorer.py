"""Build-time trainer for the mention scorer artifact (T3 slot).

Deterministic end to end: training rows come from the pinned seed-42
generator corpus — positives are the generator's exact ground-truth
mentions, negatives are random non-label token windows from the same
documents (the "sloppy matcher candidate" shape) — and the numpy MLP
(6 -> 16 tanh -> 1 sigmoid) trains full-batch with a fixed seed.
Writes skosconverter_ray/models/mention_scorer.npz and prints held-out
accuracy/AUC. Run: python tools/train_mention_scorer.py
"""

from __future__ import annotations

import random
import sys

import numpy as np

sys.path.insert(0, ".")

from skosconverter_ray import corpus, vocab  # noqa: E402
from skosconverter_ray.functions.text import normalize_surface  # noqa: E402
from skosconverter_ray.models import (  # noqa: E402
    MENTION_SCORER_PATH,
    mention_features,
)

N_DOCS = 500
SEED = 42


def build_rows():
    voc = vocab.generate_vocab(vocab.VocabSpec(n_schemes=2, n_concepts=60,
                                               seed=SEED))
    label_surfaces = {normalize_surface(l) for l, _n, _u, _k in voc.labels}
    rng = random.Random(7)
    kinds, surfaces, span_lens, ys = [], [], [], []
    for idx in range(N_DOCS):
        _did, spans, mentions = corpus.generate_doc(idx, voc.labels, SEED)
        norm_texts = [normalize_surface(s["text"]) for s in spans]
        for si, surface, _uri, kind in mentions:
            kinds.append(kind)
            surfaces.append(normalize_surface(surface))
            span_lens.append(len(norm_texts[si]))
            ys.append(1.0)
        # negatives: random 1-3 token windows that are NOT label
        # surfaces, kind drawn at random (a false candidate carries a
        # kind claim too)
        for si, norm in enumerate(norm_texts):
            toks = norm.split(" ")
            if len(toks) < 3:
                continue
            for _ in range(2):
                w = rng.randint(1, 3)
                start = rng.randint(0, len(toks) - w)
                cand = " ".join(toks[start:start + w])
                if not cand or cand in label_surfaces:
                    continue
                kinds.append(rng.choice(["pref", "alt", "hidden"]))
                surfaces.append(cand)
                span_lens.append(len(norm))
                ys.append(0.0)
    x = mention_features(kinds, surfaces, span_lens)
    return x, np.asarray(ys)


def train(x, y, *, hidden=16, iters=2000, lr=0.05, seed=0):
    rng = np.random.default_rng(seed)
    mu = x.mean(axis=0)
    sigma = np.maximum(x.std(axis=0), 1e-6)
    xn = (x - mu) / sigma
    n, d = xn.shape
    w1 = rng.normal(0, 0.5, (d, hidden))
    b1 = np.zeros(hidden)
    w2 = rng.normal(0, 0.5, (hidden, 1))
    b2 = np.zeros(1)
    yv = y.reshape(-1, 1)
    for _ in range(iters):
        h = np.tanh(xn @ w1 + b1)
        p = 1.0 / (1.0 + np.exp(-(h @ w2 + b2)))
        g = (p - yv) / n                       # dL/dz2 (BCE + sigmoid)
        gw2 = h.T @ g
        gb2 = g.sum(axis=0)
        gh = (g @ w2.T) * (1 - h * h)
        gw1 = xn.T @ gh
        gb1 = gh.sum(axis=0)
        w2 -= lr * gw2
        b2 -= lr * gb2
        w1 -= lr * gw1
        b1 -= lr * gb1
    return {"w1": w1, "b1": b1, "w2": w2, "b2": b2,
            "mu": mu, "sigma": sigma}


def main():
    x, y = build_rows()
    # held-out split (deterministic): every 5th row is eval
    ev = np.arange(len(y)) % 5 == 0
    params = train(x[~ev], y[~ev])

    def predict(params, xq):
        xn = (xq - params["mu"]) / params["sigma"]
        h = np.tanh(xn @ params["w1"] + params["b1"])
        return (1.0 / (1.0 + np.exp(-(h @ params["w2"]
                                      + params["b2"])))).ravel()

    p = predict(params, x[ev])
    acc = float(((p >= 0.5) == (y[ev] >= 0.5)).mean())
    pos, neg = p[y[ev] == 1], p[y[ev] == 0]
    auc = float((pos[:, None] > neg[None, :]).mean())
    np.savez(MENTION_SCORER_PATH, **params)
    print(f"rows={len(y)} (pos={int(y.sum())}) "
          f"heldout acc={acc:.4f} auc={auc:.4f} -> {MENTION_SCORER_PATH}")


if __name__ == "__main__":
    main()
