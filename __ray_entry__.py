"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB. Nothing here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 + a deterministic
    synthetic interleaved corpus: docs -> mention detection / entity
    linking -> triple emission -> canonicalization -> inverse-consistent
    canonical graph. Returns the graph Dataset."""
    import ray.data as rd

    from skosconverter_ray import corpus, vocab
    from skosconverter_ray.pipelines.flagship import run_flagship

    voc = vocab.generate_vocab(vocab.VocabSpec(n_schemes=2, n_concepts=60, seed=42))
    synthetic = corpus.documents_dataset(500, voc, seed=42, override_num_blocks=8)
    flat = corpus.from_flat_documents(
        rd.read_parquet(f"{SF0001}/documents.parquet", columns=["doc_id", "text"]))
    docs = synthetic.union(flat)
    out = run_flagship(docs, voc.triples,
                       preferred_ns="http://example.org/vocab/",
                       batch_size=256)
    return out["graph"]


def queries() -> dict[str, Callable[[str], Any]]:
    from skosconverter_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from skosconverter_ray.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
