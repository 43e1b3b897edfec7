"""skosconverter_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch reimplementation of the *capabilities* of
proycon/skosConverter (reference at /root/reference/skos_converter.py)
as a distributed, streaming triple factory on Ray Data:

- input: tables of interleaved text+media documents
  ``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``
- batched mention detection + SKOS-aware entity linking on actor pools
- (subj, pred, obj) triple emission for the SKOS vocabulary the
  reference reads/writes (SURVEY.md §1.2)
- union-find canonicalization over owl:sameAs / skos:exactMatch
- hierarchy materialization + the four reference sinks (CSV, Markdown,
  JSON, Confluence XML) and Turtle/N-Triples round-trip
- inverse-relation consistency pass (broader⇔narrower,
  hasTopConcept⇔topConceptOf)
- large-scale training-data ops: dedup (exact/MinHash-LSH/SimHash),
  ANN similarity search, text quality analysis, multimodal stubs

Execution model: ``ray.data.Dataset`` pipelines, ``map_batches`` over
zero-copy Arrow batches, actor pools for stateful stages. Nothing in
this package calls ``ray.init()``.
"""

__version__ = "0.1.0"
