"""Multimodal span processing: media columns as opaque references.

The interleaved input schema (BASELINE.json ``input_hint``) carries
media spans as ``(kind, media_ref)`` — a typed *reference* to bytes in
object storage, never inlined (SURVEY.md §7.3: "media_ref stays a
reference"). The Ray-side plumbing here is real and tested: schema,
actor-pool signature, batch sizing, output layout. The codec calls
themselves are STUBS — the image/audio libraries are not in this
container — with a deterministic fake behind ``fake=True`` so the
pipeline shape is exercisable end to end.

Pattern: each stage is a callable class for
``map_batches(Cls, concurrency=(m, n), batch_size=B)`` — expensive
setup (codec init, model load) happens once per actor in ``__init__``.
Media batches must stay SMALL (decoded frames are large): callers pass
``batch_size=32``-ish, unlike the 1-4k used for text stages.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

FEATURE_DIM = 16

MEDIA_FEATURES_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("span_idx", pa.int32()),
    ("kind", pa.string()),
    ("media_ref", pa.string()),
    ("feature", pa.list_(pa.float32(), FEATURE_DIM)),
])


def _fake_feature(media_ref: str, kind: str) -> np.ndarray:
    """Deterministic stand-in embedding: seeded by crc32(media_ref) so
    every worker computes the identical vector with no shared state."""
    seed = zlib.crc32(f"{kind}:{media_ref}".encode()) & 0x7FFFFFFF
    return np.random.RandomState(seed).rand(FEATURE_DIM).astype(np.float32)


class MediaFeatureExtractor:
    """Interleaved-documents batch -> one feature row per media span.

    ``__init__`` is where a real build loads the decoder + model once
    per actor; per-batch work is ``__call__``. ``fake=True`` (default
    in this sandbox) produces the deterministic stand-in features;
    ``fake=False`` raises NotImplementedError at the decode call —
    clearly marking the codec boundary for a real deployment.
    """

    def __init__(self, kinds: tuple = ("image", "audio", "video"),
                 fake: bool = True):
        self.kinds = set(kinds)
        self.fake = fake
        # real build: self.decoder = load_codec(); self.model = load_model()

    def _decode_and_embed(self, media_ref: str, kind: str) -> np.ndarray:
        if self.fake:
            return _fake_feature(media_ref, kind)
        raise NotImplementedError(
            "media decode requires image/audio libraries not present in "
            "this container; run with fake=True or install codecs")

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, span_idxs, kinds, refs, feats = [], [], [], [], []
        for doc_id, spans in zip(batch["doc_id"].to_pylist(),
                                 batch["spans"].to_pylist()):
            for si, span in enumerate(spans or []):
                if span["kind"] in self.kinds and span["media_ref"]:
                    doc_ids.append(doc_id)
                    span_idxs.append(si)
                    kinds.append(span["kind"])
                    refs.append(span["media_ref"])
                    feats.append(
                        self._decode_and_embed(span["media_ref"],
                                               span["kind"]))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.string()),
            "span_idx": pa.array(span_idxs, pa.int32()),
            "kind": pa.array(kinds, pa.string()),
            "media_ref": pa.array(refs, pa.string()),
            "feature": pa.array(
                [f.tolist() for f in feats],
                pa.list_(pa.float32(), FEATURE_DIM)),
        }, schema=MEDIA_FEATURES_SCHEMA)


class FrameSampler:
    """Video/audio spans -> fixed-rate frame sample rows (stubbed).

    Real build decodes and emits one row per sampled frame; the stub
    emits the deterministic frame *plan* (timestamps) so downstream
    scheduling/layout is testable without codecs.
    """

    def __init__(self, every_s: float = 2.0, max_frames: int = 8,
                 kinds: tuple = ("video", "audio")):
        self.every_s = every_s
        self.max_frames = max_frames
        self.kinds = set(kinds)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, refs, frame_ts = [], [], []
        for doc_id, spans in zip(batch["doc_id"].to_pylist(),
                                 batch["spans"].to_pylist()):
            for span in spans or []:
                if span["kind"] in self.kinds and span["media_ref"]:
                    # stub duration: deterministic from the ref
                    dur = 1.0 + (zlib.crc32(span["media_ref"].encode())
                                 % 300) / 10.0
                    n = min(self.max_frames, max(1, int(dur / self.every_s)))
                    for i in range(n):
                        doc_ids.append(doc_id)
                        refs.append(span["media_ref"])
                        frame_ts.append(round(i * self.every_s, 3))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.string()),
            "media_ref": pa.array(refs, pa.string()),
            "frame_ts": pa.array(frame_ts, pa.float64()),
        })


def extract_media_features(docs_ds, *, concurrency=(1, 4),
                           batch_size: int = 64, fake: bool = True):
    """Actor-pool feature extraction over interleaved documents."""
    return docs_ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
