"""N-Triples subset reader/writer (SURVEY.md S1/S8, §4.3).

``rdflib`` is unavailable in this sandbox (and a whole-file DOM parser
is the wrong shape for streaming anyway), so the engine speaks a
line-oriented N-Triples subset covering exactly what the reference
emits and reads: absolute ``<uri>`` terms and literals with optional
``@lang`` tags (reference loaders skos_converter.py:548-582; serializer
1551-1583). One line per triple makes the format embarrassingly
block-parallel: ``read_text`` shards by line ranges and every batch
parses independently.
"""

from __future__ import annotations

import re

import pyarrow as pa

from .. import schemas

_LINE_RE = re.compile(
    r"^<(?P<s>[^>]*)>\s+<(?P<p>[^>]*)>\s+"
    r"(?:<(?P<o_uri>[^>]*)>|\"(?P<o_lit>(?:[^\"\\]|\\.)*)\""
    r"(?:@(?P<lang>[A-Za-z0-9-]+))?)\s*\.\s*$"
)


def _unescape(s: str) -> str:
    return (s.replace("\\\\", "\x00").replace('\\"', '"')
            .replace("\\n", "\n").replace("\\r", "\r").replace("\\t", "\t")
            .replace("\x00", "\\"))


def _escape(s: str) -> str:
    return (s.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t"))


def parse_lines_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Batch of N-Triples lines -> triples rows (bad lines dropped)."""
    rows = {k: [] for k in ("subj", "pred", "obj", "obj_is_literal",
                            "lang", "source_doc")}
    for line in batch[text_col].to_pylist():
        line = (line or "").strip()
        if not line or line.startswith("#"):
            continue
        m = _LINE_RE.match(line)
        if not m:
            continue
        rows["subj"].append(m["s"])
        rows["pred"].append(m["p"])
        if m["o_uri"] is not None:
            rows["obj"].append(m["o_uri"])
            rows["obj_is_literal"].append(False)
            rows["lang"].append(None)
        else:
            rows["obj"].append(_unescape(m["o_lit"]))
            rows["obj_is_literal"].append(True)
            rows["lang"].append(m["lang"])
        rows["source_doc"].append(None)
    return pa.table(
        {
            "subj": pa.array(rows["subj"], pa.string()),
            "pred": pa.array(rows["pred"], pa.string()),
            "obj": pa.array(rows["obj"], pa.string()),
            "obj_is_literal": pa.array(rows["obj_is_literal"], pa.bool_()),
            "lang": pa.array(rows["lang"], pa.string()),
            "source_doc": pa.array(rows["source_doc"], pa.string()),
        },
        schema=schemas.TRIPLES,
    )


def read_ntriples(paths) -> "ray.data.Dataset":  # noqa: F821
    """Files of N-Triples -> triples Dataset (streaming, block-parallel)."""
    import ray.data as rd

    return rd.read_text(paths).map_batches(
        parse_lines_batch, batch_format="pyarrow")


def serialize_batch(batch: pa.Table) -> pa.Table:
    """triples rows -> one N-Triples line per row."""
    lines = []
    for r in batch.to_pylist():
        if r["obj_is_literal"]:
            obj = f'"{_escape(r["obj"])}"'
            if r.get("lang"):
                obj += f"@{r['lang']}"
        else:
            obj = f"<{r['obj']}>"
        lines.append(f"<{r['subj']}> <{r['pred']}> {obj} .")
    return pa.table({"line": pa.array(lines, pa.string())})


def to_ntriples_text(triples_ds) -> str:
    out = []
    for b in triples_ds.map_batches(
            serialize_batch, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=8192):
        out.extend(b["line"].to_pylist())
    return "\n".join(out) + ("\n" if out else "")


def write_ntriples(triples_ds, out_dir: str):
    """Sharded text sink: one .nt part per block (resumable layout)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    ds = triples_ds.map_batches(serialize_batch, batch_format="pyarrow")

    def write_block(batch: pa.Table) -> pa.Table:
        import uuid

        part = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.nt")
        with open(part, "w") as f:
            f.write("\n".join(batch["line"].to_pylist()) + "\n")
        return pa.table({"path": pa.array([part], pa.string()),
                         "rows": pa.array([batch.num_rows], pa.int64())})

    return ds.map_batches(write_block, batch_format="pyarrow",
                          batch_size=65536)
