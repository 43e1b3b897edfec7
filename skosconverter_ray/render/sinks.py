"""The four reference sinks — CSV, Markdown, Confluence XML, JSON —
plus Turtle/N-Triples, re-expressed as vectorized render stages over
the ordered ``tree_rows`` IR (reference writers: to_notion_csv 764-888,
to_notion_markdown 890-1041, to_xml 1043-1170, to_notion_json
1172-1280, export_turtle 1551-1583 in skos_converter.py).

Each sink is ``tree_rows -> map_batches(render) -> ordered text``.
Ordering on a distributed engine: tree_rows is globally sorted on
``sort_key``; ``iter_batches`` yields blocks in dataset order, so the
driver (or a per-partition shard writer + manifest-ordered concat at
scale) streams lines out in exact reference order. The JSON sink nests
children with a driver-side stack over the sorted stream — the render
stream is dimension-sized (one row per vocabulary concept).

Format decisions recorded against reference defects:
- Markdown heading depth = tree level + 1 (H1 scheme, H2 top concept,
  H3+ children) so the documented reverse grammar (H1/H2/H3+,
  skos_converter.py:1958-1967) round-trips; metadata order
  Notation→Definition→AltLabels→URI→SameAs→Related (984-1002) with
  two-space soft-breaks on every metadata line except ``_URI:_``
  (quirk at 995, preserved).
- The engine writes ``_URI:_`` and *parses* all three URI spellings
  (``_URI:_``, ``**URI:**``, ``<sub>URI:``) — reference defect D3.
"""

from __future__ import annotations

import csv as _csv
import io
import json

import pyarrow as pa

from ..functions.text import sanitize_id_array, xml_escape_array  # noqa: F401


def _rows(tree_rows_ds):
    """Stream ordered rows to the driver as dicts."""
    for b in tree_rows_ds.iter_batches(batch_format="pyarrow",
                                       batch_size=8192):
        for r in b.to_pylist():
            yield r


# ---------------------------------------------------------------------------
# CSV (S4; golden layout FIXTURES.md §4)
# ---------------------------------------------------------------------------

CSV_HEADER = ["Title", "Parent", "Concept Scheme", "Definition",
              "Alternative Labels", "Notation", "URI", "Level"]


def csv_line_batch(batch: pa.Table) -> pa.Table:
    """tree_rows batch -> one CSV line per row (vectorizable render)."""
    out = []
    for r in batch.to_pylist():
        buf = io.StringIO()
        w = _csv.writer(buf, lineterminator="")
        w.writerow([
            "  " * r["level"] + r["title"],
            r["parent"], r["scheme"], r["definition"], r["alt_labels"],
            r["notation"], r["uri"], r["level"],
        ])
        out.append(buf.getvalue())
    return pa.table({"sort_key": batch["sort_key"],
                     "line": pa.array(out, pa.string())})


def to_csv_text(tree_rows_ds) -> str:
    lines = [",".join(CSV_HEADER)]
    for b in tree_rows_ds.map_batches(
            csv_line_batch, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=8192):
        lines.extend(b["line"].to_pylist())
    return "\n".join(lines) + "\n"


# ---------------------------------------------------------------------------
# Markdown (S5)
# ---------------------------------------------------------------------------

def _md_heading(level: int, title: str) -> str:
    """Reference heading shape (skos_converter.py:959-973, live code):
    visual indicators ▸/▹/◦ at heading depths 4/5/6, and a bold-indent
    fallback past H6 (markdown has no H7)."""
    if level <= 6:
        prefix = ""
        if level == 4:
            prefix = "▸ "
        elif level == 5:
            prefix = "▹ "
        elif level >= 6:
            prefix = "◦ "
        return "#" * min(level, 6) + " " + prefix + title
    indent = "  " * (level - 6)
    return f"{indent}**◦ {title}**"


def markdown_block_batch(batch: pa.Table) -> pa.Table:
    out = []
    for r in batch.to_pylist():
        level = r["level"] + 1
        lines = [_md_heading(level, r["title"]), ""]
        if r["uri"]:  # synthetic containers carry no metadata
            if r["notation"]:
                lines.append(f"_Notation:_ `{r['notation']}`  ")
            if r["definition"]:
                lines.append(f"_Definition:_ {r['definition']}  ")
            if r["alt_labels"]:
                lines.append(f"_Alternative Labels:_ {r['alt_labels']}  ")
            lines.append(f"_URI:_ <{r['uri']}>")
            if r["same_as"]:
                refs = ", ".join(f"<{u}>" for u in r["same_as"].split(", "))
                lines.append(f"_Same as:_ {refs}  ")
            if r["related"]:
                refs = ", ".join(f"<{u}>" for u in r["related"].split(", "))
                lines.append(f"_Related:_ {refs}  ")
            lines.append("")
        out.append("\n".join(lines))
    return pa.table({"sort_key": batch["sort_key"],
                     "block": pa.array(out, pa.string())})


def to_markdown_text(tree_rows_ds) -> str:
    blocks = []
    for b in tree_rows_ds.map_batches(
            markdown_block_batch, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=8192):
        blocks.extend(b["block"].to_pylist())
    return "\n".join(blocks).rstrip("\n") + "\n"


# ---------------------------------------------------------------------------
# Confluence storage-format XML (S6; ref 1043-1170)
# ---------------------------------------------------------------------------

def _esc(s: str) -> str:
    """5-entity escape, reference spelling incl. &#39; for the
    apostrophe (skos_converter.py:1162-1170)."""
    return (s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            .replace('"', "&quot;").replace("'", "&#39;"))


def xml_block_batch(batch: pa.Table) -> pa.Table:
    out = []
    for r in batch.to_pylist():
        level = r["level"] + 1
        if level <= 6:
            heading = f"<h{level}>{_esc(r['title'])}</h{level}>"
        else:
            # >h6 bold-indent fallback (ref 1104-1110)
            indent = "&nbsp;" * ((level - 6) * 4)
            heading = f"<p>{indent}<strong>{_esc(r['title'])}</strong></p>"
        lines = [heading]
        if r["uri"]:
            # metadata order Definition -> Notation -> AltLabels
            # (ref 1113-1123; differs from the markdown order)
            if r["definition"]:
                lines.append(f"<p><em>Definition:</em> {_esc(r['definition'])}</p>")
            if r["notation"]:
                lines.append(f"<p><em>Notation:</em> <code>{_esc(r['notation'])}</code></p>")
            if r["alt_labels"]:
                lines.append(
                    f"<p><em>Alternative Labels:</em> {_esc(r['alt_labels'])}</p>")
            # URI as collapsible info panel (ref 1125-1133)
            lines.append(
                '<ac:structured-macro ac:name="info" ac:schema-version="1">')
            lines.append('<ac:parameter ac:name="title">URI</ac:parameter>')
            lines.append("<ac:rich-text-body>")
            lines.append(f"<p><code>{_esc(r['uri'])}</code></p>")
            lines.append("</ac:rich-text-body>")
            lines.append("</ac:structured-macro>")
        lines.append("")  # spacing between concepts (ref 1134)
        out.append("\n".join(lines))
    return pa.table({"sort_key": batch["sort_key"],
                     "block": pa.array(out, pa.string())})


def to_xml_text(tree_rows_ds) -> str:
    """Confluence storage-format envelope (ref 1050-1054): XML
    declaration + expand macro wrapper with title parameter."""
    blocks = []
    for b in tree_rows_ds.map_batches(
            xml_block_batch, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=8192):
        blocks.extend(b["block"].to_pylist())
    body = "\n".join(blocks)
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        "<ac:confluence-content>\n"
        '<ac:structured-macro ac:name="expand" ac:schema-version="1">\n'
        '<ac:parameter ac:name="title">SKOS Vocabulary</ac:parameter>\n'
        "<ac:rich-text-body>\n"
        + body + "\n"
        "</ac:rich-text-body>\n"
        "</ac:structured-macro>\n"
        "</ac:confluence-content>\n")


# ---------------------------------------------------------------------------
# JSON (S7; ref 1172-1280: nested children AND flat concepts list)
# ---------------------------------------------------------------------------

def to_json_obj(tree_rows_ds) -> dict:
    def san(u):
        return u.replace("/", "_").replace("#", "_")

    schemes, flat = [], []
    stack: list[tuple[int, dict]] = []  # (level, node)
    for r in _rows(tree_rows_ds):
        if not r["uri"] and r["title"].startswith("["):
            # container rows reset the stack to their level
            while stack and stack[-1][0] >= r["level"]:
                stack.pop()
            continue
        node = {
            "id": san(r["uri"]) if r["uri"] else "",
            "title": r["title"],
            "parent_id": "",
            "definition": r["definition"],
            "alternative_labels": [s for s in r["alt_labels"].split(", ") if s],
            "notation": r["notation"],
            "uri": r["uri"],
            "children": [],
        }
        if r["level"] == 0 and r["title"].startswith("[SCHEME]"):
            schemes.append({"id": san(r["uri"]), "title": r["title"][9:],
                            "uri": r["uri"], "children": node["children"]})
            stack = [(0, node)]
            continue
        while stack and stack[-1][0] >= r["level"]:
            stack.pop()
        if stack:
            parent = stack[-1][1]
            node["parent_id"] = parent["id"]
            parent["children"].append(node)
        flat.append({k: v for k, v in node.items() if k != "children"}
                    | {"children": node["children"]})
        stack.append((r["level"], node))
    return {"vocabulary": {"schemes": schemes, "concepts": flat}}


def to_json_text(tree_rows_ds) -> str:
    return json.dumps(to_json_obj(tree_rows_ds), indent=2,
                      ensure_ascii=False) + "\n"
