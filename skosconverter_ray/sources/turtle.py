"""Turtle subset reader (SURVEY.md S1; rdflib unavailable, §4.3).

Covers what SKOS vocabularies in the wild and the reference's own
serializer produce (skos_converter.py:548-564 reads via rdflib;
1551-1583 writes rdflib turtle): ``@prefix``/``PREFIX`` declarations,
prefixed names, ``a`` for rdf:type, ``;`` predicate lists, ``,`` object
lists, plain/long literals with optional ``@lang`` tags, comments.
Datatyped literals keep their lexical form (the reference never reads
datatypes).

Parallelism shape: Turtle is stateful per FILE (prefix table +
statement continuations), so the file is the parallel unit — exactly
the reference's batch-directory granularity (S9). Each file parses
independently inside ``map_batches``; triples stream out as Arrow rows.
"""

from __future__ import annotations

import re

import pyarrow as pa

from .. import schemas

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_PREFIX_RE = re.compile(
    r"^\s*@?[Pp][Rr][Ee][Ff][Ii][Xx]\s+([A-Za-z0-9_-]*):\s*<([^>]*)>\s*\.?\s*$")
_BASE_RE = re.compile(r"^\s*@?[Bb][Aa][Ss][Ee]\s+<([^>]*)>\s*\.?\s*$")

# one term at the head of the remaining text
_TERM_RE = re.compile(
    r"""\s*(?:
        <(?P<uri>[^>]*)>
      | (?P<a>a)(?=[\s;,.\])])
      | _:(?P<bnode>[A-Za-z0-9_][A-Za-z0-9_.-]*)
      | (?P<bool>true|false)(?=[\s;,.\])])
      | (?P<num>[+-]?(?:\d*\.\d+|\d+)(?:[eE][+-]?\d+)?)(?=[\s;,\])]|\.\s|\.$)
      | (?P<pfx>[A-Za-z][A-Za-z0-9_.-]*)?:(?P<local>[A-Za-z0-9_.%-]*)
      | \"\"\"(?P<long>(?:[^"\\]|\\.|"(?!""))*)\"\"\"
      | \"(?P<lit>(?:[^"\\]|\\.)*)\"
    )
    (?:\^\^(?:<[^>]*>|[A-Za-z][A-Za-z0-9_.-]*:[A-Za-z0-9_.-]*))?
    (?:@(?P<lang>[A-Za-z0-9-]+))?
    """, re.VERBOSE | re.DOTALL)

_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_RDF_FIRST, _RDF_REST, _RDF_NIL = (_RDF_NS + "first", _RDF_NS + "rest",
                                   _RDF_NS + "nil")

_UNESC = {"\\n": "\n", "\\r": "\r", "\\t": "\t", '\\"': '"', "\\\\": "\\"}


def _unescape(s: str) -> str:
    return re.sub(r"\\[nrt\"\\]", lambda m: _UNESC[m.group(0)], s)


def _strip_comments(text: str) -> str:
    """Drop # comments outside quoted literals AND <...> IRIs (most
    namespace IRIs end in '#').

    Quote state persists ACROSS lines: a ``\"\"\"long literal\"\"\"``
    may span newlines, and a '#' inside it is literal text — the old
    per-line scan silently truncated such literals, violating the
    parser's loud-error-over-silent-loss policy. Single-quoted
    literals reset at end-of-line (an unterminated quote is a syntax
    error the term parser will surface)."""
    out: list[str] = []
    i, n = 0, len(text)
    in_q = in_long = in_uri = False
    while i < n:
        c = text[i]
        if in_long:
            if c == "\\" and i + 1 < n:
                out.append(text[i:i + 2])
                i += 2
                continue
            if text.startswith('"""', i):
                out.append('"""')
                i += 3
                in_long = False
                continue
            out.append(c)
            i += 1
            continue
        if in_q:
            if c == "\\" and i + 1 < n:
                out.append(text[i:i + 2])
                i += 2
                continue
            if c == '"' or c == "\n":
                in_q = False
            out.append(c)
            i += 1
            continue
        if in_uri:
            if c == ">" or c == "\n":
                in_uri = False
            out.append(c)
            i += 1
            continue
        if text.startswith('"""', i):
            out.append('"""')
            i += 3
            in_long = True
            continue
        if c == '"':
            in_q = True
        elif c == "<":
            in_uri = True
        elif c == "#":
            while i < n and text[i] != "\n":
                i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def parse_turtle_doc(text: str, *, bnode_prefix: str = "_:") -> list[tuple]:
    """One Turtle document -> [(subj, pred, obj, is_literal, lang)].

    Recursive descent over statements. Blank nodes are first-class
    (rdflib reads them for the reference, skos_converter.py:548-564):
    labels ``_:name`` keep their label, anonymous ``[ p o ; ... ]``
    property lists mint ``genN`` nodes, ``( a b c )`` collections
    desugar to rdf:first/rdf:rest/rdf:nil chains. All blank-node ids
    get ``bnode_prefix`` prepended — callers that union many files
    pass a per-document prefix so graph-scoped labels can never
    collide across files. Numeric and boolean literals parse as plain
    literals (lexical form kept, like datatyped strings). Anything
    else still raises ValueError — a loud per-file error record over
    silent triple loss.
    """
    prefixes: dict[str, str] = {}
    triples: list[tuple] = []
    body_lines = []
    for line in _strip_comments(text).splitlines():
        m = _PREFIX_RE.match(line)
        if m:
            prefixes[m.group(1)] = m.group(2)
            continue
        if _BASE_RE.match(line):
            continue
        body_lines.append(line)
    body = "\n".join(body_lines)
    n = len(body)
    gen = iter(range(1 << 30))

    def new_bnode() -> str:
        return f"{bnode_prefix}gen{next(gen)}"

    def expand(m: re.Match):
        if m["uri"] is not None:
            return ("uri", m["uri"], None)
        if m["a"] is not None:
            return ("uri", _RDF_TYPE, None)
        if m["bnode"] is not None:
            return ("uri", bnode_prefix + m["bnode"], None)
        if m["bool"] is not None:
            return ("lit", m["bool"], None)
        if m["num"] is not None:
            return ("lit", m["num"], None)
        if m["local"] is not None and (m["pfx"] is not None
                                       or ":" in m.group(0)):
            pfx = m["pfx"] or ""
            if pfx not in prefixes:
                raise ValueError(f"undeclared prefix {pfx!r}")
            return ("uri", prefixes[pfx] + m["local"], None)
        lit = m["long"] if m["long"] is not None else m["lit"]
        return ("lit", _unescape(lit), m["lang"])

    def skip_ws(pos: int) -> int:
        while pos < n and body[pos].isspace():
            pos += 1
        return pos

    def parse_node(pos: int, *, as_subject: bool = False):
        """One node (atomic term, [..] property list, (..) collection)
        -> (kind, value, lang, new_pos)."""
        pos = skip_ws(pos)
        if pos < n and body[pos] == "[":
            node = new_bnode()
            pos = skip_ws(pos + 1)
            if pos < n and body[pos] == "]":       # [] — empty bnode
                return ("uri", node, None, pos + 1)
            pos = skip_ws(parse_po_list(node, pos))
            if pos >= n or body[pos] != "]":
                raise ValueError(f"unclosed '[' at offset {pos}: "
                                 f"{body[pos:pos+40]!r}")
            return ("uri", node, None, pos + 1)
        if pos < n and body[pos] == "(":
            pos = skip_ws(pos + 1)
            items: list[tuple] = []
            while pos < n and body[pos] != ")":
                kind, val, lang, pos = parse_node(pos)
                items.append((kind, val, lang))
                pos = skip_ws(pos)
            if pos >= n:
                raise ValueError("unclosed '(' collection")
            pos += 1
            if not items:
                return ("uri", _RDF_NIL, None, pos)
            cells = [new_bnode() for _ in items]
            for i, (kind, val, lang) in enumerate(items):
                triples.append((cells[i], _RDF_FIRST, val,
                                kind == "lit", lang))
                rest = cells[i + 1] if i + 1 < len(items) else _RDF_NIL
                triples.append((cells[i], _RDF_REST, rest, False, None))
            return ("uri", cells[0], None, pos)
        m = _TERM_RE.match(body, pos)
        if not m:
            what = "subject" if as_subject else "object"
            raise ValueError(f"expected {what} at offset {pos}: "
                             f"{body[pos:pos+40]!r}")
        kind, val, lang = expand(m)
        if as_subject and kind == "lit":
            raise ValueError(f"literal subject at offset {pos}: "
                             f"{body[pos:pos+40]!r}")
        return (kind, val, lang, m.end())

    def parse_po_list(subj: str, pos: int) -> int:
        """predicate-object list for ``subj`` until '.', ']' or EOF;
        returns the position of that terminator."""
        while True:
            pos = skip_ws(pos)
            m = _TERM_RE.match(body, pos)
            if not m:
                raise ValueError(f"expected predicate at offset {pos}: "
                                 f"{body[pos:pos+40]!r}")
            pkind, pred, _ = expand(m)
            if pkind == "lit":
                raise ValueError(f"literal predicate at offset {pos}: "
                                 f"{body[pos:pos+40]!r}")
            pos = m.end()
            while True:  # object lists (,)
                okind, obj, lang, pos = parse_node(pos)
                triples.append((subj, pred, obj, okind == "lit", lang))
                pos = skip_ws(pos)
                if pos < n and body[pos] == ",":
                    pos += 1
                    continue
                break
            if pos < n and body[pos] == ";":
                pos = skip_ws(pos + 1)
                if pos < n and body[pos] in ".]":  # trailing ';'
                    return pos
                continue
            return pos

    pos = 0
    while True:
        pos = skip_ws(pos)
        if pos >= n:
            break
        was_anon = pos < n and body[pos] == "["
        kind, subj, _, pos = parse_node(pos, as_subject=True)
        del kind
        pos = skip_ws(pos)
        # '[ p o ] .' as a whole statement: the property list already
        # emitted its triples, a bare '.' may follow immediately
        if not (was_anon and pos < n and body[pos] == "."):
            pos = parse_po_list(subj, pos)
        if pos >= n or body[pos] != ".":
            raise ValueError(f"expected '.' at offset {pos}: "
                             f"{body[pos:pos+40]!r}")
        pos += 1
    return triples


def triples_to_table(rows: list[tuple], source_doc: str | None) -> pa.Table:
    return pa.table(
        {
            "subj": pa.array([r[0] for r in rows], pa.string()),
            "pred": pa.array([r[1] for r in rows], pa.string()),
            "obj": pa.array([r[2] for r in rows], pa.string()),
            "obj_is_literal": pa.array([r[3] for r in rows], pa.bool_()),
            "lang": pa.array([r[4] for r in rows], pa.string()),
            "source_doc": pa.array([source_doc] * len(rows), pa.string()),
        },
        schema=schemas.TRIPLES,
    )


def parse_turtle_dataset(docs_ds, *, text_col: str = "text",
                         id_col: str = "doc_id"):
    """(doc_id, text) Dataset of Turtle documents -> triples Dataset.
    Per-file errors become zero rows + a warning (batch-directory
    continue-on-error semantics, ref skos_converter.py:497-499)."""

    def parse(batch: pa.Table) -> pa.Table:
        import logging

        tables = []
        for doc_id, text in zip(batch[id_col].to_pylist(),
                                batch[text_col].to_pylist()):
            try:
                # per-document bnode prefix: graph-scoped labels from
                # different files must never collide in the union
                tables.append(triples_to_table(
                    parse_turtle_doc(text or "",
                                     bnode_prefix=f"_:{doc_id}#"),
                    doc_id))
            except ValueError as e:
                logging.getLogger(__name__).warning(
                    "turtle parse failed for %s: %s", doc_id, e)
        if not tables:
            return schemas.TRIPLES.empty_table()
        return pa.concat_tables(tables)

    return docs_ds.map_batches(parse, batch_format="pyarrow")


def read_turtle(paths):
    """Turtle file(s) -> triples Dataset (one parse task per file)."""
    import ray.data as rd

    def load(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["path"],
            "text": pa.array([b.decode("utf-8", "replace") if b else ""
                              for b in batch["bytes"].to_pylist()],
                             pa.string()),
        })

    files = rd.read_binary_files(paths, include_paths=True)
    return parse_turtle_dataset(
        files.map_batches(load, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# Turtle writer (S8 — the reference exports turtle via rdflib,
# skos_converter.py:1551-1583)
# ---------------------------------------------------------------------------

_DEFAULT_PREFIXES = {
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
}

_LOCAL_OK = re.compile(r"^[A-Za-z0-9_.-]+$")


def _compact(uri: str, prefixes: dict[str, str]) -> str:
    for pfx, ns in prefixes.items():
        if uri.startswith(ns):
            local = uri[len(ns):]
            if _LOCAL_OK.match(local):
                return f"{pfx}:{local}"
    return f"<{uri}>"


def _ttl_escape(s: str) -> str:
    return (s.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t"))


def serialize_turtle_batch(batch: pa.Table,
                           prefixes: dict[str, str]) -> pa.Table:
    """triples rows -> one compacted Turtle statement line per row.
    Line-per-triple keeps the sink embarrassingly parallel; prefix
    headers are prepended by the caller (to_turtle_text) or written
    once per shard."""
    lines = []
    for r in batch.to_pylist():
        s = _compact(r["subj"], prefixes)
        p = _compact(r["pred"], prefixes)
        if r["obj_is_literal"]:
            o = f'"{_ttl_escape(r["obj"])}"'
            if r.get("lang"):
                o += f"@{r['lang']}"
        else:
            o = _compact(r["obj"], prefixes)
        lines.append(f"{s} {p} {o} .")
    return pa.table({"line": pa.array(lines, pa.string())})


def to_turtle_text(triples_ds, *, prefixes: dict[str, str] | None = None,
                   extra_prefixes: dict[str, str] | None = None) -> str:
    """triples Dataset -> one Turtle document string (header + body)."""
    pfx = dict(_DEFAULT_PREFIXES if prefixes is None else prefixes)
    if extra_prefixes:
        pfx.update(extra_prefixes)
    header = [f"@prefix {k}: <{v}> ." for k, v in sorted(pfx.items())]
    body = []
    ds = triples_ds.map_batches(
        lambda b: serialize_turtle_batch(b, pfx), batch_format="pyarrow")
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
        body.extend(b["line"].to_pylist())
    return "\n".join(header) + "\n\n" + "\n".join(body) + "\n"
