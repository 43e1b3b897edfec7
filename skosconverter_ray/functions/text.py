"""String / URI / markup scalar functions, vectorized over Arrow arrays.

Re-expresses the reference's per-string helpers (SURVEY.md §2.8) as
pyarrow.compute kernels so they run inside ``map_batches`` without
Python-object rows: URI fragment normalization (skos_converter.py:72-77),
title cleaning (1385-1389), XML escaping (1162-1170), URI-tail label
fallback (394, 434), id sanitization (1193, 1236).
"""

from __future__ import annotations

import re
import uuid

import pyarrow as pa
import pyarrow.compute as pc

# Deterministic URI-minting namespace: replaces the reference's
# uuid.uuid4() minting (skos_converter.py:90), which would break
# idempotent distributed retries (SURVEY.md M2). Content-addressed:
# same label -> same URI on every worker, no shared state.
_URI_NS = uuid.uuid5(uuid.NAMESPACE_URL, "skosconverter-ray/uri-mint")

_TITLE_PREFIX_RE = r"^[\s▸▹◦\U0001F4C2\U0001F4C1\U0001F4C4]+"


def normalize_fragment_array(labels: pa.Array) -> pa.Array:
    """label -> URI fragment: strip non word/space/hyphen chars,
    whitespace -> '_', lowercase (ref: skos_converter.py:72-77)."""
    out = pc.replace_substring_regex(labels, r"[^\w\s-]", "")
    out = pc.utf8_trim_whitespace(out)
    out = pc.replace_substring_regex(out, r"\s+", "_")
    return pc.utf8_lower(out)


def normalize_fragment(label: str) -> str:
    frag = re.sub(r"[^\w\s-]", "", label).strip()
    return re.sub(r"\s+", "_", frag).lower()


def is_valid_uri(uri: str) -> bool:
    """M7 URI validator (ref skos_converter.py:1464-1482): length >= 3,
    a recognized scheme (http/https/urn/file or any '://' form), and
    constructible as an IRI — no whitespace or angle brackets (the
    practical failure modes of rdflib's URIRef constructor)."""
    if not uri or len(uri) < 3:
        return False
    if not (uri.startswith("http://") or uri.startswith("https://")
            or uri.startswith("urn:") or uri.startswith("file://")
            or "://" in uri):
        return False
    return not any(c.isspace() or c in "<>" for c in uri)


def mint_uri(namespace_uri: str, label: str) -> str:
    """Deterministic URI for a label: fragment if clean, else uuid5."""
    frag = normalize_fragment(label)
    if frag:
        return namespace_uri + frag
    return namespace_uri + str(uuid.uuid5(_URI_NS, label))


def clean_title_array(titles: pa.Array) -> pa.Array:
    """Strip tree-drawing / folder-emoji prefixes the Markdown writer
    adds (ref: skos_converter.py:1385-1389)."""
    return pc.utf8_trim_whitespace(
        pc.replace_substring_regex(titles, _TITLE_PREFIX_RE, "")
    )


def is_skippable_section_array(titles: pa.Array) -> pa.Array:
    """Headings to drop on markdown parse: '[...]' containers,
    'Other Concepts*', 'Unassigned Concepts' (ref: 1391-1395)."""
    bracket = pc.match_substring_regex(titles, r"^\[.*\]$")
    other = pc.match_substring_regex(titles, r"^Other Concepts")
    unassigned = pc.match_substring_regex(titles, r"^Unassigned Concepts")
    return pc.or_(pc.or_(bracket, other), unassigned)


def xml_escape_array(strings: pa.Array) -> pa.Array:
    """5-entity XML escape (ref: skos_converter.py:1162-1170).
    '&' first so entity ampersands are not double-escaped."""
    out = pc.replace_substring(strings, "&", "&amp;")
    out = pc.replace_substring(out, "<", "&lt;")
    out = pc.replace_substring(out, ">", "&gt;")
    out = pc.replace_substring(out, '"', "&quot;")
    out = pc.replace_substring(out, "'", "&#39;")
    return out


def uri_tail_array(uris: pa.Array) -> pa.Array:
    """Label-of-last-resort: URI tail after the last '/' or '#'
    (ref: skos_converter.py:394, 434)."""
    return pc.replace_substring_regex(uris, r"^.*[/#]", "")


def sanitize_id_array(uris: pa.Array) -> pa.Array:
    """'/'->'_', '#'->'_' for JSON node ids (ref: 1193, 1236)."""
    out = pc.replace_substring(uris, "/", "_")
    return pc.replace_substring(out, "#", "_")


def normalize_surface_array(strings: pa.Array) -> pa.Array:
    """Casefold + whitespace-collapse for label matching (the linking
    normalization; reference analogue is the exact-string label_to_uri
    memo at skos_converter.py:70)."""
    out = pc.utf8_lower(pc.utf8_trim_whitespace(strings))
    return pc.replace_substring_regex(out, r"\s+", " ")


def normalize_surface(s: str) -> str:
    return re.sub(r"\s+", " ", s.strip().lower())
