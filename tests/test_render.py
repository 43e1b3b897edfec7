"""Golden-output conformance for the render pipeline (FIXTURES.md §4)
plus N-Triples and markdown round-trips."""

from __future__ import annotations

import pyarrow as pa
import pytest

from skosconverter_ray import schemas
from skosconverter_ray.config import (
    OWL_SAME_AS,
    RDF_TYPE,
    SKOS_ALT_LABEL,
    SKOS_BROADER,
    SKOS_CONCEPT,
    SKOS_CONCEPT_SCHEME,
    SKOS_DEFINITION,
    SKOS_HAS_TOP_CONCEPT,
    SKOS_IN_SCHEME,
    SKOS_NARROWER,
    SKOS_NOTATION,
    SKOS_PREF_LABEL,
    SKOS_RELATED,
    SKOS_TOP_CONCEPT_OF,
)

EX = "http://ex.org/"


def tiny_fixture() -> pa.Table:
    """The Animals fixture of FIXTURES.md §4, exercising: both
    top-concept directions, a broader chain, in-scheme orphan,
    scheme-less concept, full metadata on one node."""
    rows = []

    def add(s, p, o, lit=False, lang=None):
        rows.append((s, p, o, lit, lang, None))

    add(EX + "scheme", RDF_TYPE, SKOS_CONCEPT_SCHEME)
    add(EX + "scheme", SKOS_PREF_LABEL, "Animals", True, "en")
    for frag, label in [("mammal", "Mammal"), ("bird", "Bird"),
                        ("dog", "Dog"), ("puppy", "Puppy"),
                        ("stray", "Stray"), ("lost", "Lost")]:
        add(EX + frag, RDF_TYPE, SKOS_CONCEPT)
        add(EX + frag, SKOS_PREF_LABEL, label, True, "en")
    add(EX + "scheme", SKOS_HAS_TOP_CONCEPT, EX + "mammal")  # one-sided
    add(EX + "bird", SKOS_TOP_CONCEPT_OF, EX + "scheme")     # one-sided
    add(EX + "dog", SKOS_BROADER, EX + "mammal")
    add(EX + "dog", SKOS_DEFINITION, "A canine", True, "en")
    add(EX + "dog", SKOS_ALT_LABEL, "hound", True, "en")
    add(EX + "dog", SKOS_NOTATION, "D1", True)
    add(EX + "dog", OWL_SAME_AS, EX + "wikidata/Q144")
    add(EX + "dog", SKOS_RELATED, EX + "bird")
    add(EX + "puppy", SKOS_BROADER, EX + "dog")
    add(EX + "stray", SKOS_IN_SCHEME, EX + "scheme")

    return pa.table(
        {
            "subj": pa.array([r[0] for r in rows]),
            "pred": pa.array([r[1] for r in rows]),
            "obj": pa.array([r[2] for r in rows]),
            "obj_is_literal": pa.array([r[3] for r in rows]),
            "lang": pa.array([r[4] for r in rows], pa.string()),
            "source_doc": pa.array([r[5] for r in rows], pa.string()),
        },
        schema=schemas.TRIPLES,
    )


GOLDEN_CSV = """Title,Parent,Concept Scheme,Definition,Alternative Labels,Notation,URI,Level
[SCHEME] Animals,,Animals,,,,http://ex.org/scheme,0
  Bird,[SCHEME] Animals,Animals,,,,http://ex.org/bird,1
  Mammal,[SCHEME] Animals,Animals,,,,http://ex.org/mammal,1
    Dog,Mammal,Animals,A canine,hound,D1,http://ex.org/dog,2
      Puppy,Dog,Animals,,,,http://ex.org/puppy,3
  [Other Concepts in Animals],[SCHEME] Animals,Animals,Concepts in this scheme without broader relations,,,,1
    Stray,[Other Concepts in Animals],Animals,,,,http://ex.org/stray,2
[UNASSIGNED CONCEPTS],,,Concepts not associated with any concept scheme,,,,0
  Lost,[UNASSIGNED CONCEPTS],,,,,http://ex.org/lost,1
"""


@pytest.fixture(scope="module")
def fixture_ds():
    import ray.data as rd

    return rd.from_arrow(tiny_fixture())


def test_golden_csv(fixture_ds):
    from skosconverter_ray.pipelines import skos2notion

    assert skos2notion.to_csv(fixture_ds) == GOLDEN_CSV


def test_markdown_dog_block(fixture_ds):
    from skosconverter_ray.pipelines import skos2notion

    md = skos2notion.to_markdown(fixture_ds)
    assert "# [SCHEME] Animals" in md.splitlines()[0]
    block = md[md.index("### Dog"):]
    lines = block.splitlines()
    assert lines[0] == "### Dog"
    assert "_Notation:_ `D1`  " in lines
    assert "_Definition:_ A canine  " in lines
    assert "_Alternative Labels:_ hound  " in lines
    assert "_URI:_ <http://ex.org/dog>" in lines   # no soft-break (quirk 995)
    assert "_Same as:_ <http://ex.org/wikidata/Q144>  " in lines
    assert "_Related:_ <http://ex.org/bird>  " in lines
    # metadata order Notation -> Definition -> AltLabels -> URI -> SameAs -> Related
    idx = [lines.index(l) for l in (
        "_Notation:_ `D1`  ", "_Definition:_ A canine  ",
        "_Alternative Labels:_ hound  ", "_URI:_ <http://ex.org/dog>",
        "_Same as:_ <http://ex.org/wikidata/Q144>  ",
        "_Related:_ <http://ex.org/bird>  ")]
    assert idx == sorted(idx)


def test_xml_structure(fixture_ds):
    from skosconverter_ray.pipelines import skos2notion

    xml = skos2notion.to_xml(fixture_ds)
    assert xml.startswith("<ac:confluence-content>")
    assert xml.rstrip().endswith("</ac:confluence-content>")
    assert "<h1>[SCHEME] Animals</h1>" in xml
    assert "<h3>Dog</h3>" in xml
    assert "<p><em>Definition:</em> A canine</p>" in xml
    # Definition before Notation (XML order differs from markdown)
    assert xml.index("<em>Definition:</em> A canine") < \
        xml.index("<em>Notation:</em>")
    assert "<p>URI: http://ex.org/dog</p>" in xml


def test_json_envelope(fixture_ds):
    from skosconverter_ray.pipelines import skos2notion

    obj = skos2notion.to_json(fixture_ds)
    voc = obj["vocabulary"]
    assert {s["title"] for s in voc["schemes"]} == {"Animals"}
    by_title = {c["title"]: c for c in voc["concepts"]}
    assert by_title["Dog"]["id"] == "http:__ex.org_dog"
    assert by_title["Dog"]["definition"] == "A canine"
    assert by_title["Dog"]["alternative_labels"] == ["hound"]
    dog_children = [c["title"] for c in by_title["Dog"]["children"]]
    assert dog_children == ["Puppy"]
    assert by_title["Puppy"]["parent_id"] == by_title["Dog"]["id"]


def test_ntriples_roundtrip(fixture_ds):
    import ray.data as rd

    from skosconverter_ray.sources import ntriples

    text = ntriples.to_ntriples_text(fixture_ds)
    lines = rd.from_items([{"text": l} for l in text.splitlines()])
    back = lines.map_batches(ntriples.parse_lines_batch,
                             batch_format="pyarrow").to_pandas()
    orig = fixture_ds.to_pandas()

    def key(df):
        return set(zip(df["subj"], df["pred"], df["obj"],
                       df["obj_is_literal"], df["lang"].fillna("")))

    assert key(back) == key(orig)


def test_markdown_roundtrip_triples(fixture_ds):
    """vocab -> markdown -> triples: hierarchy + labels + metadata
    survive (D2/D3-fixed semantics; Lorem ipsum injected for missing
    definitions per ref 1520-1522)."""
    import ray.data as rd

    from skosconverter_ray.pipelines import skos2notion
    from skosconverter_ray.sources.markdown import parse_markdown_dataset

    md = skos2notion.to_markdown(fixture_ds)
    docs = rd.from_items([{"doc_id": "f", "text": md}])
    back = parse_markdown_dataset(docs, "http://ex.org/").to_pandas()
    triples = set(zip(back["subj"], back["pred"], back["obj"]))

    # URIs preserved (D3 fix), hierarchy pairs both directions
    assert (EX + "dog", SKOS_BROADER, EX + "mammal") in triples
    assert (EX + "mammal", SKOS_NARROWER, EX + "dog") in triples
    assert (EX + "scheme", SKOS_HAS_TOP_CONCEPT, EX + "mammal") in triples
    assert (EX + "mammal", SKOS_TOP_CONCEPT_OF, EX + "scheme") in triples
    assert (EX + "dog", SKOS_PREF_LABEL, "Dog") in triples
    assert (EX + "dog", SKOS_DEFINITION, "A canine") in triples
    assert (EX + "dog", SKOS_ALT_LABEL, "hound") in triples
    assert (EX + "dog", SKOS_NOTATION, "D1") in triples
    assert (EX + "dog", OWL_SAME_AS, EX + "wikidata/Q144") in triples
    assert (EX + "dog", SKOS_RELATED, EX + "bird") in triples
    # missing definition -> Lorem ipsum placeholder
    assert (EX + "puppy", SKOS_DEFINITION, "Lorem ipsum") in triples
    # [UNASSIGNED CONCEPTS] section skipped, but Lost is under it ->
    # Lost has no scheme in the render, so it re-enters under no H1?
    # It renders AFTER the unassigned container at level 1 -> H2 under
    # the *previous* scheme does not apply: container resets nothing in
    # markdown. Documented divergence: Lost re-attaches to Animals.
    assert (EX + "lost", SKOS_PREF_LABEL, "Lost") in triples
