"""CLI surface tests (reference subcommands on the Ray engine)."""

import os

import pytest

import ray.data as rd

from skosconverter_ray import cli, vocab
from skosconverter_ray.sources.ntriples import to_ntriples_text


@pytest.fixture(scope="module")
def nt_file(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    voc = vocab.generate_vocab(vocab.VocabSpec(n_schemes=1, n_concepts=10,
                                               seed=5))
    p = d / "vocab.nt"
    p.write_text(to_ntriples_text(rd.from_arrow(voc.triples)))
    return str(p)


def test_all_sinks(nt_file, tmp_path):
    for cmd, ext in (("to-csv", "csv"), ("to-markdown", "markdown"),
                     ("to-json", "json"), ("to-xml", "xml")):
        out = str(tmp_path / f"v.{ext}")
        cli.main([cmd, nt_file, "--skip-validation", "-o", out])
        text = open(out).read()
        assert text.strip()
    csv_head = open(str(tmp_path / "v.csv")).read().splitlines()[0]
    assert csv_head == ("Title,Parent,Concept Scheme,Definition,"
                        "Alternative Labels,Notation,URI,Level")


def test_to_skos_roundtrip(nt_file, tmp_path):
    md = str(tmp_path / "v.md")
    cli.main(["to-markdown", nt_file, "--skip-validation", "-o", md])
    back = str(tmp_path / "back.nt")
    cli.main(["to-skos", md, "-o", back,
              "--namespace", "http://example.org/vocab/"])
    lines = [l for l in open(back).read().splitlines() if l.strip()]
    assert len(lines) > 10
    # D3 fixed: original URIs survive the round trip
    orig_subjects = {l.split(" ", 1)[0] for l in open(nt_file).read()
                     .splitlines() if l.strip()}
    back_subjects = {l.split(" ", 1)[0] for l in lines}
    assert orig_subjects & back_subjects


def test_validation_gate_runs(nt_file, tmp_path):
    out = str(tmp_path / "gated.csv")
    cli.main(["to-csv", nt_file, "-o", out])  # no --skip-validation
    assert os.path.exists(out)


def test_batch_dir(nt_file, tmp_path):
    bdir = tmp_path / "batch"
    bdir.mkdir()
    content = open(nt_file).read()
    for i in range(3):
        (bdir / f"v{i}.nt").write_text(content)
    # malformed lines are SKIPPED by the lenient parser (a bad line
    # must not kill a 100TB job) -> still converts, possibly empty
    (bdir / "broken.nt").write_text("<a <b .")
    # an unreadable path exercises the log-and-continue error branch
    # (ref BatchProcessor 497-499)
    (bdir / "unreadable.nt").mkdir()
    outd = tmp_path / "out"
    cli.main(["to-csv", "--batch-dir", str(bdir), "--output-dir",
              str(outd), "--skip-validation"])
    done = sorted(os.listdir(outd))
    assert "unreadable.csv" not in done
    assert {"v0.csv", "v1.csv", "v2.csv", "broken.csv"} <= set(done)


def test_turtle_and_jsonld_inputs(tmp_path, ray_session):
    import json

    from tests.test_rdf_readers import JSONLD, TTL

    ttl = tmp_path / "v.ttl"
    ttl.write_text(TTL)
    jld = tmp_path / "v.jsonld"
    jld.write_text(json.dumps(JSONLD))
    out_a = str(tmp_path / "a.csv")
    out_b = str(tmp_path / "b.csv")
    cli.main(["to-csv", str(ttl), "--skip-validation", "-o", out_a])
    cli.main(["to-csv", str(jld), "--skip-validation", "-o", out_b])
    # same vocabulary through two formats -> identical rendered CSV
    assert open(out_a).read() == open(out_b).read()
    assert "Dog" in open(out_a).read()


def test_to_skos_turtle_output(tmp_path, ray_session):
    from skosconverter_ray.sources.turtle import parse_turtle_doc

    nt = tmp_path / "v.nt"
    voc_md = tmp_path / "v.md"
    voc_md.write_text("# My Scheme\n\n## Alpha\n_Definition:_ first one\n\n"
                      "## Beta\n\n### Gamma\n")
    out = str(tmp_path / "back.ttl")
    cli.main(["to-skos", str(voc_md), "-o", out,
              "--namespace", "http://example.org/vocab/"])
    triples = parse_turtle_doc(open(out).read())
    preds = {p for _, p, *_ in triples}
    assert any(p.endswith("broader") for p in preds)
    assert any(p.endswith("hasTopConcept") for p in preds)


def test_prefix_flag_binds_turtle_prefix(tmp_path, ray_session):
    """--prefix (ref 1287-1292) names the vocabulary namespace in the
    Turtle output's @prefix block."""
    voc_md = tmp_path / "p.md"
    voc_md.write_text("# Scheme\n\n## Alpha\n")
    out = str(tmp_path / "p.ttl")
    cli.main(["to-skos", str(voc_md), "-o", out,
              "--namespace", "http://example.org/vocab/",
              "--prefix", "myvoc"])
    text = open(out).read()
    assert "@prefix myvoc: <http://example.org/vocab/>" in text
    assert "myvoc:" in text.split("\n\n", 1)[-1]  # used in the body


def test_gate_prints_first_five_and_n_more(tmp_path, ray_session, capsys):
    """O2 truncated diagnostics (ref 152-155): the CLI gate prints the
    first 5 error rows plus an 'and N more' summary."""
    from skosconverter_ray.config import RDF_TYPE, SKOS_CONCEPT

    lines = []
    for i in range(8):  # 8 unlabeled concepts -> 8 missing_label errors
        lines.append(f"<http://ex.org/c{i}> <{RDF_TYPE}> <{SKOS_CONCEPT}> .")
    nt = tmp_path / "bad.nt"
    nt.write_text("\n".join(lines) + "\n")
    with pytest.raises(SystemExit):
        cli.main(["to-csv", str(nt), "-o", str(tmp_path / "bad.csv")])
    err = capsys.readouterr().err
    assert err.count("missing_label:") == 5
    assert "... and" in err and "more" in err
    assert "validation found" in err


def test_to_skos_jsonld_output(nt_file, tmp_path):
    """to-skos with a .jsonld target writes expanded JSON-LD that the
    engine's own reader recovers triples from."""
    import json

    from skosconverter_ray.sources.jsonld import parse_jsonld_doc

    md = str(tmp_path / "v.md")
    cli.main(["to-markdown", nt_file, "--skip-validation", "-o", md])
    out = str(tmp_path / "v.jsonld")
    cli.main(["to-skos", md, "-o", out,
              "--namespace", "http://example.org/vocab/"])
    text = open(out).read()
    doc = json.loads(text)
    assert "@graph" in doc and doc["@graph"]
    triples = parse_jsonld_doc(text)
    assert len(triples) > 10
