"""Source reader tests (S1-S6) over tiny fixtures."""

import os
import textwrap

import pytest

from bioontologykg_ray.sources import readers as R

OBO = textwrap.dedent(
    """\
    format-version: 1.2

    [Term]
    id: GO:0000001
    name: mitochondrion inheritance
    namespace: biological_process
    def: "The distribution of mitochondria." [GOC:mcc]
    synonym: "mitochondrial inheritance" EXACT []
    xref: Wikipedia:Mito
    alt_id: GO:0009999
    is_a: GO:0048308 ! organelle inheritance

    [Term]
    id: GO:0000002
    name: mitochondrial genome maintenance
    namespace: biological_process
    is_obsolete: true
    relationship: part_of GO:0000001 ! mitochondrion inheritance

    [Typedef]
    id: part_of
    """
)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("src")
    (d / "genes.tsv").write_text(
        "gene_id\tgene_symbol\tstart_pos\nG1\tTP53\t100\nG2\tBRCA1\t\n"
    )
    (d / "typed.csv").write_text("id,xrefs\n1,a;b; ;c\n2,\n")
    (d / "positional.csv").write_text("#junk\n#junk2\nX1,alpha\nX2,beta\n")
    (d / "mini.obo").write_text(OBO)
    return str(d)


def test_read_tsv_headers(fixture_dir):
    ds = R.read_tsv(os.path.join(fixture_dir, "genes.tsv"))
    df = ds.to_pandas().sort_values("gene_id").reset_index(drop=True)
    assert list(df.columns) == ["gene_id", "gene_symbol", "start_pos"]
    assert df["gene_symbol"].tolist() == ["TP53", "BRCA1"]
    # empty numeric cell → null (toInteger empty-guard semantics)
    assert df["start_pos"].isna().tolist() == [False, True]


def test_read_csv_typed_arrays(fixture_dir):
    ds = R.read_csv_typed(
        os.path.join(fixture_dir, "typed.csv"), array_cols={"xrefs": ";"}
    )
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert list(df["xrefs"][0]) == ["a", "b", "c"]  # trimmed, empties dropped
    assert list(df["xrefs"][1]) == []


def test_read_positional_skip(fixture_dir):
    ds = R.read_positional_csv(
        os.path.join(fixture_dir, "positional.csv"),
        names=["code", "label"],
        skip_rows=2,
    )
    df = ds.to_pandas().sort_values("code").reset_index(drop=True)
    assert df["code"].tolist() == ["X1", "X2"]


def test_parse_obo(fixture_dir):
    terms, rels = R.parse_obo(os.path.join(fixture_dir, "mini.obo"))
    t = terms.to_pandas().set_index("term_id")
    assert t.loc["GO:0000001", "name"] == "mitochondrion inheritance"
    assert list(t.loc["GO:0000001", "synonyms"]) == ["mitochondrial inheritance"]
    assert list(t.loc["GO:0000001", "alt_ids"]) == ["GO:0009999"]
    assert bool(t.loc["GO:0000002", "is_obsolete"]) is True
    r = rels.to_pandas()
    assert ("GO:0000001", "IS_A", "GO:0048308") in set(
        map(tuple, r.itertuples(index=False))
    )
    assert ("GO:0000002", "PART_OF", "GO:0000001") in set(
        map(tuple, r.itertuples(index=False))
    )
    # Typedef stanza must not leak into terms
    assert "part_of" not in t.index


def test_read_obo_datasets(fixture_dir):
    out = R.read_obo(os.path.join(fixture_dir, "mini.obo"))
    assert out["terms"].count() == 2
    assert out["relationships"].count() == 2


def test_bibtex_reader(tmp_path):
    bib = r"""
@article{smith2020,
  title = {A {Nested} Study of Things},
  author = {Smith, Jane and Doe, John},
  year = 2020,
  journal = "Nature Things",
}
@comment{ignore me}
@book{doe2021,
  title = {Another {Work}},
  publisher = {Pub Co}
}
"""
    p = tmp_path / "refs.bib"
    p.write_text(bib)
    from bioontologykg_ray.sources.readers import read_bibtex

    df = read_bibtex(str(p)).to_pandas().set_index("cite_key")
    assert len(df) == 2
    assert df.loc["smith2020", "entry_type"] == "article"
    assert df.loc["smith2020", "title"] == "A Nested Study of Things"
    assert df.loc["smith2020", "author"] == "Smith, Jane and Doe, John"
    assert df.loc["smith2020", "year"] == "2020"
    assert df.loc["smith2020", "journal"] == "Nature Things"
    assert df.loc["doe2021", "publisher"] == "Pub Co"
    assert df.loc["doe2021", "year"] is None or df.loc["doe2021", "year"] != df.loc["doe2021", "year"]


OWL = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:oboInOwl="http://www.geneontology.org/formats/oboInOwl#"
         xmlns:obo="http://purl.obolibrary.org/obo/">
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/GO_0000001">
    <rdfs:label>mitochondrion inheritance</rdfs:label>
    <oboInOwl:hasOBONamespace>biological_process</oboInOwl:hasOBONamespace>
    <obo:IAO_0000115>The distribution of mitochondria.</obo:IAO_0000115>
    <oboInOwl:hasExactSynonym>mitochondrial inheritance</oboInOwl:hasExactSynonym>
    <oboInOwl:hasDbXref>Wikipedia:Mito</oboInOwl:hasDbXref>
    <oboInOwl:hasAlternativeId>GO:0009999</oboInOwl:hasAlternativeId>
    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/GO_0048308"/>
  </owl:Class>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/GO_0000002">
    <rdfs:label>mitochondrial genome maintenance</rdfs:label>
    <oboInOwl:hasOBONamespace>biological_process</oboInOwl:hasOBONamespace>
    <owl:deprecated rdf:datatype="http://www.w3.org/2001/XMLSchema#boolean">true</owl:deprecated>
    <rdfs:subClassOf>
      <owl:Restriction>
        <owl:onProperty rdf:resource="http://purl.obolibrary.org/obo/part_of"/>
        <owl:someValuesFrom rdf:resource="http://purl.obolibrary.org/obo/GO_0000001"/>
      </owl:Restriction>
    </rdfs:subClassOf>
  </owl:Class>
</rdf:RDF>
"""


def test_parse_owl_matches_obo(fixture_dir, tmp_path):
    """S7: the OWL/RDF-XML parse of the SAME ontology content must equal
    the OBO parse — schema and values (n10s RDF/XML import parity)."""
    owl_path = tmp_path / "mini.owl"
    owl_path.write_text(OWL)
    terms_owl, rels_owl = R.parse_owl(str(owl_path))
    terms_obo, rels_obo = R.parse_obo(os.path.join(fixture_dir, "mini.obo"))
    assert terms_owl.schema == terms_obo.schema
    a = terms_owl.to_pandas().sort_values("term_id").reset_index(drop=True)
    b = terms_obo.to_pandas().sort_values("term_id").reset_index(drop=True)
    for col in ("term_id", "name", "namespace", "definition", "is_obsolete"):
        assert a[col].tolist() == b[col].tolist(), col
    for col in ("synonyms", "xrefs", "alt_ids"):
        assert [list(x) for x in a[col]] == [list(x) for x in b[col]], col
    assert sorted(map(tuple, rels_owl.to_pandas().itertuples(index=False))) == sorted(
        map(tuple, rels_obo.to_pandas().itertuples(index=False))
    )


def test_owl_drives_flagship(tmp_path):
    """A raw .owl feeds load_ontology exactly like a raw .obo (S7→K1)."""
    owl_path = tmp_path / "mini.owl"
    owl_path.write_text(OWL)
    from bioontologykg_ray.pipelines.kg import load_ontology

    tbl = load_ontology(str(owl_path), dim=8)
    assert tbl.num_rows == 2
    assert "embedding" in tbl.schema.names
    out = R.read_owl(str(owl_path))
    assert out["terms"].count() == 2
    assert out["relationships"].count() == 2


def test_parse_owl_maps_ro_bfo_property_uris(tmp_path):
    """Real OBO-in-OWL exports reference relations by RO/BFO URI; the
    parser must emit the OBO relation NAME so .owl and .obo forms of the
    same ontology produce one predicate vocabulary."""
    owl = OWL.replace(
        "http://purl.obolibrary.org/obo/part_of",
        "http://purl.obolibrary.org/obo/BFO_0000050",
    )
    path = tmp_path / "bfo.owl"
    path.write_text(owl)
    _terms, rels = R.parse_owl(str(path))
    preds = set(rels["predicate"].to_pylist())
    assert "PART_OF" in preds and "BFO_0000050" not in preds


def test_parse_bibtex_skips_comment_string_preamble_bodies():
    """@comment/@string/@preamble must be consumed as balanced groups —
    an '@' inside their bodies is not an entry start."""
    text = (
        '@comment{ contact me @ home, ok }\n'
        '@string{jname = {Journal of X}}\n'
        '@preamble{ "\\newcommand{\\x}{@}" }\n'
        '@article{smith2020, title = {Real {Nested} Title}, year = {2020}}\n'
    )
    t = R.parse_bibtex(text)
    assert t.num_rows == 1
    assert t["entry_type"].to_pylist() == ["article"]
    assert t["cite_key"].to_pylist() == ["smith2020"]
    assert t["year"].to_pylist() == ["2020"]
