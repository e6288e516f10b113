"""Source readers (SURVEY.md §2.1 S1-S6 parity).

- S1  headered TSV/CSV stream (`LOAD CSV WITH HEADERS ... FIELDTERMINATOR`,
      `cql/import/cosmic/import_cosmic_genes.cql:29`)
- S2  per-column array mapping (`apoc.load.csv {array:true, arraySep:";"}`,
      `cql/import/uniprot/load_uniprot.cql:7-20`)
- S3  positional headerless CSV with SKIP n (`cql/import/import_hpo.cql:30-46`)
- S5/S6 OBO ontology parser (pronto/obonet equivalents,
      `src/BioOntologyKG/importers/import_go_obo.py:64-145`) — ontology
      files are small dimension inputs, parsed driver-side and lifted
      into Datasets (`ray.data.from_arrow`).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.csv as pacsv
import ray.data

from bioontologykg_ray.functions.text import split_list


def read_tsv(path: str | list[str], columns: list[str] | None = None,
             delimiter: str = "\t") -> ray.data.Dataset:
    """S1 — headered delimited text as a streaming Dataset."""
    ds = ray.data.read_csv(
        path, parse_options=pacsv.ParseOptions(delimiter=delimiter)
    )
    return ds.select_columns(columns) if columns else ds


def read_csv_typed(
    path: str | list[str],
    array_cols: dict[str, str] | None = None,
    delimiter: str = ",",
) -> ray.data.Dataset:
    """S2 — headered CSV with per-column list splitting
    (``array_cols={'xrefs': ';'}`` ≙ apoc's ``{array:true, arraySep:';'}``)."""
    ds = read_tsv(path, delimiter=delimiter)
    if not array_cols:
        return ds

    def split(t: pa.Table) -> pa.Table:
        for col, sep in array_cols.items():
            idx = t.schema.get_field_index(col)
            t = t.set_column(idx, col, split_list(t[col], sep))
        return t

    return ds.map_batches(split, batch_format="pyarrow")


def read_positional_csv(
    path: str | list[str],
    names: list[str],
    skip_rows: int = 0,
    delimiter: str = ",",
) -> ray.data.Dataset:
    """S3 — headerless CSV: `LOAD CSV ... SKIP n` + row[i] access becomes
    named columns."""
    return ray.data.read_csv(
        path,
        parse_options=pacsv.ParseOptions(delimiter=delimiter),
        read_options=pacsv.ReadOptions(column_names=names, skip_rows=skip_rows),
    )


# ---------------------------------------------------------------------------
# OBO (S5/S6) — minimal [Term]-stanza parser: id, name, namespace, def,
# synonym, xref, alt_id, is_obsolete, is_a, relationship. Mirrors what the
# reference extracts via pronto (import_go_obo.py:75-145): term records
# with list attributes + (subject, predicate, object) triples.
# ---------------------------------------------------------------------------

def _obo_quoted(val: str) -> str:
    """First quoted string of an OBO tag value, honouring backslash
    escapes (naive split('\"')[1] truncates `def: "the \\"de novo\\"
    pathway" [GOC:x]` at the first escaped quote)."""
    m = re.match(r'\s*"((?:[^"\\]|\\.)*)"', val)
    if m is None:
        return val
    return m.group(1).replace('\\"', '"').replace("\\\\", "\\")


def parse_obo(path: str) -> tuple[pa.Table, pa.Table]:
    """Returns (terms, relationships). Predicates are upper-cased on the
    relationship table, as the reference does on materialize
    (import_go_obo.py:256)."""
    terms: list[dict] = []
    rels: list[tuple[str, str, str]] = []
    cur: dict | None = None
    in_term = False

    def flush():
        nonlocal cur
        if in_term and cur and "id" in cur:
            terms.append(cur)
        cur = None

    with open(path) as f:
        for line in f:
            line = line.strip()
            if line == "[Term]":
                flush()
                in_term = True
                cur = {"synonyms": [], "xrefs": [], "alt_ids": [], "is_obsolete": False}
                continue
            if line.startswith("["):  # [Typedef] etc.
                flush()
                in_term = False
                continue
            if not in_term or cur is None or ":" not in line:
                continue
            key, _, val = line.partition(":")
            val = val.strip()
            if key == "id":
                cur["id"] = val
            elif key == "name":
                cur["name"] = val
            elif key == "namespace":
                cur["namespace"] = val
            elif key == "def":
                cur["definition"] = _obo_quoted(val)
            elif key == "synonym":
                cur["synonyms"].append(_obo_quoted(val))
            elif key == "xref":
                cur["xrefs"].append(val.split(" ")[0])
            elif key == "alt_id":
                cur["alt_ids"].append(val)
            elif key == "is_obsolete":
                cur["is_obsolete"] = val.lower() == "true"
            elif key == "is_a":
                target = val.split("!")[0].strip()
                rels.append((cur.get("id", ""), "IS_A", target))
            elif key == "relationship":
                parts = val.split("!")[0].split()
                if len(parts) >= 2:
                    rels.append((cur.get("id", ""), parts[0].upper(), parts[1]))
    flush()

    terms_tbl = pa.table(
        {
            "term_id": pa.array([t.get("id", "") for t in terms], pa.string()),
            "name": pa.array([t.get("name", "") for t in terms], pa.string()),
            "namespace": pa.array([t.get("namespace", "") for t in terms], pa.string()),
            "definition": pa.array([t.get("definition", "") for t in terms], pa.string()),
            "synonyms": pa.array([t["synonyms"] for t in terms], pa.list_(pa.string())),
            "xrefs": pa.array([t["xrefs"] for t in terms], pa.list_(pa.string())),
            "alt_ids": pa.array([t["alt_ids"] for t in terms], pa.list_(pa.string())),
            "is_obsolete": pa.array([t["is_obsolete"] for t in terms], pa.bool_()),
        }
    )
    rels_tbl = pa.table(
        {
            "subject_id": pa.array([r[0] for r in rels], pa.string()),
            "predicate": pa.array([r[1] for r in rels], pa.string()),
            "object_id": pa.array([r[2] for r in rels], pa.string()),
        }
    )
    return terms_tbl, rels_tbl


def read_obo(path: str) -> dict[str, ray.data.Dataset]:
    """S5 — OBO → two Datasets (terms, relationships)."""
    terms, rels = parse_obo(path)
    return {
        "terms": ray.data.from_arrow(terms),
        "relationships": ray.data.from_arrow(rels),
    }


# ---------------------------------------------------------------------------
# OWL / RDF-XML ontologies (S7) — the reference loads DOID/HPO/NCIT as
# RDF/XML through the n10s Neo4j plugin
# (`cql/import/import_disease_ontology_obo.cql:10`:
# `n10s.onto.import.fetch(".../doid.owl", "RDF/XML")`;
# `cql/import/import_hpo.cql:15-20`). Here the OBO-in-OWL profile those
# ontologies use (owl:Class + oboInOwl annotation properties) parses with
# the stdlib XML parser into the SAME (terms, relationships) schema as
# parse_obo, so a raw .owl drives the flagship exactly like a raw .obo.
# Fetching stays out of scope (sealed sandbox) — the input is a file.
# ---------------------------------------------------------------------------

_OWL_NS = {
    "owl": "http://www.w3.org/2002/07/owl#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "oboInOwl": "http://www.geneontology.org/formats/oboInOwl#",
    "obo": "http://purl.obolibrary.org/obo/",
}


def _owl_curie(uri: str) -> str:
    """http://purl.obolibrary.org/obo/GO_0001 → GO:0001 (n10s keeps full
    URIs; the OBO id convention is what the rest of the engine joins on)."""
    frag = uri.rsplit("/", 1)[-1].rsplit("#", 1)[-1]
    return frag.replace("_", ":", 1) if "_" in frag else frag


_OWL_PROP_NAMES = {
    # OBO-in-OWL standard relation URIs → OBO relation names (the .obo
    # side of the same ontology uses the names; GO/DOID OWL exports use
    # the RO/BFO ids)
    "BFO_0000050": "PART_OF",
    "BFO_0000051": "HAS_PART",
    "BFO_0000066": "OCCURS_IN",
    "RO_0002211": "REGULATES",
    "RO_0002212": "NEGATIVELY_REGULATES",
    "RO_0002213": "POSITIVELY_REGULATES",
    "RO_0002202": "DEVELOPS_FROM",
}


def parse_owl(path: str) -> tuple[pa.Table, pa.Table]:
    """OBO-in-OWL RDF/XML → (terms, relationships), schema-identical to
    ``parse_obo``. Recognized per owl:Class: oboInOwl:id (fallback:
    rdf:about CURIE), rdfs:label, oboInOwl:hasOBONamespace,
    obo:IAO_0000115 (definition), hasExactSynonym/hasRelatedSynonym/
    hasBroadSynonym/hasNarrowSynonym, hasDbXref, hasAlternativeId,
    owl:deprecated, rdfs:subClassOf (→ IS_A; someValuesFrom restrictions
    → upper-cased property predicate, as import_go_obo.py:256 does)."""
    import xml.etree.ElementTree as ET

    def q(prefix: str, tag: str) -> str:
        return f"{{{_OWL_NS[prefix]}}}{tag}"

    RDF_ABOUT = q("rdf", "about")
    RDF_RESOURCE = q("rdf", "resource")

    terms: list[dict] = []
    rels: list[tuple[str, str, str]] = []
    root = ET.parse(path).getroot()
    for cls in root.iter(q("owl", "Class")):
        about = cls.get(RDF_ABOUT)
        if about is None:
            continue  # anonymous class (e.g. inside a restriction)
        cur = {
            "id": "",
            "name": "",
            "namespace": "",
            "definition": "",
            "synonyms": [],
            "xrefs": [],
            "alt_ids": [],
            "is_obsolete": False,
        }
        cur["id"] = _owl_curie(about)
        for child in cls:
            tag, text = child.tag, (child.text or "").strip()
            if tag == q("oboInOwl", "id") and text:
                cur["id"] = text
            elif tag == q("rdfs", "label"):
                cur["name"] = text
            elif tag == q("oboInOwl", "hasOBONamespace"):
                cur["namespace"] = text
            elif tag == q("obo", "IAO_0000115"):
                cur["definition"] = text
            elif tag in (
                q("oboInOwl", "hasExactSynonym"),
                q("oboInOwl", "hasRelatedSynonym"),
                q("oboInOwl", "hasBroadSynonym"),
                q("oboInOwl", "hasNarrowSynonym"),
            ):
                if text:
                    cur["synonyms"].append(text)
            elif tag == q("oboInOwl", "hasDbXref"):
                if text:
                    cur["xrefs"].append(text)
            elif tag == q("oboInOwl", "hasAlternativeId"):
                if text:
                    cur["alt_ids"].append(text)
            elif tag == q("owl", "deprecated"):
                cur["is_obsolete"] = text.lower() == "true"
            elif tag == q("rdfs", "subClassOf"):
                res = child.get(RDF_RESOURCE)
                if res is not None:
                    rels.append((cur["id"], "IS_A", _owl_curie(res)))
                else:  # owl:Restriction: onProperty + someValuesFrom
                    for restr in child.iter(q("owl", "Restriction")):
                        prop = restr.find(q("owl", "onProperty"))
                        val = restr.find(q("owl", "someValuesFrom"))
                        if prop is None or val is None:
                            continue
                        p_uri = prop.get(RDF_RESOURCE) or ""
                        v_uri = val.get(RDF_RESOURCE) or ""
                        if p_uri and v_uri:
                            frag = p_uri.rsplit("/", 1)[-1].rsplit("#", 1)[-1]
                            # real OBO-in-OWL exports reference relations
                            # by RO/BFO URI, not by name — map the common
                            # ones to the OBO relation vocabulary so the
                            # same ontology parses identically from .obo
                            # and .owl; unknown properties keep their
                            # fragment verbatim (part_of → PART_OF)
                            pred = _OWL_PROP_NAMES.get(frag, frag.upper())
                            rels.append((cur["id"], pred, _owl_curie(v_uri)))
        terms.append(cur)

    terms_tbl = pa.table(
        {
            "term_id": pa.array([t["id"] for t in terms], pa.string()),
            "name": pa.array([t["name"] for t in terms], pa.string()),
            "namespace": pa.array([t["namespace"] for t in terms], pa.string()),
            "definition": pa.array([t["definition"] for t in terms], pa.string()),
            "synonyms": pa.array([t["synonyms"] for t in terms], pa.list_(pa.string())),
            "xrefs": pa.array([t["xrefs"] for t in terms], pa.list_(pa.string())),
            "alt_ids": pa.array([t["alt_ids"] for t in terms], pa.list_(pa.string())),
            "is_obsolete": pa.array([t["is_obsolete"] for t in terms], pa.bool_()),
        }
    )
    rels_tbl = pa.table(
        {
            "subject_id": pa.array([r[0] for r in rels], pa.string()),
            "predicate": pa.array([r[1] for r in rels], pa.string()),
            "object_id": pa.array([r[2] for r in rels], pa.string()),
        }
    )
    return terms_tbl, rels_tbl


def read_owl(path: str) -> dict[str, ray.data.Dataset]:
    """S7 — OWL/RDF-XML ontology → two Datasets (terms, relationships)."""
    terms, rels = parse_owl(path)
    return {
        "terms": ray.data.from_arrow(terms),
        "relationships": ray.data.from_arrow(rels),
    }


# ---------------------------------------------------------------------------
# BibTeX (S8) — the reference ingests ReadCube BibTeX exports
# (`src/BioOntologyKG/importers/readcube/readcube_abstract_embeddings.py`):
# @entry{key, field = {value}, ...} records with brace-wrapped values.
# Like OBO, a bibliography is a small dimension input: parsed driver-side,
# lifted into a Dataset. Values get the M3 brace cleanup.
# ---------------------------------------------------------------------------

def parse_bibtex(text: str) -> pa.Table:
    """BibTeX entries → (entry_type, cite_key, fields...) arrow table.
    Handles nested braces and quoted values; field names lowercased;
    values brace-cleaned (functions/text.clean_braces)."""
    from bioontologykg_ray.functions.text import clean_braces

    entries: list[dict] = []
    i, n = 0, len(text)
    while i < n:
        at = text.find("@", i)
        if at < 0:
            break
        brace = text.find("{", at)
        if brace < 0:
            break
        etype = text[at + 1 : brace].strip().lower()
        if etype in ("comment", "preamble", "string"):
            # consume the ENTIRE balanced group: skipping only past the
            # opening brace would re-parse any '@' inside the body as an
            # entry start (garbage rows, swallowed real entries)
            depth, j = 1, brace + 1
            while j < n and depth:
                if text[j] == "{":
                    depth += 1
                elif text[j] == "}":
                    depth -= 1
                j += 1
            i = j
            continue
        # find the matching close brace of the entry
        depth, j = 1, brace + 1
        while j < n and depth:
            if text[j] == "{":
                depth += 1
            elif text[j] == "}":
                depth -= 1
            j += 1
        body = text[brace + 1 : j - 1]
        i = j
        key, _, rest = body.partition(",")
        fields: dict[str, str] = {"entry_type": etype, "cite_key": key.strip()}
        k = 0
        while k < len(rest):
            eq = rest.find("=", k)
            if eq < 0:
                break
            name = rest[k:eq].strip().strip(",").strip().lower()
            v = eq + 1
            while v < len(rest) and rest[v] in " \t\r\n":
                v += 1
            if v < len(rest) and rest[v] == "{":
                depth, w = 1, v + 1
                while w < len(rest) and depth:
                    if rest[w] == "{":
                        depth += 1
                    elif rest[w] == "}":
                        depth -= 1
                    w += 1
                val = rest[v + 1 : w - 1]
                k = w
            elif v < len(rest) and rest[v] == '"':
                w = rest.find('"', v + 1)
                w = len(rest) if w < 0 else w
                val = rest[v + 1 : w]
                k = w + 1
            else:
                w = rest.find(",", v)
                w = len(rest) if w < 0 else w
                val = rest[v:w].strip()
                k = w
            if name:
                cleaned = clean_braces(val)  # arrow kernel; accepts scalars
                fields[name] = cleaned.as_py() if hasattr(cleaned, "as_py") else str(cleaned)
        entries.append(fields)

    cols = ["entry_type", "cite_key"]
    for e in entries:
        for f in e:
            if f not in cols:
                cols.append(f)
    return pa.table(
        {c: pa.array([e.get(c) for e in entries], pa.string()) for c in cols}
    )


def read_bibtex(path: str) -> ray.data.Dataset:
    """S8 — BibTeX file → Dataset of entries."""
    with open(path) as f:
        return ray.data.from_arrow(parse_bibtex(f.read()))
