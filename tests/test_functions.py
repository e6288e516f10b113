"""Unit tests for the scalar/batch function library (SURVEY.md §2.3/§2.9
M-ops) on tiny Arrow tables — the per-operator coverage the reference
lacks (SURVEY.md §5), incl. the FIXTURES.md F5 messy_keys shapes."""

import numpy as np
import pyarrow as pa
import pytest

from bioontologykg_ray.functions import text as T
from bioontologykg_ray.functions import textstats as TS
from bioontologykg_ray.functions import hashing as H
from bioontologykg_ray.functions.embedding import cosine, embed_text, token_vec


def test_trim_and_clean_braces():
    arr = pa.array(["  x ", "\ty\n"])
    assert T.trim(arr).to_pylist() == ["x", "y"]
    arr2 = pa.array(["{{Deep} Learning}", "{a}"])
    assert T.clean_braces(arr2).to_pylist() == ["Deep Learning", "a"]


def test_split_list_pipe_with_empties():
    # M6: split + trim + drop '' (import_hgnc.cql:28-37 semantics)
    arr = pa.array(["a| b ||c", "", "solo"])
    out = T.split_list(arr, "|").to_pylist()
    assert out == [["a", "b", "c"], [], ["solo"]]


def test_cast_empty_null():
    # M8: CASE WHEN x<>'' THEN toFloat(x) ELSE null (import_cosmic_cmc.cql)
    arr = pa.array(["1.5", "", "  ", "2"])
    out = T.cast_empty_null(arr, pa.float64()).to_pylist()
    assert out == [1.5, None, None, 2.0]


def test_parse_bracketed_list():
    # M5: "['a','b']" → list; scalar fallback (import_monarchkg_relationships.py:26-40)
    arr = pa.array(["['a', 'b']", "plain", '["x"]'])
    out = T.parse_bracketed_list(arr).to_pylist()
    assert out == [["a", "b"], ["plain"], ["x"]]


def test_case_lookup_and_url():
    arr = pa.array(["P", "C", "zz"])
    out = T.case_lookup(arr, {"P": "ProteinBinding", "C": "Colocalization"})
    assert out.to_pylist() == ["ProteinBinding", "Colocalization", "Unknown"]
    urls = T.concat_url("https://x.org/", pa.array([12, 7]), "/v1")
    assert urls.to_pylist() == ["https://x.org/12/v1", "https://x.org/7/v1"]


def test_truncate_and_renames():
    arr = pa.array(["abcdef", "ab"])
    assert T.truncate(arr, 3).to_pylist() == ["abc", "ab"]
    t = pa.table({"Class ID": [1], "date_created": [2], "ok col": [3]})
    t2 = T.rename_space_underscore(t)
    assert t2.column_names == ["Class_ID", "date_created", "ok_col"]
    t3 = T.drop_prefixed_columns(t2, "date")
    assert t3.column_names == ["Class_ID", "ok_col"]


def test_first_author_year():
    authors = pa.array([["smith j", "doe a"], ["solo x"]])
    assert T.first_author(authors).to_pylist() == ["smith j", "solo x"]
    dates = pa.array(["2021-05-01", "1999"])
    assert T.year_from_date(dates).to_pylist() == ["2021", "1999"]


# --- textstats ------------------------------------------------------------

def test_tokens_and_lang():
    assert TS.token_count("  a  b\tc ") == 3
    assert TS.predict_lang("the cat and the dog of x") == "en"
    assert TS.predict_lang("el la de") == "es"
    assert TS.predict_lang("xyzzy qqq") == "und"
    # tie → alphabetical first
    assert TS.predict_lang("the der") == "de"


def test_quality_and_labels():
    s = TS.quality_stats("the a b.")
    assert s["n_tokens"] == 3 and s["punct_count"] == 1
    assert TS.quality_label(5, 0.5) == "too_short"
    assert TS.quality_label(50, 0.0) == "low_stopword"
    assert TS.quality_label(50, 0.5) == "ok"


def test_rolling_min_hash_stability_and_locality():
    a = TS.rolling_min_hash("hello world this is a longish document text")
    b = TS.rolling_min_hash("hello world this is a longish document text")
    assert a == b
    # appending text can only keep-or-lower the min over windows
    c = TS.rolling_min_hash("hello world this is a longish document text PLUS")
    assert c <= a or isinstance(c, int)


# --- hashing --------------------------------------------------------------

def test_minhash_estimates_jaccard():
    t1 = "w" + " w".join(str(i) for i in range(100))
    t2 = "w" + " w".join(str(i) for i in range(80))  # ~80% token overlap
    s1, s2 = H.shingle_hashes(t1), H.shingle_hashes(t2)
    true_j = H.jaccard(np.sort(s1), np.sort(s2))
    a, b = H.minhash_params(256)
    m1, m2 = H.minhash_signature(s1, a, b), H.minhash_signature(s2, a, b)
    est = float((m1 == m2).mean())
    assert abs(est - true_j) < 0.12


def test_simhash_locality():
    t1 = " ".join(f"tok{i}" for i in range(200))
    t2 = " ".join(f"tok{i}" for i in range(198)) + " other word"
    far = " ".join(f"zzz{i}" for i in range(200))
    assert H.hamming64(H.simhash64(t1), H.simhash64(t2)) < H.hamming64(
        H.simhash64(t1), H.simhash64(far)
    )


def test_lsh_bands_catch_identical():
    sig = np.arange(64, dtype=np.uint64)
    assert H.lsh_band_keys(sig) == H.lsh_band_keys(sig.copy())


# --- embedding ------------------------------------------------------------

def test_embedding_deterministic_and_normalized():
    v1, v2 = embed_text("alpha beta gamma"), embed_text("alpha beta gamma")
    assert np.array_equal(v1, v2)
    assert abs(float(np.linalg.norm(v1)) - 1.0) < 1e-5
    assert cosine(v1, v1) == pytest.approx(1.0, abs=1e-5)
    assert np.array_equal(token_vec("x"), token_vec("x"))
    # shared tokens → higher cosine than disjoint
    assert cosine(embed_text("alpha beta"), embed_text("alpha gamma")) > cosine(
        embed_text("alpha beta"), embed_text("delta epsilon")
    )
