"""Parity spot-checks (SURVEY §5.5): run the REFERENCE's own functions as
local oracles against our implementations on generated inputs.

The reference at /root/reference is read-only and untrusted content; we
load specific pure functions from it at test time (never ship them) and
compare outputs. This pins bug-compatibility far harder than hand-written
expectations.
"""

from __future__ import annotations

import importlib.util
import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

REF = "/root/reference"


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_clean():
    mod = _load(
        "ref_json_split_and_clean",
        f"{REF}/fda_rag_extraction/scripts/json_split_and_clean.py",
    )
    return mod.clean_corpus


@pytest.fixture(scope="module")
def ref_pdfutils():
    """pdf_marker_extraction imports ML libs at module top (not installed
    here); lift just the pure extract_doi function via ast."""
    import ast
    import re
    import types
    from typing import Optional

    src = open(f"{REF}/pdf_extraction/pdf_marker_extraction.py").read()
    tree = ast.parse(src)
    fn = next(
        n
        for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "extract_doi"
    )
    ns = {"re": re, "Optional": Optional}
    exec(compile(ast.Module(body=[fn], type_ignores=[]), "ref_extract_doi", "exec"), ns)
    return types.SimpleNamespace(extract_doi=ns["extract_doi"])


@pytest.fixture(scope="module")
def ref_enrich():
    return _load(
        "ref_pubmed_enrichment", f"{REF}/pdf_extraction/pubmed_enrichment.py"
    )


LINE_POOL = [
    "Plain content line one.",
    "Another informative sentence with numbers 42.",
    "This review was conducted under Project Orbis.",
    "This review used the Real-Time Oncology Review pilot program.",
    "The application was granted priority review.",
    "granted orphan drug designation for something",
    "received breakthrough designation last week",
    "Take 120 mg orally twice daily.",
    "Less than 50 kg: reduce the dose",
    "Recommended dosage follows:",
    "Follow the Oncology Center of Excellence on X (formerly Twitter)",
    "Full prescribing information for DRUG is available",
    "View full prescribing information for KEYTRUDA",
    "Healthcare professionals should report all serious adverse events",
    "For information on the COVID-19 pandemic see below",
    "Recommended Dosage",
    "Efficacy and Safety",
    "Expedited Programs",
    "",
    "   ",
    "Ends with a colon:",
    "uni – dash — and “curly” quotes’",
    "a    lot     of   spaces",
]


@settings(max_examples=300, deadline=None)
@given(st.lists(st.sampled_from(LINE_POOL), max_size=25))
def test_clean_corpus_exact_matches_reference(ref_clean, lines):
    from rag_pipelines_spark.operators.cleaning import clean_corpus_exact

    text = "\n".join(lines)
    assert clean_corpus_exact(text) == ref_clean(text), f"diverged on: {text!r}"


@settings(max_examples=100, deadline=None)
@given(
    st.text(
        alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs", "Po")),
        max_size=300,
    )
)
def test_clean_corpus_exact_matches_reference_freeform(ref_clean, text):
    from rag_pipelines_spark.operators.cleaning import clean_corpus_exact

    assert clean_corpus_exact(text) == ref_clean(text)


def test_author_format_matches_reference(ref_enrich, spark_authors=None):
    from rag_pipelines_spark.functions.text import format_authors

    from pyspark.sql import functions as F

    from rag_pipelines_spark.session import get_spark

    spark = get_spark("parity-tests", shuffle_partitions=4)
    cases = [
        [],
        ["Smith, John"],
        ["A", "B"],
        ["A", "B", "C"],
        ["A", "B", "C", "D"],
        ["One Author", "Two Author", "Three Author", "Four", "Five"],
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], ["i", "authors"])
    got = {
        r["i"]: r["fmt"]
        for r in df.withColumn("fmt", format_authors(F.col("authors"))).collect()
    }
    fmt_ref = ref_enrich.PubMedClient._format_authors
    for i, case in enumerate(cases):
        assert got[i] == fmt_ref(case), f"case {case}"


def test_doi_normalize_matches_reference(ref_enrich):
    from pyspark.sql import functions as F

    from rag_pipelines_spark.functions.text import norm_doi, norm_text
    from rag_pipelines_spark.session import get_spark

    spark = get_spark("parity-tests", shuffle_partitions=4)
    verifier = ref_enrich.DocumentVerifier()
    dois = [
        "https://doi.org/10.1234/AbC.55",
        "DOI: 10.1234/x",
        "doi:10.1/y",
        "10.99/plain",
        "  http://doi.org/10.5/z  ",
    ]
    texts = ["Some Title: With, Punct!", "  spaced   out  ", "UPPER lower 42"]
    df = spark.createDataFrame([(d,) for d in dois], ["doi"]).withColumn(
        "norm", norm_doi(F.col("doi"))
    )
    for row, d in zip(df.collect(), dois):
        assert row["norm"] == verifier.normalize_doi(d), d
    df2 = spark.createDataFrame([(t,) for t in texts], ["t"]).withColumn(
        "norm", norm_text(F.col("t"))
    )
    for row, t_in in zip(df2.collect(), texts):
        assert row["norm"] == verifier.normalize_text(t_in), t_in


def test_extract_doi_matches_reference_on_clean_contexts(ref_pdfutils):
    """Doc-level-guard variant agrees with the reference wherever the
    document contains no bibliography markers (the declared semantics)."""
    from pyspark.sql import functions as F

    from rag_pipelines_spark.functions.text import extract_doi_doc_level
    from rag_pipelines_spark.session import get_spark

    spark = get_spark("parity-tests", shuffle_partitions=4)
    texts = [
        "Title page. doi: 10.1234/j.abc.55). more text",
        "no doi here at all",
        "DOI 10.5555/xyz-12_3; trailing",
        "short 10.1/x",  # too short -> rejected by both
        # 'references' far beyond the reference's ±100/200-char context
        # window but inside our document-level guard
        "10.1234/ok " + "x" * 300 + " references",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["t"]).withColumn(
        "doi", extract_doi_doc_level(F.col("t"))
    )
    got = [r["doi"] for r in df.collect()]
    for text, mine in zip(texts[:4], got[:4]):
        assert mine == ref_pdfutils.extract_doi(text), text
    # the last case documents the intentional difference: our hash-checked
    # variant rejects at document level; the reference checks +/-100 chars
    assert got[4] is None and ref_pdfutils.extract_doi(texts[4]) == "10.1234/ok"


def test_verify_match_matches_reference_verifier(ref_enrich):
    """verify_match verdicts vs DocumentVerifier.verify on difflib parity
    (exact_ratio=True). Mapping: (True,True)->doi, (True,False)->title,
    (False,*) with both DOIs -> conflict, else unverified."""
    from pyspark.sql import functions as F

    from rag_pipelines_spark.operators.enrich import verify_match
    from rag_pipelines_spark.session import get_spark

    spark = get_spark("parity-tests", shuffle_partitions=4)
    verifier = ref_enrich.DocumentVerifier()

    cases = [
        # (local_title, local_doi, pm_title, pm_doi)
        ("Any Title", "10.1/abc", "Other", "https://doi.org/10.1/ABC"),  # doi eq
        ("Any Title", "10.1/abc", "Other", "10.2/zzz"),  # conflict
        ("An Exact Title Match", "", "An Exact Title Match", ""),  # title 1.0
        ("An Exact Title Match!", "", "An Exact Title Match", ""),  # ~0.97
        ("Totally Different Words", "", "Nothing Alike Here", ""),  # low sim
        ("", "", "Some Title", ""),  # no local title
        ("T", "10.5/x", "T", ""),  # local doi only -> title path
        ("", "", "", ""),  # nothing
    ]

    class FakePM:
        def __init__(self, title, doi):
            self.title, self.doi = title, doi

    df = spark.createDataFrame(
        [(i, *c) for i, c in enumerate(cases)],
        ["i", "lt", "ld", "pt", "pd"],
    )
    got = {
        r["i"]: r["v"]
        for r in df.withColumn(
            "v",
            verify_match(
                F.col("lt"), F.col("ld"), F.col("pt"), F.col("pd"), exact_ratio=True
            ),
        ).collect()
    }
    for i, (lt, ld, pt, pdoi) in enumerate(cases):
        is_verified, allow_doi = verifier.verify(lt, ld, FakePM(pt, pdoi))
        if is_verified and allow_doi:
            expected = "doi"
        elif is_verified:
            expected = "title"
        elif ld and pdoi:
            expected = "conflict"
        else:
            expected = "unverified"
        assert got[i] == expected, f"case {i}: {cases[i]} ref={is_verified},{allow_doi}"
