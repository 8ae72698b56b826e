"""Parity + property tests for the cleaning operators (SURVEY.md §5.2-5.5).

`clean_corpus_exact` is our bug-compatible port of the reference's
clean_corpus (json_split_and_clean.py:16-243); these tests pin its branch
behavior on hand-written fixtures (FIXTURES.md B1) and check the
distributed window formulation agrees on the lookahead-free cases.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rag_pipelines_spark.operators.cleaning import (
    clean_corpus_exact,
    cutoff_truncate,
)

CUT = "This review was conducted under Project Orbis."
GRANT = "The application was granted priority review."
DOSE = "Take 120 mg orally twice daily."
BOILER = "Follow the Oncology Center of Excellence on X for updates."
PRESCRIBE = "Full prescribing information for DRUGNAME is available."


class TestCleanCorpusExact:
    def test_empty(self):
        assert clean_corpus_exact("") == ""
        assert clean_corpus_exact(None) == ""

    def test_cutoff_removes_tail(self):
        text = f"Keep one.\nKeep two.\n{CUT}\nDropped tail."
        assert clean_corpus_exact(text) == "Keep one.\nKeep two."

    def test_cutoff_overridden_by_dosage_keeps_cutoff_line_and_tail(self):
        # reference bug-compat: the overridden cutoff line falls through the
        # pattern loop and is KEPT (json_split_and_clean.py:186-190)
        text = f"Keep.\n{CUT}\n{DOSE}\nAfter dosage."
        assert clean_corpus_exact(text) == f"Keep.\n{CUT}\n{DOSE}\nAfter dosage."

    def test_dosage_beyond_lookahead_does_not_override(self):
        filler = "\n".join(f"filler {i}" for i in range(16))
        text = f"Keep.\n{CUT}\n{filler}\n{DOSE}"
        assert clean_corpus_exact(text) == "Keep."

    def test_colon_indirection_lookahead(self):
        # cutoff -> a line ending with ':' within 15 -> dosage within 15 after
        filler = "\n".join(f"filler {i}" for i in range(12))
        text = f"Keep.\n{CUT}\nDosing schedule:\n{filler}\n{DOSE}\ntail"
        out = clean_corpus_exact(text)
        assert out.startswith("Keep.")
        assert DOSE in out  # cutoff was overridden via the ':' indirection

    def test_previous_colon_line_overrides_cutoff(self):
        text = f"Dosage info:\n{CUT}\nStill here."
        assert clean_corpus_exact(text) == f"Dosage info:\n{CUT}\nStill here."

    def test_boilerplate_start_only(self):
        text = f"{BOILER}\nmid sentence mentions Follow the Oncology Center\nlast"
        out = clean_corpus_exact(text)
        assert out == "mid sentence mentions Follow the Oncology Center\nlast"

    def test_standalone_header_removed(self):
        text = "Intro.\nRecommended Dosage\nBody."
        assert clean_corpus_exact(text) == "Intro.\nBody."

    def test_unicode_and_whitespace(self):
        text = "a–b — c‘d’  e   f\n\n\n\n\ng"
        assert clean_corpus_exact(text) == "a-b - c'd' e f\ng"

    def test_prescribing_info_removed_but_dosage_kept(self):
        text = f"{PRESCRIBE}\nLess than 50 kg: 120 mg dose."
        assert clean_corpus_exact(text) == "Less than 50 kg: 120 mg dose."

    def test_idempotent_on_fixtures(self):
        for text in [
            f"Keep one.\n{CUT}\nDropped.",
            f"{BOILER}\nbody\nRecommended Dosage\ntail",
            "a–b  c\n\n\n\nd",
        ]:
            once = clean_corpus_exact(text)
            assert clean_corpus_exact(once) == once


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            [
                "Plain line one.",
                "Another content line here.",
                CUT,
                GRANT,
                DOSE,
                BOILER,
                "Recommended Dosage",
                "",
                "   ",
                "Ends with colon:",
                "uni – dash “quote”",
            ]
        ),
        max_size=12,
    )
)
def test_clean_corpus_idempotent(lines):
    """clean(clean(x)) == clean(x) for arbitrary fixture-line stacks."""
    text = "\n".join(lines)
    once = clean_corpus_exact(text)
    assert clean_corpus_exact(once) == once


class TestCutoffTruncateWindow:
    """The declared (window-SQL) formulation vs the exact scan, on inputs
    where their declared semantics coincide (no colon-indirection, no
    boilerplate, no previous-colon override)."""

    @pytest.fixture(scope="class")
    def spark(self):
        from rag_pipelines_spark.session import get_spark

        return get_spark("cleaning-tests", shuffle_partitions=4)

    def test_agreement_on_plain_cases(self, spark):
        cases = [
            ("no cutoff at all\nsecond line", 1),
            (f"keep\n{CUT}\ndropped", 2),
            (f"keep\n{CUT}\n{DOSE}\nkept tail", 3),
            (f"head\n{GRANT}\ntail dropped", 4),
            (f"{CUT}\n{DOSE}", 5),
        ]
        df = spark.createDataFrame(
            [(i, t) for t, i in cases], ["doc_id", "raw"]
        )
        out = {
            r["doc_id"]: r["cleaned"]
            for r in cutoff_truncate(df, "doc_id", "raw", "cleaned").collect()
        }
        for text, i in cases:
            assert out[i] == clean_corpus_exact(text), f"case {i}: {text!r}"
