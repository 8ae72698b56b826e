"""Corpus cleaning operators — the reference's `clean_corpus` rebuilt twice.

1. ``cutoff_truncate`` / ``clean_corpus_df``: the *declared, distributed*
   formulation — posexplode lines, window lookahead, re-aggregate. Pure
   Catalyst (explode + 2 windows + hash agg), shuffles once on the doc key;
   at 100 TB each document's lines stay in one partition (partitioned by
   doc id) and the windows run in-memory per group.

2. ``clean_corpus_exact``: exact behavioral parity with the reference's
   stateful line scan (ref: fda_rag_extraction/scripts/
   json_split_and_clean.py:16-243), as an Arrow pandas_udf for spot-parity
   tests and for users who need bug-compatible output.

Behavioral note (bug-compat, verified by reading the reference): when a
cutoff line has dosage info in the following 15 raw lines (or the previous
kept line ends with ':'), the reference's `continue` advances the *pattern*
loop, not the line loop — so the overridden cutoff line falls through and
is KEPT (json_split_and_clean.py:186-190). Both implementations preserve
that behavior.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rag_pipelines_spark.functions.text import (
    BOILERPLATE_RE,
    CUTOFF_RE,
    DOSAGE_RE,
    HEADERS_STANDALONE,
    collapse_ws,
    unicode_normalize,
)

LOOKAHEAD_LINES = 15  # ref: json_split_and_clean.py:105,154 (MAX_LOOKAHEAD*3)


# ---------------------------------------------------------------------------
# Distributed (declared) formulation
# ---------------------------------------------------------------------------


def cutoff_truncate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    out_col: str = "cleaned",
) -> DataFrame:
    """Drop everything from the first *effective* cutoff line onward.

    Effective cutoff = a line matching CUTOFF_RE with no dosage info in the
    next LOOKAHEAD_LINES raw lines (dosage ahead overrides the cutoff:
    processing continues and the cutoff line itself is kept — see module
    docstring). Output keeps trimmed non-empty lines with pos < cutoff,
    rejoined with newlines (missing cutoff => whole text kept).

    Plan shape: posexplode -> window(max over following 15) ->
    window(min over partition) -> filter -> groupBy(id).agg(sorted
    collect_list -> array_join). One shuffle on the id column.
    """
    other_cols = [c for c in df.columns if c != text_col]
    lines = df.select(
        *other_cols,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("line", F.trim("line"))

    w_ahead = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(1, LOOKAHEAD_LINES)
    )
    w_doc = Window.partitionBy(id_col)

    flagged = (
        lines.withColumn("is_cut", F.col("line").rlike(CUTOFF_RE))
        .withColumn("is_dose", F.col("line").rlike(DOSAGE_RE))
        .withColumn("dose_ahead", F.max("is_dose").over(w_ahead))
        .withColumn(
            "cutpos",
            F.min(
                F.when(
                    F.col("is_cut") & ~F.coalesce("dose_ahead", F.lit(False)),
                    F.col("pos"),
                )
            ).over(w_doc),
        )
    )
    kept = flagged.filter(
        (F.col("cutpos").isNull() | (F.col("pos") < F.col("cutpos")))
        & (F.col("line") != "")
    )
    return (
        kept.groupBy(id_col)
        .agg(
            *[F.first(c).alias(c) for c in other_cols if c != id_col],
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s.getField("line"),
                ),
                "\n",
            ).alias(out_col),
        )
    )


def clean_corpus_df(
    df: DataFrame, id_col: str, text_col: str, out_col: str = "corpus"
) -> DataFrame:
    """Full declared cleaning chain: boilerplate-line removal + cutoff
    truncation + unicode normalization + whitespace collapse.

    Mirrors the reference pipeline order (lines first, then character-level
    normalization — json_split_and_clean.py:107-241) as one lazy plan.
    """
    headers = F.array(*[F.lit(h) for h in HEADERS_STANDALONE])
    truncated = cutoff_truncate(df, id_col, text_col, out_col="_trunc")
    no_boiler = truncated.withColumn(
        "_kept",
        F.array_join(
            F.filter(
                F.split(F.col("_trunc"), "\n"),
                lambda l: ~l.rlike(BOILERPLATE_RE) & ~F.array_contains(headers, l),
            ),
            "\n",
        ),
    )
    return no_boiler.withColumn(
        out_col, collapse_ws(unicode_normalize(F.col("_kept")))
    ).drop("_trunc", "_kept")


# ---------------------------------------------------------------------------
# Exact-parity scalar (reference bug-compat), Arrow-vectorized
# ---------------------------------------------------------------------------

_CUTOFF_RX = re.compile(CUTOFF_RE)
_BOILER_RX = re.compile(BOILERPLATE_RE)
_DOSAGE_RX = re.compile(DOSAGE_RE)
_HEADERS = set(HEADERS_STANDALONE)
_UNI_MAP = str.maketrans({"–": "-", "—": "-", "−": "-", "‘": "'", "’": "'", "“": '"', "”": '"'})


def _dosage_within(lines: list[str], start: int, span: int) -> bool:
    """True if any of lines[start:start+span] (raw indices, empties skipped
    for matching but counted for range) contains dosage info; a line ending
    with ':' triggers a second-level scan of the same span after it.
    ref: json_split_and_clean.py:152-184.
    """
    end = min(start + span, len(lines))
    for i in range(start, end):
        cand = lines[i].strip()
        if not cand:
            continue
        if _DOSAGE_RX.search(cand):
            return True
        if cand.endswith(":"):
            sub_end = min(i + 1 + span, len(lines))
            for j in range(i + 1, sub_end):
                deeper = lines[j].strip()
                if deeper and _DOSAGE_RX.search(deeper):
                    return True
    return False


def clean_corpus_exact(text: str | None) -> str:
    """Bug-compatible reimplementation of the reference's clean_corpus
    (ref: json_split_and_clean.py:16-243). See module docstring for the
    overridden-cutoff keep behavior.
    """
    if not text:
        return ""
    lines = text.split("\n")
    kept: list[str] = []
    stop = False
    for idx, raw in enumerate(lines):
        stripped = raw.strip()
        if not stripped:
            # blank kept only right after a ':' line (list formatting)
            if kept and kept[-1].endswith(":"):
                kept.append("")
            continue
        if _CUTOFF_RX.search(stripped):
            overridden = (kept and kept[-1].endswith(":")) or _dosage_within(
                lines, idx + 1, LOOKAHEAD_LINES
            )
            if not overridden:
                stop = True
            # overridden cutoff lines fall through to the normal checks and
            # are kept (reference continues its pattern loop, not the line
            # loop — json_split_and_clean.py:186-190)
        if stop:
            break
        if _BOILER_RX.match(stripped):
            continue
        if stripped in _HEADERS:
            continue
        kept.append(stripped)

    out = "\n".join(kept).translate(_UNI_MAP)
    out = re.sub(r" +", " ", out)
    out = re.sub(r"\n{3,}", "\n\n", out)
    return out.strip()


from pyspark.sql.types import StringType


@F.pandas_udf(StringType())
def clean_corpus_udf(s: pd.Series) -> pd.Series:
    """Arrow-batched exact-parity cleaner (slow path; prefer clean_corpus_df)."""
    return s.map(clean_corpus_exact)


def clean_corpus_exact_col(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return clean_corpus_udf(c)
