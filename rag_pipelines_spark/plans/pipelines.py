"""The reference's three entry points as composable lazy DataFrame programs.

§3.1 watcher:   scan -> fingerprint -> delta anti-join(state) -> fetch ->
                sinks + state merge (one plan; the only barrier is the
                state read before the anti-join)
§3.2 cleaner:   read -> filter null key -> clean corpus -> project ->
                content-hash manifest
§3.3 pdf chain: binary extract -> DOI probe -> PubMed-style enrichment with
                fallback keys + verification -> dead-letter split ->
                publish projection

Everything is pure DataFrame-in/DataFrame-out so tests inject fixture
frames and transports; nothing collects on the data path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rag_pipelines_spark.functions.text import (
    build_link,
    clean_content,
    extract_doi_doc_level,
    fingerprint_key,
    strip_wrapper_prefix,
    unicode_normalize,
    url_absolutize,
)
from rag_pipelines_spark.operators.cleaning import clean_corpus_df
from rag_pipelines_spark.operators.enrich import verify_match
from rag_pipelines_spark.sources.html_table import Transport, fetch_enrich, parse_html_tables

BASE_DOMAIN = "https://www.fda.gov"


# ---------------------------------------------------------------------------
# §3.1 — watcher: scan -> delta -> enrich
# ---------------------------------------------------------------------------


@dataclass
class WatcherResult:
    new_records: DataFrame  # enriched rows not present in master
    updated_master: DataFrame  # master ∪ new (new first by scraped_at desc)
    stats: DataFrame  # one-row counters (A1/A3 shape)


def watcher_pipeline(
    pages: DataFrame,
    master: DataFrame | None,
    transport: Transport | None = None,
    scraped_at: str = "2024-01-15 09:00:00",
) -> WatcherResult:
    """scan(HTML pages) -> rows -> RAG_ID -> anti-join master -> deep fetch.

    ref: fda_watcher.py:357-588. `master is None` = initial mode
    (fda_watcher.py:373); the anti-join side is broadcast (the master key
    set is the reference's in-memory `set(RAG_ID)`, fda_watcher.py:399).
    """
    rows = parse_html_tables(pages)
    scraped = (
        rows.withColumn("webpage", url_absolutize(F.col("href"), BASE_DOMAIN))
        # P8 pdf sentinel, ref: fda_watcher.py:132-133
        .withColumn(
            "webpage_kind",
            F.when(F.lower("webpage").endswith(".pdf"), "pdf").otherwise("html"),
        )
        .withColumn(
            "rag_id", fingerprint_key("webpage", "title", "date")
        )
        .dropDuplicates(["rag_id"])  # A7: one record per URL
        .select(
            "rag_id",
            "title",
            F.col("webpage"),
            "description",
            "date",
            "webpage_kind",
            F.lit(scraped_at).alias("scraped_at"),
        )
    )
    if master is not None:
        new = scraped.join(
            F.broadcast(master.select("rag_id")), "rag_id", "left_anti"
        )
    else:
        new = scraped

    enriched = fetch_enrich(
        new.filter(
            F.col("webpage").isNotNull() & F.col("webpage").contains("http")
        ),
        url_col="webpage",
        out_col="text",
        transport=transport,
        min_len=0,
    ).withColumn(
        "text",
        F.when(F.col("webpage_kind") == "pdf", "[PDF CONTENT - REQUIRES OCR]")
        .otherwise(F.col("text")),
    ).drop("webpage_kind")

    base = master if master is not None else enriched.limit(0)
    updated = enriched.unionByName(
        base.select(*enriched.columns), allowMissingColumns=False
    ).orderBy(F.col("scraped_at").desc(), F.col("rag_id"))

    stats = enriched.agg(
        F.count("*").alias("n_new"),
        F.sum(F.when(F.length("text") > 0, 1).otherwise(0)).alias("n_fetched"),
        F.sum(F.when(F.length("text") == 0, 1).otherwise(0)).alias("n_failed"),
    )
    return WatcherResult(new_records=enriched, updated_master=updated, stats=stats)


# ---------------------------------------------------------------------------
# §3.2 — split & clean
# ---------------------------------------------------------------------------


def split_and_clean_pipeline(records: DataFrame) -> tuple[DataFrame, DataFrame]:
    """filter null RAG_ID -> clean corpus -> drop raw cols -> content hash.

    ref: json_split_and_clean.py:257-331. Returns (cleaned docs, manifest
    [rag_id, corpus_hash]) — the manifest is a select over the same plan.
    """
    valid = records.filter(
        F.col("rag_id").isNotNull() & (F.col("rag_id") != "")
    )
    cleaned = clean_corpus_df(valid, id_col="rag_id", text_col="text", out_col="corpus")
    docs = cleaned.drop("scraped_at").withColumn(
        "corpus_hash", F.md5("corpus")
    )
    manifest = docs.select("rag_id", "corpus_hash")
    return docs, manifest


# ---------------------------------------------------------------------------
# §3.3 — pdf chain: extract -> enrich/verify -> publish
# ---------------------------------------------------------------------------


def pdf_enrich_pipeline(
    extracted: DataFrame,
    pubmed: DataFrame,
    similarity_threshold: float = 0.90,
    exact_ratio: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Attach + verify PubMed metadata; split verified vs dead-letter.

    ref: pubmed_enrichment.py:312-456. `extracted` columns: doc_key, text,
    meta_title, meta_doi. `pubmed` columns: pm_key, pm_title, pm_doi,
    pm_citation, pm_pmid. Join key = doc_key/pm_key (the stubbed transport
    pre-resolves lookups; live mode fills `pubmed` via a fetch stage).
    """
    doi = F.coalesce(
        F.nullif(F.col("meta_doi"), F.lit("")), extract_doi_doc_level(F.col("text"))
    )
    docs = extracted.withColumn("local_doi", doi)
    joined = docs.join(
        F.broadcast(pubmed), docs["doc_key"] == pubmed["pm_key"], "left"
    )
    verdict = verify_match(
        F.col("meta_title"),
        F.col("local_doi"),
        F.col("pm_title"),
        F.col("pm_doi"),
        threshold=similarity_threshold,
        exact_ratio=exact_ratio,
    )
    scored = joined.withColumn("verdict", verdict)
    ok = scored.filter(F.col("verdict").isin("doi", "title")).select(
        "doc_key",
        F.coalesce("pm_title", F.lit("Unknown Title")).alias("title"),
        F.coalesce("pm_citation", F.lit("Citation unavailable (Unverified)")).alias(
            "citation"
        ),
        build_link(
            # DOI allowed in output only for DOI-verified matches
            F.when(F.col("verdict") == "doi", F.col("pm_doi")).otherwise(F.lit("")),
            F.coalesce("pm_pmid", F.lit("")),
        ).alias("link"),
        F.col("text").alias("corpus"),
    )
    dead = scored.filter(~F.col("verdict").isin("doi", "title")).select(
        "doc_key", "verdict", F.col("meta_title").alias("title")
    )
    return ok, dead


def publish_projection(docs: DataFrame, source_name: str, date_col: Column | None = None) -> DataFrame:
    """P1/P3: final RAG-record projection with defaults.

    ref: fda…/combine_json_to_jsonl.py:61-123; pdf…/combine_json_to_jsonl.py:63-80.
    Expects columns corpus/title (+ optional webpage/url fields upstream).
    """
    content = clean_content(strip_wrapper_prefix(unicode_normalize(F.col("corpus"))))
    url = F.col("link") if "link" in docs.columns else F.lit("")
    date = (
        date_col
        if date_col is not None
        else F.date_format(F.current_date(), "yyyy-MM-dd")
    )
    return docs.select(
        content.alias("content"),
        F.lit(source_name).alias("source"),
        url.alias("url"),
        date.alias("date"),
        F.lit("1.0").alias("version"),
        F.col("title").alias("title"),
    ).filter(F.length("content") > 0)
