"""Oracle-checked query registry modules (driver contract).

Importing this package fills ``rag_pipelines_spark.registry.REGISTRY``.
Modules are grouped by SURVEY.md §2 sections:

    relational   §2.1/2.2/2.6/2.7 — scans, projections, filters, sorts, set ops
    aggregates   §2.4 — counts, stats, rollup/cube, max_by, dedup
    joins        §2.3 — delta anti, semi, enrichment/fuzzy/fallback, range/asof
    windows      §2.5 — rank, lag/lead, frames, running totals
    text         §2.8 — the F-series scalar function queries
    streaming    §2.9 — event-time windows, sessionization, stream dedup
    tpch         §2.3/2.4 declared OLAP headliners — TPC-H Q1/Q3/Q5 shapes,
                 grouping sets
    extensions   §2.11 — dedup/similarity/text-analytics north-star ops
"""
