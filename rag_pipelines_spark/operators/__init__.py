"""DataFrame -> DataFrame operators (cleaning, dedup, delta, enrichment,
similarity, text analytics)."""
