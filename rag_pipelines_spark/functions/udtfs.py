"""Python UDTFs (Spark 4 user-defined table functions).

The reference's record→records transforms (one JSON in, several cleaned
records out — json_split_and_clean.py:257-331) map naturally onto UDTFs:
an `eval` that yields N rows per input row, invoked laterally per row of
a driving table. This is the API-surface demonstration; the production
chunker stays the pure-column explode(sequence) in queries/extensions.py
(q_chunking) — JVM-side, no Python boundary — and the two are
hash-checked against the SAME DuckDB oracle to prove equivalence.

Arrow transfer (`useArrow=True`) batches rows across the Python boundary;
still, prefer column expressions in hot paths (SCALE.md).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx bigint, chunk string", useArrow=True)
class ChunkUDTF:
    """Fixed-size overlapping chunks: size=100, stride=80 (mirrors
    q_chunking's explode(sequence) math exactly)."""

    def eval(self, text: str):  # noqa: D102 — contract defined above
        if text is None or text == "":
            return
        n_chunks = (len(text) - 1) // 80  # last start index
        for i in range(n_chunks + 1):
            chunk = text[i * 80 : i * 80 + 100]
            if chunk != "":
                yield (i, chunk)


def register_udtfs(spark) -> None:
    """Register every UDTF for SQL lateral use."""
    spark.udtf.register("chunk_udtf", ChunkUDTF)
