"""Retrieval-serving queries: BM25 lexical top-k, hybrid RRF fusion, and
RAG context assembly — the serving side of the reference's pipeline.

The reference repo prepares corpora FOR retrieval-augmented generation
(its README positions every pipeline as feeding a RAG index); these
queries close that loop inside the engine: given a batch of user queries,
rank the corpus lexically (BM25), fuse with the embedding-space ranking
(reciprocal-rank fusion), and assemble the ordered context block a
generator would consume. All three are oracle-checked — scoring math is
arranged so every float is bitwise identical in DuckDB (see
operators/retrieval.py docstring).

Scale posture: the query batch is tiny and broadcast everywhere; the
corpus is scanned once per retriever with no index-build shuffle, and the
only data-sized shuffle is the per-(query, doc) score combine over hit
rows. See operators/retrieval.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_pipelines_spark.operators.retrieval import (
    BM25_B,
    RRF_K,
    BM25_K1,
    BM25_K1_PLUS_1,
    BM25_ONE_MINUS_B,
    assemble_context,
    bm25_scores,
    rrf_fuse,
    term_hits,
    topk_per_query,
)
from rag_pipelines_spark.queries._util import o_dec_to_dbl, t
from rag_pipelines_spark.queries.extensions import _dot_dec
from rag_pipelines_spark.registry import register

# The serving batch: fixed literal queries over the fixture vocabulary
# (31 distinct words; "dup" is ~35x rarer than the rest, giving the idf
# real spread). Literal so the query set — like any serving batch — is
# data-independent and identical at every scale factor.
QUERY_SET: tuple[tuple[int, str], ...] = (
    (0, "spark join order"),
    (1, "dup scan table"),
    (2, "window agg batch fast"),
    (3, "customer query line"),
)

_QUERIES_SCHEMA = "query_id INT, query_text STRING"


def _queries_df(spark):
    return spark.createDataFrame(list(QUERY_SET), _QUERIES_SCHEMA)


def _qterms_df(spark):
    """(query_id, term) built driver-side from the literal batch — skips
    the explode+distinct jobs (the batch is tiny by definition)."""
    pairs = [
        (qid, term)
        for qid, text in QUERY_SET
        for term in dict.fromkeys(text.split(" "))
    ]
    return spark.createDataFrame(pairs, "query_id INT, term STRING")


def _sql_qterms() -> str:
    """VALUES list of (query_id, term) — the oracle's copy of the batch."""
    rows = ", ".join(
        f"({qid}, '{term}')"
        for qid, text in QUERY_SET
        for term in dict.fromkeys(text.split(" "))
    )
    return f"SELECT * FROM (VALUES {rows}) AS q(query_id, term)"


# Shared oracle CTE block: docs/stats/hits/dfs/BM25 per-pair scores.
# Constants are embedded via repr() of the SAME Python floats the Spark
# side uses, so both engines parse identical doubles.
def _sql_bm25_scored() -> str:
    return f"""
    docs AS (
        -- null-text docs excluded, mirroring bm25_scores' docs_nn filter
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS dl
        FROM documents WHERE text IS NOT NULL
    ),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM docs),
    qterms AS ({_sql_qterms()}),
    uterms AS (SELECT DISTINCT term FROM qterms),
    hits AS (
        SELECT doc_id, dl, term,
               len(list_filter(toks, x -> x = term)) AS tf
        FROM docs CROSS JOIN uterms
        WHERE len(list_filter(toks, x -> x = term)) > 0
    ),
    dfs AS (SELECT term, COUNT(*) AS dfreq FROM hits GROUP BY term),
    contribs AS (
        SELECT q.query_id, h.doc_id,
               CAST(
                 ln((CAST(s.n_docs - f.dfreq AS DOUBLE) + 0.5)
                    / (CAST(f.dfreq AS DOUBLE) + 0.5) + 1.0)
                 * ((CAST(h.tf AS DOUBLE) * {BM25_K1_PLUS_1!r})
                    / (CAST(h.tf AS DOUBLE)
                       + {BM25_K1!r} * ({BM25_ONE_MINUS_B!r}
                          + {BM25_B!r} * (CAST(h.dl AS DOUBLE)
                             / (CAST(s.sum_dl AS DOUBLE)
                                / CAST(s.n_docs AS DOUBLE))))))
               AS DECIMAL(30,15)) AS c
        FROM hits h
        JOIN dfs f USING (term)
        JOIN qterms q USING (term)
        CROSS JOIN stats s
    ),
    scored AS (
        SELECT query_id, doc_id,
               round({o_dec_to_dbl("SUM(c)")}, 9) AS score
        FROM contribs GROUP BY query_id, doc_id
    )"""


@register(
    "q_bm25_topk",
    oracle=f"""
    WITH {_sql_bm25_scored()}
    SELECT query_id, doc_id, score, rk FROM (
        SELECT query_id, doc_id, score,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, doc_id) AS rk
        FROM scored
    ) WHERE rk <= 10
    """,
    doc="BM25 lexical top-10 per query over documents: tf from a broadcast "
    "term list (no corpus explode/index shuffle), idf/avgdl from one "
    "stats row, decimal-summed contributions (operators/retrieval.py)",
)
def q_bm25_topk(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    scored = bm25_scores(docs, _queries_df(spark), qterms=_qterms_df(spark))
    return topk_per_query(scored, 10).select("query_id", "doc_id", "score", "rk")


def _cosine_ranked(spark, sf_dir, k: int):
    """(query_id, doc_id, rk): embedding-space top-k per query vector.

    Query vectors are embeddings with vec_id == query_id (the serving
    batch's dense twin); candidates are the whole embeddings table minus
    self. Same brute-force-baseline posture as q_cosine_topk — the scale
    path is operators/similarity.py's LSH/IVF candidate generation.
    """
    e = t(spark, sf_dir, "embeddings")
    norms = e.select(
        "vec_id",
        "embedding",
        _dot_dec(F.col("embedding"), F.col("embedding")).cast("double").alias("n2"),
    )
    nq = len(QUERY_SET)
    q = norms.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("qn2"),
    )
    c = norms.select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").alias("c_emb"),
        F.col("n2").alias("cn2"),
    )
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("doc_id"))
    cosine = F.round(
        _dot_dec(F.col("q_emb"), F.col("c_emb")).cast("double")
        / (F.sqrt("qn2") * F.sqrt("cn2")),
        9,
    )
    ranked = topk_per_query(
        pairs.withColumn("score", cosine), k, score_col="score"
    )
    return ranked.select("query_id", "doc_id", "rk")


def _sql_cosine_ranked(k: int, nq: int) -> str:
    return f"""
    norms AS (
        SELECT vec_id, embedding,
               CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                             AS DECIMAL(30,15))) AS DOUBLE) AS n2
        FROM (SELECT vec_id, embedding, unnest(embedding) AS x FROM embeddings)
        GROUP BY vec_id, embedding
    ),
    vpairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
               q.embedding AS q_emb, c.embedding AS c_emb,
               q.n2 AS qn2, c.n2 AS cn2
        FROM norms q, norms c
        WHERE q.vec_id < {nq} AND q.vec_id <> c.vec_id
    ),
    vdots AS (
        SELECT query_id, doc_id, qn2, cn2,
               CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)
                             AS DECIMAL(30,15))) AS DOUBLE) AS dot
        FROM (SELECT query_id, doc_id, qn2, cn2,
                     unnest(q_emb) AS x, unnest(c_emb) AS y FROM vpairs)
        GROUP BY query_id, doc_id, qn2, cn2
    ),
    vranked AS (
        SELECT query_id, doc_id, rk FROM (
            SELECT query_id, doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY round(dot / (sqrt(qn2) * sqrt(cn2)), 9) DESC,
                                doc_id) AS rk
            FROM vdots
        ) WHERE rk <= {k}
    )"""




def _sql_fusion_block() -> str:
    """Shared lranked/vranked/fused CTE chain (top-20 lists, RRF k=RRF_K)
    — used verbatim by BOTH q_rrf_fusion and q_retrieval_eval so the two
    oracles cannot drift."""
    return f"""
    lranked AS (
        SELECT query_id, doc_id, rk FROM (
            SELECT query_id, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, doc_id) AS rk
            FROM scored
        ) WHERE rk <= 20
    ),
    {_sql_cosine_ranked(20, len(QUERY_SET))},
    fused AS (
        SELECT COALESCE(l.query_id, v.query_id) AS query_id,
               COALESCE(l.doc_id, v.doc_id) AS doc_id,
               round(COALESCE(1.0 / ({RRF_K!r} + CAST(l.rk AS DOUBLE)), 0.0)
                     + COALESCE(1.0 / ({RRF_K!r} + CAST(v.rk AS DOUBLE)), 0.0),
                     9) AS rrf
        FROM lranked l
        FULL OUTER JOIN vranked v
          ON l.query_id = v.query_id AND l.doc_id = v.doc_id
    )"""


@register(
    "q_rrf_fusion",
    oracle=f"""
    WITH {_sql_bm25_scored()},
    {_sql_fusion_block()}
    SELECT query_id, doc_id, rrf, rk FROM (
        SELECT query_id, doc_id, rrf,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY rrf DESC, doc_id) AS rk
        FROM fused
    ) WHERE rk <= 10
    """,
    doc="hybrid retrieval: reciprocal-rank fusion (k=60) of the BM25 "
    "top-20 and the embedding-cosine top-20 per query, re-ranked to a "
    "fused top-10 — both input lists are per-query-small, so fusion cost "
    "is independent of corpus size",
)
def q_rrf_fusion(spark, sf_dir):
    from rag_pipelines_spark.operators.concurrency import run_all

    docs = t(spark, sf_dir, "documents")
    # the two rankers are independent job chains: the lexical side
    # materializes the bm25 term-hits frame (eager checkpoint inside
    # bm25_scores), the vector side is the brute-force cosine ranking —
    # overlap the hits checkpoint with an eager materialization of the
    # (per-query-small) top-20 vector list (guide §2.6), then fuse the
    # two small ranked lists. Same rows on both sides, so the fused
    # output is bit-identical to the sequential composition.
    lex, vec = run_all(
        lambda: topk_per_query(
            bm25_scores(docs, _queries_df(spark), qterms=_qterms_df(spark)),
            20,
        ).select("query_id", "doc_id", "rk"),
        lambda: _cosine_ranked(spark, sf_dir, 20).localCheckpoint(eager=True),
    )
    fused = rrf_fuse(lex, vec)
    return topk_per_query(fused, 10, score_col="rrf").select(
        "query_id", "doc_id", "rrf", "rk"
    )


@register(
    "q_retrieval_eval",
    oracle=f"""
    WITH {_sql_bm25_scored()},
    {_sql_fusion_block()},
    hranked AS (
        SELECT query_id, doc_id, rk FROM (
            SELECT query_id, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY rrf DESC, doc_id) AS rk
            FROM fused
        ) WHERE rk <= 10
    ),
    vref AS (
        SELECT query_id, doc_id, rk AS vrk FROM vranked WHERE rk <= 10
    ),
    joined AS (
        SELECT h.query_id, h.rk, v.vrk
        FROM hranked h
        LEFT JOIN vref v
          ON h.query_id = v.query_id AND h.doc_id = v.doc_id
    )
    SELECT query_id,
           CAST(COUNT(vrk) AS BIGINT) AS n_overlap,
           CAST(COUNT(vrk) AS DOUBLE) / 10.0 AS recall_at_10,
           COALESCE(1.0 / CAST(MIN(CASE WHEN vrk IS NOT NULL THEN rk END)
                               AS DOUBLE), 0.0) AS mrr
    FROM joined GROUP BY query_id
    """,
    doc="retrieval eval harness: recall@10 and MRR of the hybrid RRF list "
    "against the exact-cosine reference list per query (how much of the "
    "dense signal survives fusion) — joined on two per-query-small top-k "
    "lists so eval cost is independent of corpus size",
)
def q_retrieval_eval(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    lex = topk_per_query(
        bm25_scores(docs, _queries_df(spark), qterms=_qterms_df(spark)), 20
    ).select(
        "query_id", "doc_id", "rk"
    )
    vec20 = _cosine_ranked(spark, sf_dir, 20)
    hybrid = topk_per_query(rrf_fuse(lex, vec20), 10, score_col="rrf").select(
        "query_id", "doc_id", "rk"
    )
    vref = vec20.filter(F.col("rk") <= 10).withColumnRenamed("rk", "vrk")
    joined = hybrid.join(vref, ["query_id", "doc_id"], "left")
    first_rel = F.min(F.when(F.col("vrk").isNotNull(), F.col("rk")))
    return joined.groupBy("query_id").agg(
        F.count("vrk").alias("n_overlap"),
        (F.count("vrk").cast("double") / F.lit(10.0)).alias("recall_at_10"),
        F.coalesce(
            F.lit(1.0) / first_rel.cast("double"), F.lit(0.0)
        ).alias("mrr"),
    )


@register(
    "q_rag_context",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
    ),
    qterms AS ({_sql_qterms()}),
    ovl AS (
        SELECT q.query_id, d.doc_id,
               COUNT(DISTINCT q.term) AS n_terms,
               ANY_VALUE(substring(d.text, 1, 60)) AS snippet
        FROM docs d JOIN qterms q
          ON len(list_filter(d.toks, x -> x = q.term)) > 0
        GROUP BY q.query_id, d.doc_id
    ),
    ranked AS (
        SELECT query_id, doc_id, snippet,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY n_terms DESC, doc_id) AS rk
        FROM ovl
    )
    SELECT query_id,
           CAST(COUNT(*) AS BIGINT) AS n_ctx,
           string_agg(snippet, ' | ' ORDER BY rk) AS context
    FROM ranked WHERE rk <= 3
    GROUP BY query_id
    """,
    doc="RAG context assembly: top-3 docs per query by distinct-term "
    "overlap (exact integer score), 60-char snippets concatenated in rank "
    "order via sorted-struct collect (partition-invariant) — the "
    "prompt-building step a generator consumes",
)
def q_rag_context(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    qterms = _qterms_df(spark)
    uterms = qterms.select("term").distinct()
    hits = term_hits(docs, uterms)  # (doc_id, dl, term, tf>0)
    overlaps = (
        hits.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count_distinct("term").alias("n_terms"))
    )
    snippets = docs.select("doc_id", F.substring("text", 1, 60).alias("snippet"))
    ranked = topk_per_query(
        overlaps.join(snippets, "doc_id"), 3, score_col="n_terms"
    )
    return assemble_context(ranked).select("query_id", "n_ctx", "context")


@register(
    "q_inverted_index",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    )
    SELECT term, doc_id % 8 AS shard,
           CAST(COUNT(*) AS BIGINT) AS df_shard,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
    FROM pairs GROUP BY term, shard
    """,
    doc="offline inverted-index build, SHARDED posting lists: "
    "pmod(doc_id, 8) bounds every row by |corpus|/shards so a "
    "stopword-grade term cannot funnel the corpus through one task; "
    "lists sorted + comma-joined for partition-invariant output "
    "(operators/retrieval.py::build_inverted_index). The serving path "
    "stays index-free by design",
)
def q_inverted_index(spark, sf_dir):
    from rag_pipelines_spark.operators.retrieval import build_inverted_index

    return build_inverted_index(t(spark, sf_dir, "documents")).select(
        "term", "shard", "df_shard", "postings"
    )


@register(
    "q_bm25_from_state",
    oracle=f"""
    WITH {_sql_bm25_scored()}
    SELECT query_id, doc_id, score, rk FROM (
        SELECT query_id, doc_id, score,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, doc_id) AS rk
        FROM scored
    ) WHERE rk <= 10
    """,
    doc="BM25 served from ACCRETED corpus-stats state: three batches "
    "merged via merge_corpus_stats (manifest scheme), then idf/avgdl "
    "read from state instead of re-aggregating the corpus — the oracle "
    "is the DIRECT BM25 computation, so the driver gate itself proves "
    "state-served == direct bitwise (the incremental serving path of "
    "operators/retrieval.py)",
)
def q_bm25_from_state(spark, sf_dir):
    import shutil

    from rag_pipelines_spark.operators.retrieval import (
        corpus_stats,
        merge_corpus_stats,
    )
    from rag_pipelines_spark.queries.sources import _scratch

    docs = t(spark, sf_dir, "documents")
    state = _scratch("bm25-state", sf_dir)
    shutil.rmtree(state, ignore_errors=True)  # additive state: fresh per run
    for r in range(3):
        merge_corpus_stats(
            spark, docs.filter(F.col("doc_id") % 3 == r), state
        )
    scored = bm25_scores(
        docs,
        _queries_df(spark),
        corpus_stats=corpus_stats(spark, state),
        qterms=_qterms_df(spark),
    )
    return topk_per_query(scored, 10).select("query_id", "doc_id", "score", "rk")


@register(
    "q_term_pmi",
    oracle="""
    WITH dt AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM dt),
    dfreq AS (SELECT term, COUNT(*) AS c FROM dt GROUP BY term),
    pairs AS (
        SELECT a.term AS t1, b.term AS t2, COUNT(*) AS c12
        FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
        GROUP BY a.term, b.term
    )
    SELECT t1, t2, c12,
           round(ln((CAST(c12 AS DOUBLE) * CAST(n.n_docs AS DOUBLE))
                 / (CAST(f1.c AS DOUBLE) * CAST(f2.c AS DOUBLE))), 9) AS pmi
    FROM pairs
    JOIN dfreq f1 ON f1.term = t1
    JOIN dfreq f2 ON f2.term = t2
    CROSS JOIN n
    WHERE c12 >= 5
    """,
    doc="PMI term co-occurrence (query-expansion statistics) via "
    "operators/retrieval.py::term_pmi: document-level pairs from a "
    "(doc, distinct-term) self-join on doc_id, pmi = "
    "ln(P(t1,t2)/(P(t1)P(t2))) over document frequencies. Scale: the "
    "pair build is quadratic in PER-DOC distinct terms — the operator's "
    "max_terms_per_doc caps each doc to a deterministic hash-ranked "
    "top-k slice before pairing (bound pinned in test_retrieval.py); "
    "the fixture calls it UNCAPPED (vocab 31) so the oracle is exact. "
    "PMI magnitude <= ln(N_docs) so round(,9) is cross-engine safe",
)
def q_term_pmi(spark, sf_dir):
    from rag_pipelines_spark.operators.retrieval import term_pmi

    return term_pmi(
        t(spark, sf_dir, "documents"),
        min_pair_count=5,
        max_terms_per_doc=None,  # fixture-exact; web-scale callers MUST cap
    )


@register(
    "q_hard_negatives",
    oracle=f"""
    WITH {_sql_bm25_scored()},
    {_sql_fusion_block()}
    SELECT query_id, doc_id, 'positive' AS role, rk
    FROM vranked WHERE rk <= 1
    UNION ALL
    SELECT l.query_id, l.doc_id, 'hard_negative' AS role, l.rk
    FROM lranked l
    LEFT JOIN (SELECT query_id, doc_id FROM vranked WHERE rk <= 3) p
      ON l.query_id = p.query_id AND l.doc_id = p.doc_id
    WHERE p.doc_id IS NULL AND l.rk <= 10
    """,
    doc="hard-negative mining for embedding-model training (the DPR "
    "recipe, Karpukhin et al. 2020): per query, the positive is the "
    "exact-cosine top-1; hard negatives are BM25 lexical top-10 hits "
    "that are NOT in the dense top-3 — lexically similar yet "
    "semantically wrong, the pairs contrastive training needs most. "
    "Both inputs are per-query-small top-k lists, so mining cost is "
    "independent of corpus size once the two rankers ran",
)
def q_hard_negatives(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    lex = topk_per_query(
        bm25_scores(docs, _queries_df(spark), qterms=_qterms_df(spark)), 20
    ).select("query_id", "doc_id", "rk")
    vec = _cosine_ranked(spark, sf_dir, 20)
    pos = vec.filter(F.col("rk") <= 1).select(
        "query_id", "doc_id", F.lit("positive").alias("role"), "rk"
    )
    near_pos = vec.filter(F.col("rk") <= 3).select("query_id", "doc_id")
    neg = (
        lex.filter(F.col("rk") <= 10)
        .join(near_pos, ["query_id", "doc_id"], "left_anti")
        .select(
            "query_id", "doc_id", F.lit("hard_negative").alias("role"), "rk"
        )
    )
    return pos.unionByName(neg)


@register(
    "q_maxsim_topk",
    oracle="""
    WITH toks AS (
        SELECT vec_id, CAST((s - 1) // 8 AS INT) AS tok,
               (s - 1) % 8 AS pos, x
        FROM (SELECT vec_id, unnest(embedding) AS x,
                     generate_subscripts(embedding, 1) AS s
              FROM embeddings)
    ),
    tnorm AS (
        SELECT vec_id, tok,
               CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                             AS DECIMAL(30,15))) AS DOUBLE) AS n2
        FROM toks GROUP BY vec_id, tok
    ),
    tdot AS (
        SELECT q.vec_id AS query_id, q.tok AS q_tok,
               c.vec_id AS doc_id, c.tok AS d_tok,
               CAST(SUM(CAST(CAST(q.x AS DOUBLE) * CAST(c.x AS DOUBLE)
                             AS DECIMAL(30,15))) AS DOUBLE) AS dot
        FROM toks q JOIN toks c ON q.pos = c.pos
        WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id
        GROUP BY 1, 2, 3, 4
    ),
    tcos AS (
        SELECT d.query_id, d.doc_id, d.q_tok,
               MAX(CAST(FLOOR(d.dot / (sqrt(qn.n2) * sqrt(cn.n2)) * 1e9
                              + 0.5) AS BIGINT)) AS best_nanos
        FROM tdot d
        JOIN tnorm qn ON qn.vec_id = d.query_id AND qn.tok = d.q_tok
                     AND qn.n2 > 0
        JOIN tnorm cn ON cn.vec_id = d.doc_id AND cn.tok = d.d_tok
                     AND cn.n2 > 0
        GROUP BY 1, 2, 3
    ),
    scored AS (
        SELECT query_id, doc_id,
               CAST(SUM(best_nanos) AS DOUBLE) / 1e9 AS maxsim
        FROM tcos GROUP BY 1, 2
    ),
    ranked AS (
        SELECT query_id, doc_id, maxsim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY maxsim DESC, doc_id) AS rk
        FROM scored
    )
    SELECT query_id, doc_id, maxsim, rk FROM ranked WHERE rk <= 5
    """,
    doc="late-interaction (ColBERT MaxSim) top-k: each 64-dim embedding "
    "is split into 8 token sub-vectors; score(q,d) = Σ over query "
    "tokens of max over doc tokens of per-token cosine (Khattab & "
    "Zaharia 2020). Query batch = vec_id < 8, broadcast everywhere; "
    "corpus token frame is a zero-shuffle projection; the one shuffle "
    "is the map-side-combinable (query, doc, q_tok) max-reduce. Token "
    "cosines are exact-decimal dot / sqrt norms quantized to BIGINT "
    "nanos via FLOOR(cos*1e9+0.5) (drift.py recipe — round(double,9) "
    "diverges cross-engine near half boundaries); maxima and sums stay "
    "integer, one final /1e9 — bitwise cross-engine by construction",
)
def q_maxsim_topk(spark, sf_dir):
    from rag_pipelines_spark.operators.retrieval import (
        embedding_tokens,
        maxsim_scores,
    )

    toks = embedding_tokens(t(spark, sf_dir, "embeddings"))
    scored = maxsim_scores(
        toks.filter(F.col("id") < 8), toks, exclude_self=True
    )
    return topk_per_query(scored, 5, score_col="maxsim").select(
        "query_id", "doc_id", "maxsim", "rk"
    )


@register(
    "q_maxsim_pruned",
    oracle=None,  # candidate generation is an Arrow-matmul IVF
    # assignment (numpy nearest-centroid) — not SQL-expressible;
    # correctness is pinned by (a) tests/test_retrieval.py: pruned
    # scores EQUAL exact-tier scores on every surviving pair (same
    # arithmetic by construction) and recall@5 >= pin on a clustered
    # fixture, (b) the MaxSim recall ladder
    # (tools/ann_recall_ladder.py --maxsim) at 2k/20k/200k.
    doc="pruned MaxSim tier (PLAID / ColBERTv2 two-stage): IVF cells "
    "over token sub-vectors (deterministic hash-sampled centroids, "
    "Lloyd-refined) produce candidate (query, doc) pairs from an "
    "equi-join on cell + a >= min_matches distinct-query-token vote; "
    "the exact nano-quantized MaxSim re-ranks candidates only — "
    "O(candidates), never |Q|x corpus. Same top-5-per-query shape as "
    "q_maxsim_topk, so side-by-side recall audits are a join away. On "
    "the hash-uniform driver fixture recall tracks probe fraction "
    "(documented ANN worst case, SCALE.md); the clustered regime it "
    "is FOR is pinned in tests and measured in the ladder",
)
def q_maxsim_pruned(spark, sf_dir):
    from rag_pipelines_spark.operators.retrieval import (
        embedding_tokens,
        maxsim_candidates_ivf,
        maxsim_scores,
    )

    toks = embedding_tokens(t(spark, sf_dir, "embeddings"))
    qtoks = toks.filter(F.col("id") < 8)
    # Setting picked empirically (round 10): on the 400-doc clustered
    # fixture this exact config scores recall@5 = 1.0 at 27% probe
    # fraction (tests/test_retrieval.py pins >= 0.8); on the uniform
    # driver fixture it cuts candidate pairs to ~14% and end-to-end
    # cost to ~3.1 s vs the exact tier's 7.4 s at sf0.1. Lloyd refine
    # measured cost-neutral for recall here (sampled centroids already
    # cover the token space at this density) — left off.
    cand = maxsim_candidates_ivf(
        qtoks, toks, n_cells=128, nprobe=2, min_matches=4,
        refine_iters=0, exclude_self=True,
    )
    scored = maxsim_scores(qtoks, toks, candidates=cand)
    return topk_per_query(scored, 5, score_col="maxsim").select(
        "query_id", "doc_id", "maxsim", "rk"
    )


@register(
    "q_maxsim_topk_small",
    oracle="""
    WITH toks AS (
        SELECT vec_id, CAST((s - 1) // 8 AS INT) AS tok,
               (s - 1) % 8 AS pos, x
        FROM (SELECT vec_id, unnest(embedding) AS x,
                     generate_subscripts(embedding, 1) AS s
              FROM embeddings)
        WHERE vec_id < 8 OR vec_id % 10 = 0
    ),
    tnorm AS (
        SELECT vec_id, tok,
               CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                             AS DECIMAL(30,15))) AS DOUBLE) AS n2
        FROM toks GROUP BY vec_id, tok
    ),
    tdot AS (
        SELECT q.vec_id AS query_id, q.tok AS q_tok,
               c.vec_id AS doc_id, c.tok AS d_tok,
               CAST(SUM(CAST(CAST(q.x AS DOUBLE) * CAST(c.x AS DOUBLE)
                             AS DECIMAL(30,15))) AS DOUBLE) AS dot
        FROM toks q JOIN toks c ON q.pos = c.pos
        WHERE q.vec_id < 8 AND c.vec_id % 10 = 0 AND q.vec_id <> c.vec_id
        GROUP BY 1, 2, 3, 4
    ),
    tcos AS (
        SELECT d.query_id, d.doc_id, d.q_tok,
               MAX(CAST(FLOOR(d.dot / (sqrt(qn.n2) * sqrt(cn.n2)) * 1e9
                              + 0.5) AS BIGINT)) AS best_nanos
        FROM tdot d
        JOIN tnorm qn ON qn.vec_id = d.query_id AND qn.tok = d.q_tok
                     AND qn.n2 > 0
        JOIN tnorm cn ON cn.vec_id = d.doc_id AND cn.tok = d.d_tok
                     AND cn.n2 > 0
        GROUP BY 1, 2, 3
    ),
    scored AS (
        SELECT query_id, doc_id,
               CAST(SUM(best_nanos) AS DOUBLE) / 1e9 AS maxsim
        FROM tcos GROUP BY 1, 2
    ),
    ranked AS (
        SELECT query_id, doc_id, maxsim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY maxsim DESC, doc_id) AS rk
        FROM scored
    )
    SELECT query_id, doc_id, maxsim, rk FROM ranked WHERE rk <= 5
    """,
    doc="bounded big-SF twin of q_maxsim_topk (the "
    "q_pretraining_prep_checksum_small pattern): identical dataflow and "
    "nano-quantized arithmetic, corpus deterministically narrowed to "
    "vec_id % 10 = 0 (10% — sf100's 2M embeddings become a 200k-doc "
    "corpus, which is exactly the sf10 full-query cost the DuckDB "
    "oracle is measured to sustain). Exists because the VERIFY side is "
    "the ceiling: the engine runs the full corpus fine, but the "
    "oracle's |Q|x corpus token-cosine CTE is ~10 min at 200k docs and "
    "~10x that at 2M — the twin keeps the sf100 differential "
    "exemption-free (r9 VERDICT 'Next' #4)",
)
def q_maxsim_topk_small(spark, sf_dir):
    from rag_pipelines_spark.operators.retrieval import (
        embedding_tokens,
        maxsim_scores,
    )

    toks = embedding_tokens(t(spark, sf_dir, "embeddings"))
    qtoks = toks.filter(F.col("id") < 8)
    ctoks = toks.filter(F.col("id") % 10 == 0)
    scored = maxsim_scores(qtoks, ctoks, exclude_self=True)
    return topk_per_query(scored, 5, score_col="maxsim").select(
        "query_id", "doc_id", "maxsim", "rk"
    )
