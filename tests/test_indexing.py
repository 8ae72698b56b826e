"""Property tests for the block-offset global indexing operators
(operators/indexing.py): on arbitrary integral inputs — duplicates,
negatives, skewed blocks, tiny block sizes — the scale-safe formulations
must equal Spark's own global-window answers exactly."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


@pytest.fixture(scope="module")
def spark():
    from rag_pipelines_spark.session import get_spark

    return get_spark("indexing-tests", shuffle_partitions=5)


ids_strategy = st.lists(
    st.integers(min_value=-(10**6), max_value=10**6),
    min_size=1,
    max_size=120,
    unique=True,
)


@settings(max_examples=25, deadline=None)
@given(ids=ids_strategy, block_size=st.sampled_from([1, 3, 64, 10**7]))
def test_global_row_index_equals_global_window(spark, ids, block_size):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from rag_pipelines_spark.operators.indexing import global_row_index

    df = spark.createDataFrame([(i,) for i in ids], "k long").repartition(5)
    got = {
        r.k: r.row_index
        for r in global_row_index(df, "k", block_size=block_size).collect()
    }
    want = {
        r.k: r.i
        for r in df.select(
            "k", (F.row_number().over(Window.orderBy("k")) - 1).alias("i")
        ).collect()
    }
    assert got == want


@settings(max_examples=25, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=500), min_size=1, max_size=120
    ),
    k=st.sampled_from([1, 2, 4, 7, 150]),
    block_size=st.sampled_from([1, 8, 1000]),
)
def test_global_ntile_equals_sql_ntile(spark, vals, k, block_size):
    """Non-unique values (ties spanning blocks), n<k, k=1, skew — all must
    match NTILE(k) OVER (ORDER BY v, id) bit for bit."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from rag_pipelines_spark.operators.indexing import global_ntile

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(5)
    got = {
        r.id: r.bucket
        for r in global_ntile(df, "v", "id", k=k, block_size=block_size).collect()
    }
    want = {
        r.id: r.b
        for r in df.select(
            "id",
            F.ntile(k).over(Window.orderBy("v", "id")).cast("long").alias("b"),
        ).collect()
    }
    assert got == want
