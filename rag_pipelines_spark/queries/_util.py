"""Shared helpers for oracle-checked queries.

Determinism contract: any float that reaches a query's output must be
bit-identical between Spark and DuckDB regardless of row/partition order.
The trick used throughout: aggregate through *exact decimals* (associative
and order-independent), cast the final value to double. Per-row scalar
double math (products, divisions of identical inputs) is IEEE-deterministic
already and needs no special handling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from rag_pipelines_spark.io import table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return table(spark, sf_dir, name)


def dec(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Cast to an exact decimal for order-independent aggregation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dec_to_dbl(s: Column) -> Column:
    """Bit-reproducible decimal -> double.

    A plain CAST(decimal AS DOUBLE) diverges between engines once the
    value carries >15 significant digits: DuckDB converts int128 storage
    to double FIRST and divides by 10^scale SECOND (two roundings), while
    Java's BigDecimal.doubleValue rounds once — observed as a 1-ULP
    mismatch on TPC-H Q1's sum_charge at sf1 (17 digits). Splitting into
    integer + fraction makes each part exactly representable (integer
    part < 2^53, fraction numerator < 10^scale), so BOTH engines perform
    exactly one rounding per part and the final addition is exact-input
    IEEE — identical bits. Mirror: o_dec_to_dbl.
    """
    i = F.floor(s)
    return i.cast("double") + (s - i).cast("double")


def dsum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent SUM of a double column, returned as double."""
    return dec_to_dbl(F.sum(dec(col, scale, precision)))


def davg(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale, precision) / F.count(c)


# DuckDB-side fragments mirroring the helpers above.
def o_dec_to_dbl(sum_expr: str) -> str:
    """Mirror of dec_to_dbl (the aggregate is named twice; exact both
    times, so evaluation count can't change the value)."""
    return (
        f"(CAST(FLOOR({sum_expr}) AS DOUBLE)"
        f" + CAST({sum_expr} - FLOOR({sum_expr}) AS DOUBLE))"
    )


def o_dsum(expr: str, scale: int = 2, precision: int = 18) -> str:
    return o_dec_to_dbl(f"SUM(CAST({expr} AS DECIMAL({precision},{scale})))")


def o_davg(expr: str, scale: int = 2, precision: int = 18) -> str:
    return f"({o_dsum(expr, scale, precision)} / COUNT({expr}))"


def md5_long_digest(*cols: Column) -> Column:
    """60-bit row digest: first 15 md5 hex nibbles of the '|'-joined
    string forms, as a long. Engine-portable (md5 is md5; 15 nibbles fit
    a signed 64-bit exactly) and XOR-safe — the checksum-twin pattern
    aggregates these with bit_xor for an order-insensitive, overflow-free
    signature of an unbounded row set. DuckDB mirror:
    CAST(concat('0x', substr(md5(a || '|' || b), 1, 15)) AS BIGINT).
    """
    return F.conv(F.substring(F.md5(F.concat_ws("|", *cols)), 1, 15), 16, 10).cast(
        "long"
    )
