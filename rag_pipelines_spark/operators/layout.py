"""Z-order (Morton-curve) data layout for multi-dimensional file skipping.

Why it exists: partitioned-parquet pruning (sources/files.py) handles ONE
low-cardinality key. A 100 TB fact table queried by range on several
dimensions at once (user AND time, price AND date) wants files whose
min/max footer stats are tight on *all* of them simultaneously — which is
exactly what sorting by an interleaved-bit (Morton) key gives: the curve
keeps multi-dimensional neighborhoods in the same files, so a 2-D box
predicate touches O(perimeter) files instead of O(rows)/O(stripe).

Spark-first shape: the z-key is pure JVM integer column math (shift/mask/
or — whole-stage codegen, no UDF), the layout write is one
repartitionByRange on the key (a single range shuffle — same cost as any
sort-based write), and the *reader needs no cooperation*: skipping comes
from ordinary parquet row-group/file min-max stats on the plain columns.

Bounded normalization: bit interleaving needs each dimension in
[0, 2^bits). Two modes:

* ``normalize="minmax"`` (default): affine rescale from the observed
  [min, max] — one tiny all-agg row, broadcast, key stays a pure
  expression. OUTLIER-FRAGILE by construction: one extreme value
  stretches the range so every normal value lands in bucket ~0 and that
  dimension's effective bits collapse (skipping degrades to a 1-D sort
  on the surviving dimensions).
* ``normalize="quantile"``: bucket by approx-quantile boundaries (one
  approxQuantile pass per column — O(data) with no shuffle, boundaries
  collected driver-side and embedded as literals), so buckets are
  equal-POPULATION regardless of value skew; a planted outlier occupies
  one top bucket and the rest keep full resolution (measured in
  tests/test_layout.py). Per-row cost is O(2^bits) codegen'd
  comparisons per dimension (count-of-boundaries-below via an array
  filter), so quantile mode wants modest bits — 8 (256 buckets) covers
  thousands of output files; it is capped at 12.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_to_bits(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Affine-rescale col from [cmin, cmax] to an integer in [0, 2^bits).

    All arithmetic in double on the RAW values — subtracting BEFORE any
    truncation, so fractional columns scale correctly (casting col and
    cmin to long separately let a double column exceed 2^bits-1 and
    invert order; and a fractional span under 1.0 truncated to 0,
    collapsing the dimension). The result is clamped to [0, 2^bits-1] as
    a belt-and-braces bound for floating rounding at the top edge.
    Deterministic cross-engine: products stay < 2^53 for any sane
    dimension span (for integer columns the double path computes exactly
    the same values as integer math). Degenerate range (cmax == cmin)
    maps to 0.
    """
    span = (cmax - cmin).cast("double")
    top = F.lit(float((1 << bits) - 1))
    scaled = F.floor(
        (col.cast("double") - cmin.cast("double")) * top / span
    )
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), top).cast("long")
    return F.when(span > 0, clamped).otherwise(F.lit(0).cast("long"))


def _interleave(cols: list[Column], bits: int) -> Column:
    """Morton key: bit b of dimension d lands at position b*len(cols)+d."""
    n = len(cols)
    if bits * n > 63:
        # JVM shiftleft wraps the shift count mod 64 (silent bit
        # collisions), and position 63 is the long's sign bit (range
        # partitioning would split the curve at the wrap) — refuse.
        raise ValueError(
            f"bits*dims = {bits * n} exceeds 63 — lower bits= (e.g. "
            f"{63 // n}) or drop dimensions"
        )
    terms = [
        F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + d)
        for b in range(bits)
        for d, c in enumerate(cols)
    ]
    return reduce(lambda a, t: a.bitwiseOR(t), terms[1:], terms[0]).alias("zkey")


def _quantile_bucket(col: Column, bounds: list[float], bits: int) -> Column:
    """Bucket index in [0, 2^bits) = number of quantile boundaries <= col.

    The boundaries are driver-collected literals; the count is a codegen'd
    array filter (no UDF, no shuffle). NULLs bucket to 0 (comparisons with
    NULL drop out of the filter), matching minmax's degenerate handling.
    """
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    idx = F.size(F.filter(arr, lambda b: b <= col.cast("double")))
    top = F.lit((1 << bits) - 1)
    return F.least(F.greatest(idx, F.lit(0)), top).cast("long")


def zorder_key(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 16,
    normalize: str = "minmax",
) -> DataFrame:
    """Append a ``zkey`` column interleaving the given numeric columns.

    ``normalize="minmax"``: one tiny min/max aggregate (broadcast back
    via cross join) + pure codegen bit math per row — no data shuffle
    until the caller lays out. ``normalize="quantile"``: equal-population
    buckets from an approxQuantile pass per column (outlier-robust; see
    module docstring for the cost model — bits capped at 12).
    """
    if normalize == "quantile":
        if bits > 12:
            raise ValueError(
                f"quantile normalization computes 2^bits boundaries per "
                f"dimension and O(2^bits) comparisons per row — bits={bits} "
                "is past the practical ceiling of 12; file skipping needs "
                "only ~log2(n_files)+safety bits anyway"
            )
        n_buckets = 1 << bits
        probs = [i / n_buckets for i in range(1, n_buckets)]
        # ONE pass for every dimension (approxQuantile takes a column
        # list) — a per-column loop would rescan the full input per
        # dimension, multiplying the dominant cost by len(cols).
        # relativeError 1/(4*buckets): boundary placement error stays
        # well under one bucket width of population.
        all_bounds = df.approxQuantile(
            list(cols), probs, 1.0 / (4 * n_buckets)
        )
        scaled = [
            _quantile_bucket(F.col(c), bounds, bits)
            for c, bounds in zip(cols, all_bounds)
        ]
        return df.withColumn("zkey", _interleave(scaled, bits))
    if normalize != "minmax":
        raise ValueError(f"unknown normalize mode {normalize!r}")
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    stats = df.agg(*aggs)
    with_stats = df.crossJoin(F.broadcast(stats))
    scaled = [
        _scale_to_bits(
            F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}"), bits
        )
        for c in cols
    ]
    out = with_stats.withColumn("zkey", _interleave(scaled, bits))
    return out.drop(*[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])


def write_zordered(df: DataFrame, path: str, cols: list[str], *,
                   n_files: int = 32, bits: int = 16,
                   normalize: str = "minmax") -> None:
    """Write df clustered along the Morton curve of ``cols``.

    repartitionByRange on zkey = one range shuffle; each output file then
    covers a compact z-interval, so its parquet min/max stats are tight
    on EVERY interleaved dimension and an AND-of-ranges predicate prunes
    most files at planning time (asserted by metric, not by plan string,
    in tests/test_layout.py).
    """
    keyed = zorder_key(df, cols, bits=bits, normalize=normalize)
    keyed.repartitionByRange(n_files, "zkey").drop("zkey").write.mode(
        "overwrite"
    ).parquet(path)
