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
    boundaries: dict[str, list[float]] | None = None,
) -> DataFrame:
    """Append a ``zkey`` column interleaving the given numeric columns.

    ``normalize="minmax"``: one tiny min/max aggregate (broadcast back
    via cross join) + pure codegen bit math per row — no data shuffle
    until the caller lays out. ``normalize="quantile"``: equal-population
    buckets from an approxQuantile pass per column (outlier-robust; see
    module docstring for the cost model — bits capped at 12).

    ``boundaries`` (quantile mode only): caller-supplied sorted bucket
    boundaries per column, skipping the approxQuantile pass. Two reasons
    to pass them: (a) LAYOUT STABILITY across incremental writes — at
    scale the boundaries should be computed once (on the first epoch or
    a sample) and reused, so later writes cluster into the same
    z-intervals instead of drifting with each batch's re-estimate;
    (b) determinism — approxQuantile placement depends on partition
    merge order within its relative-error envelope.
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
        if boundaries is not None:
            missing = [c for c in cols if c not in boundaries]
            if missing:
                raise ValueError(
                    f"boundaries= missing columns {missing}; supply every "
                    "z-order column or none"
                )
            all_bounds = [boundaries[c] for c in cols]
        else:
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
    if boundaries is not None:
        raise ValueError("boundaries= applies only to normalize='quantile'")
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


def zcell_file_id(bits: int, dims: int, n_files: int,
                  zkey_col: str = "zkey") -> Column:
    """Deterministic file id for a QUANTILE-normalized z-key: the key is
    equal-population uniform on [0, 2^(bits*dims)) by construction, so
    ``zkey div ceil(zspan / n_files)`` cuts exactly on z-cell corners.
    Integer ``div``, not ``/``: float division of a >2^53 zkey (bits=12
    x 5 dims = 60 bits) would round the quotient across a cell edge.
    Shared by write_zordered and the q_zorder_quantile oracle query so
    the two cannot drift."""
    zspan = 1 << (bits * dims)
    cell = -(-zspan // n_files)  # ceil
    return F.expr(f"{zkey_col} div {cell}L")


def _i32(x: int) -> int:
    x &= 0xFFFFFFFF
    return x - (1 << 32) if x >= (1 << 31) else x


def _rotl32(x: int, r: int) -> int:
    x &= 0xFFFFFFFF
    return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF


def murmur3_hash_long(value: int, seed: int = 42) -> int:
    """Spark's ``Murmur3_x86_32.hashLong`` (the expression behind
    ``F.hash``/hash partitioning of a LongType), in Python — two 32-bit
    blocks (low word first) through the standard murmur3 mixers.
    Pinned against ``F.hash`` in tests/test_layout.py so drift in either
    implementation is caught, not silently mis-routed."""
    h1 = seed & 0xFFFFFFFF
    for block in (value & 0xFFFFFFFF, (value >> 32) & 0xFFFFFFFF):
        k1 = (block * 0xCC9E2D51) & 0xFFFFFFFF
        k1 = (_rotl32(k1, 15) * 0x1B873593) & 0xFFFFFFFF
        h1 ^= k1
        h1 = (_rotl32(h1, 13) * 5 + 0xE6546B64) & 0xFFFFFFFF
    h1 ^= 8  # length in bytes
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return _i32(h1)


def _bijective_fid_remap(n_files: int) -> list[int] | None:
    """Longs ``vs`` (one per file id) whose murmur3 partition ids under
    ``repartition(n_files, ...)`` are a bijection onto [0, n_files).

    ``repartition(n, col)`` routes a long as
    ``pmod(Murmur3_x86_32.hashLong(v, 42), n)`` — replicated driver-side
    (no job). Mapping fid -> vs[fid] therefore puts each z-cell in its
    own output file deterministically: no sampling, no collisions, no
    empty partitions. The search touches a few hundred ints (hash
    residues behave uniformly); if it somehow exhausts the cap the
    caller falls back to range partitioning.
    """
    by_pid: dict[int, int] = {}
    for v in range(64 * n_files):
        pid = murmur3_hash_long(v) % n_files  # Python %: non-negative
        if pid not in by_pid:
            by_pid[pid] = v
            if len(by_pid) == n_files:
                return [by_pid[p] for p in range(n_files)]
    return None


def write_zordered(df: DataFrame, path: str, cols: list[str], *,
                   n_files: int = 32, bits: int = 16,
                   normalize: str = "minmax",
                   boundaries: dict[str, list[float]] | None = None) -> None:
    """Write df clustered along the Morton curve of ``cols``.

    Each output file covers a compact z-interval, so its parquet min/max
    stats are tight on EVERY interleaved dimension and an AND-of-ranges
    predicate prunes most files at planning time (asserted by metric,
    not by plan string, in tests/test_layout.py).

    File assignment differs by mode:

    * ``minmax``: repartitionByRange on zkey — the sampled range split
      adapts to whatever population skew the raw values induce on the
      curve (equal-width normalization gives no uniformity guarantee).
    * ``quantile``: the bucketed key is equal-POPULATION uniform on
      [0, 2^(bits*dims)) by construction, so the file id is computed
      DIRECTLY as ``zkey // ceil(2^(bits*dims) / n_files)`` — a pure
      codegen expression — and rows reach their file through a plain
      hash repartition on a driver-side REMAP of that id chosen so the
      murmur3 partition ids are a bijection. Three wins over
      range-on-zkey: (a) file cuts land exactly on z-cell corners, so
      no file straddles two cells on any dimension (sampled boundaries
      land slightly off-corner and widen a file's min/max to the union
      of two cells — measured ~2× the decode fraction); (b) no
      range-partitioner sampling scan over the full input — at 100 TB
      that is a whole extra job; (c) byte-for-byte DETERMINISTIC
      layout: range sampling seeds on the RDD id, so the same write
      lands files differently across sessions, which defeats
      layout-diffing and reproducible benchmarks.
    """
    keyed = zorder_key(df, cols, bits=bits, normalize=normalize,
                       boundaries=boundaries)
    if normalize == "quantile":
        keyed = keyed.withColumn(
            "__zfid", zcell_file_id(bits, len(cols), n_files)
        )
        remap = _bijective_fid_remap(n_files)
        if remap is not None:
            # slot must be LongType: hash partitioning routes ints
            # through hashInt and longs through hashLong — the remap was
            # searched under hashLong semantics
            slot = F.element_at(
                F.array(*[F.lit(v).cast("long") for v in remap]),
                F.col("__zfid").cast("int") + 1,
            )
            out = keyed.repartition(n_files, slot)
        else:  # pragma: no cover — remap search exhausted (see helper)
            out = keyed.repartitionByRange(n_files, "__zfid")
        (out.drop("zkey", "__zfid")
         .write.mode("overwrite").parquet(path))
        return
    keyed.repartitionByRange(n_files, "zkey").drop("zkey").write.mode(
        "overwrite"
    ).parquet(path)
