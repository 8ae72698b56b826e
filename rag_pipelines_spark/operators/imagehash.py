"""Perceptual image hashing (pHash) + banded Hamming near-dup pairs —
the image-side analogue of MinHash near-dedup for a multimodal corpus.

phash64: grayscale grid -> 32x32 resample -> 2D DCT-II -> low-frequency
8x8 block -> bit i = coeff_i > median (DC excluded from the median so a
uniform brightness shift cannot flip every bit) -> 64-bit signature.
Two images with small visual differences (re-encode, resize, mild
noise) land within a few Hamming bits; unrelated images are ~32 apart.

Scale design (the MinHash banding argument transplanted to Hamming
space): the 64-bit hash splits into `bands` contiguous 16-bit keys;
candidate pairs come from an equi-self-join on (band_idx, band_key) —
O(candidates) shuffle, NEVER all-pairs. Pigeonhole guarantee: a pair at
Hamming distance d <= bands-1 differs in at most bands-1 bands, so at
least one band matches exactly => recall is EXACT (1.0) for
d <= bands-1 (pinned in tests/test_imagehash.py against a brute-force
all-pairs sweep); beyond that the banding is probabilistic, exactly
like MinHash. Verification is an exact popcount on the XOR — one
JVM-side bit_count, no UDF.

Decoding runs in mapInPandas with an injectable `decoder` (the
multimodal-tier contract, sources/binary.py): the default stub derives
a deterministic pseudo-grid from md5(content) so plumbing is testable
anywhere; pass a real decoder (e.g. decode_png_rgb) for actual images.
DCT cosine matrices are float64 numpy built per partition — model-free,
deterministic on a given platform.

ref: pdf_marker_extraction.py handles binary inputs one file at a time
with no dedup notion; this tier gives the 100 TB corpus image near-dup
the same candidates-then-verify shape as text near-dedup.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRID = 32  # DCT input resample size
LOWF = 8   # low-frequency block -> 64 bits


def _dct_matrix(n: int):
    """Orthonormal DCT-II matrix (float64)."""
    import numpy as np

    k = np.arange(n, dtype=np.float64)[:, None]
    i = np.arange(n, dtype=np.float64)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0, :] *= 1.0 / np.sqrt(2.0)
    return m * np.sqrt(2.0 / n)


def _area_resample(g, n: int):
    """Area-average (box-filter) resample to n x n via an integral
    image — the low-pass step that makes the hash noise- and
    scale-robust (nearest-neighbor passes pixel noise straight into
    the near-zero DCT coefficients and the bits flip; measured 37-bit
    distances on sigma=4 noise before this). Deterministic float64."""
    import numpy as np

    h, w = g.shape
    integ = np.zeros((h + 1, w + 1))
    integ[1:, 1:] = np.cumsum(np.cumsum(g, 0), 1)
    ys = np.linspace(0, h, n + 1)
    xs = np.linspace(0, w, n + 1)
    y0 = np.floor(ys[:-1]).astype(int)
    y1 = np.maximum(np.ceil(ys[1:]).astype(int), y0 + 1)
    x0 = np.floor(xs[:-1]).astype(int)
    x1 = np.maximum(np.ceil(xs[1:]).astype(int), x0 + 1)
    sums = (
        integ[np.ix_(y1, x1)] - integ[np.ix_(y0, x1)]
        - integ[np.ix_(y1, x0)] + integ[np.ix_(y0, x0)]
    )
    areas = np.outer(y1 - y0, x1 - x0).astype(np.float64)
    return sums / areas


def phash64_gray(gray) -> int:
    """64-bit pHash of a 2-D grayscale array (any HxW >= 1)."""
    import numpy as np

    g = np.asarray(gray, dtype=np.float64)
    if g.ndim != 2:
        raise ValueError(f"expected 2-D grayscale, got shape {g.shape}")
    s = _area_resample(g, GRID)
    d = _dct_matrix(GRID)
    coeffs = d @ s @ d.T
    block = coeffs[:LOWF, :LOWF].ravel()
    med = float(np.median(block[1:]))  # DC excluded: brightness-shift-proof
    bits = 0
    for idx, c in enumerate(block):
        if idx == 0:
            continue  # DC carries no structure
        if float(c) > med:
            bits |= 1 << idx
    return bits - (1 << 64) if bits >= (1 << 63) else bits  # signed long


def png_gray(content: bytes, path: str):
    """REAL-pixel decoder for `phash_images`: stdlib PNG decode
    (sources/binary.py::decode_png_rgb — zlib+struct, all five scanline
    filters, no imaging libs) -> float64 channel-mean grayscale. This is
    the decoder `q_image_phash_png` registers so the DCT path is
    driver-exercised on genuine encoded bytes, not the md5 stub; a
    production cluster swaps in a Pillow/opencv decoder through the same
    (content, path) -> 2-D array seam."""
    import numpy as np

    from rag_pipelines_spark.sources.binary import decode_png_rgb

    w, h, px = decode_png_rgb(bytes(content))
    rgb = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
    return rgb.astype(np.float64).mean(axis=2)


def _stub_gray(content: bytes, path: str):
    """Deterministic pseudo-image from md5(content): exercises the full
    hash/band/join plumbing without an imaging dependency."""
    import hashlib

    import numpy as np

    seed = hashlib.md5(content).digest()
    rng = np.frombuffer(
        hashlib.md5(seed + b"grid").digest() * (GRID * GRID // 16),
        dtype=np.uint8,
    )
    return rng[: GRID * GRID].reshape(GRID, GRID).astype(np.float64)


def phash_images(
    binaries: DataFrame,
    *,
    decoder: Callable[[bytes, str], "object"] | None = None,
) -> DataFrame:
    """(path, phash): 64-bit perceptual hash per binary row. `decoder`
    maps (content, path) -> 2-D grayscale array; default = the
    deterministic stub. Map-only (zero shuffle) at any corpus size;
    rows whose decode raises are dropped (dead-letter style)."""
    dec = decoder or _stub_gray
    schema = "path STRING, phash LONG"

    def _batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            out_p, out_h = [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    g = dec(bytes(content), path)
                    out_p.append(path)
                    out_h.append(phash64_gray(g))
                except Exception:  # undecodable row: drop, not poison
                    continue
            yield pd.DataFrame({"path": out_p, "phash": out_h})

    return binaries.select("path", "content").mapInPandas(
        _batches, schema=schema
    )


def phash_pairs(hashes: DataFrame, *, max_distance: int = 3,
                bands: int = 4) -> DataFrame:
    """(a_path, b_path, distance): image pairs within `max_distance`
    Hamming bits. Candidates from a (band_idx, band_key) equi-self-join
    (O(candidates), never all-pairs); exact popcount verify via
    bit_count(a XOR b). Recall is EXACT for max_distance <= bands-1
    (pigeonhole); raise `bands` for larger radii."""
    if 64 % bands:
        raise ValueError("bands must divide 64")
    width = 64 // bands
    mask = (1 << width) - 1
    banded = hashes.select(
        F.col("path"),
        F.col("phash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("phash", i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("path", "phash", F.col("bk.band").alias("band"),
             F.col("bk.key").alias("key"))
    a = banded.select(
        F.col("band"), F.col("key"),
        F.col("path").alias("a_path"), F.col("phash").alias("a_hash"),
    )
    b = banded.select(
        F.col("band"), F.col("key"),
        F.col("path").alias("b_path"), F.col("phash").alias("b_hash"),
    )
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("a_path") < F.col("b_path"))
        .select("a_path", "b_path", "a_hash", "b_hash")
        .distinct()  # a pair may collide in several bands
    )
    dist = F.bit_count(
        F.col("a_hash").bitwiseXOR(F.col("b_hash"))
    ).cast("int")
    return (
        cand.withColumn("distance", dist)
        .filter(F.col("distance") <= max_distance)
        .select("a_path", "b_path", "distance")
    )
