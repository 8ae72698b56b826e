"""Perceptual image hash + banded Hamming pairs (operators/imagehash.py):
pHash invariances on REAL encoded PNGs (stdlib decoder), the pigeonhole
exact-recall guarantee vs a brute-force sweep, and plumbing behavior."""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from rag_pipelines_spark.operators.imagehash import (
    phash64_gray,
    phash_images,
    phash_pairs,
)


def _ham(a: int, b: int) -> int:
    """Hamming distance of two SIGNED 64-bit hashes (mask before
    popcount — Python ints are infinite-precision two's complement)."""
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _encode_png_rgb(px: np.ndarray) -> bytes:
    """Minimal PNG encoder (8-bit RGB, no filter) — test-side twin of
    sources/binary.py::decode_png_rgb."""
    h, w, _ = px.shape
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _smooth(h=24, w=24, noise=0.0, seed=1) -> np.ndarray:
    """Low-frequency test image (sine blob) — near-dup perturbations on
    it behave like mild photo noise, unlike a wrapping sawtooth whose
    modulo edges explode under any perturbation."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    g = 128 + 100 * np.sin(x / 5.0) * np.cos(y / 7.0)
    if noise:
        g = np.clip(g + rng.normal(0, noise, g.shape), 0, 255)
    return g.astype(np.uint8)


def _png_decoder(content: bytes, path: str):
    from rag_pipelines_spark.sources.binary import decode_png_rgb

    w, h, px = decode_png_rgb(content)
    rgb = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
    return rgb.astype(np.float64).mean(axis=2)


def test_phash_identity_brightness_and_scale_invariance():
    g = _smooth().astype(np.float64)
    assert phash64_gray(g) == phash64_gray(g.copy())
    # uniform UNCLIPPED brightness shift moves only the DC coefficient,
    # which both the bitmap and the median exclude -> identical hash
    assert phash64_gray(g) == phash64_gray(g + 20.0)
    # 2x upscale: the area-average resample sees the same image
    up2 = np.repeat(np.repeat(g, 2, axis=0), 2, axis=1)
    d = _ham(phash64_gray(g), phash64_gray(up2))
    assert d <= 2, d


def test_phash_near_dup_close_unrelated_far():
    g = _smooth()
    noisy = _smooth(noise=1.0)
    other = np.random.default_rng(9).integers(
        0, 256, (24, 24)
    ).astype(np.uint8)
    d_near = _ham(phash64_gray(g), phash64_gray(noisy))
    d_far = _ham(phash64_gray(g), phash64_gray(other))
    assert d_near <= 14
    assert d_far >= 20
    assert d_far > d_near


def test_real_png_roundtrip_through_spark(spark, tmp_path):
    """Encode real PNGs (one exact dup, one near-dup, one unrelated),
    hash through the Spark mapInPandas path with the REAL stdlib
    decoder, and recover exactly the expected pair structure."""
    g = _smooth()
    up2 = np.repeat(np.repeat(g, 2, axis=0), 2, axis=1)
    imgs = {
        "a.png": g,
        "a_copy.png": g.copy(),
        "a_scaled.png": up2.astype(np.uint8),  # 2x upscale near-dup
        "other.png": np.random.default_rng(7)
        .integers(0, 256, (24, 24)).astype(np.uint8),
    }
    for name, gray in imgs.items():
        rgb = np.repeat(gray[:, :, None], 3, axis=2).astype(np.uint8)
        (tmp_path / name).write_bytes(_encode_png_rgb(rgb))
    from rag_pipelines_spark.sources.binary import read_binary_dir

    binaries = read_binary_dir(spark, str(tmp_path), glob="*.png")
    hashes = phash_images(binaries, decoder=_png_decoder)
    rows = {r.path.rsplit("/", 1)[-1]: r.phash for r in hashes.collect()}
    assert set(rows) == set(imgs)
    assert rows["a.png"] == rows["a_copy.png"]
    pairs = {
        (r.a_path.rsplit("/", 1)[-1], r.b_path.rsplit("/", 1)[-1]): r.distance
        for r in phash_pairs(hashes, max_distance=8, bands=16).collect()
    }
    assert pairs[("a.png", "a_copy.png")] == 0
    # the 2x-upscaled variant pairs with the copies at a tiny distance
    assert any("a_scaled.png" in k for k in pairs)
    assert not any("other.png" in k for k in pairs)


def test_banding_recall_exact_within_pigeonhole(spark):
    """For distance <= bands-1 the banded join finds EVERY pair a
    brute-force all-pairs sweep finds (pigeonhole: d differing bits
    touch at most d bands)."""
    rng = np.random.default_rng(3)
    base = [int(rng.integers(0, 2**63)) for _ in range(12)]
    rows = [(f"h{i}", h) for i, h in enumerate(base)]
    # plant near-dups at distances 1..3 off the first three hashes
    for d in (1, 2, 3):
        h = base[d]
        for bit in rng.choice(64, size=d, replace=False):
            h ^= 1 << int(bit)
            h = h - (1 << 64) if h >= (1 << 63) else h
        rows.append((f"p{d}", h))
    df = spark.createDataFrame(rows, "path STRING, phash LONG")
    got = {
        (r.a_path, r.b_path, r.distance)
        for r in phash_pairs(df, max_distance=3, bands=4).collect()
    }
    hashes = dict(rows)
    want = set()
    names = sorted(hashes)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            d = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                want.add((min(a, b), max(a, b), d))
    assert got == want and want  # non-vacuous


def test_undecodable_rows_dropped_not_poison(spark, tmp_path):
    (tmp_path / "bad.png").write_bytes(b"not a png at all")
    g = _smooth()
    rgb = np.repeat(g[:, :, None], 3, axis=2).astype(np.uint8)
    (tmp_path / "ok.png").write_bytes(_encode_png_rgb(rgb))
    from rag_pipelines_spark.sources.binary import read_binary_dir

    binaries = read_binary_dir(spark, str(tmp_path), glob="*.png")
    rows = phash_images(binaries, decoder=_png_decoder).collect()
    assert len(rows) == 1 and rows[0].path.endswith("ok.png")


def test_checked_in_png_fixture_hash_pin():
    """Exact-hash pin on the checked-in real PNG (r9 VERDICT 'Next' #5):
    decode_png_rgb -> channel-mean gray -> phash64 of blob_a.png is a
    CONSTANT. If this pin moves, either the decoder, the resample, the
    DCT, or the fixture bytes changed — all of which invalidate the
    q_image_phash_png driver row and must be deliberate
    (tools/gen_png_fixtures.py regenerates byte-identical files)."""
    import os

    from rag_pipelines_spark.operators.imagehash import png_gray

    fx = os.path.join(os.path.dirname(__file__), "fixtures", "png")
    with open(os.path.join(fx, "blob_a.png"), "rb") as f:
        content = f.read()
    assert phash64_gray(png_gray(content, "blob_a.png")) == -2903759012727334156


def test_q_image_phash_png_cluster_resolves(spark):
    """The registered real-PNG query end-to-end: the checked-in fixture
    set's near-dup cluster {base, noise twin, brightness twin} resolves
    (each member counts 2 near-dups at d <= 3) while the two unrelated
    images count 0."""
    from rag_pipelines_spark.queries.sources import q_image_phash_png

    rows = {os.path.basename(r.path): r.n_near_dups
            for r in q_image_phash_png(spark, "unused").collect()}
    assert rows == {
        "blob_a.png": 2, "blob_a_noise.png": 2, "blob_a_bright.png": 2,
        "blob_b.png": 0, "blob_c.png": 0,
    }
