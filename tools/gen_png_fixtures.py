"""Generate the checked-in REAL-PNG fixtures for q_image_phash_png
(tests/fixtures/png/*.png) — genuine non-interlaced 8-bit RGB PNGs
(zlib+struct encoder, the test-side twin of
sources/binary.py::decode_png_rgb). Deterministic: re-running reproduces
byte-identical files, so the exact-hash pin in tests/test_imagehash.py
stays valid across regenerations.

Content plan (mirrors the pHash invariance matrix):
- blob_a.png          low-frequency sine blob (the "photo")
- blob_a_noise.png    + mild gaussian noise       -> near-dup (d <= 3)
- blob_a_bright.png   + uniform +20 brightness    -> DC-only shift (d = 0)
- blob_b.png          different frequencies/seed  -> unrelated (~32 bits)
- blob_c.png          different again             -> unrelated

Run: python tools/gen_png_fixtures.py
"""
from __future__ import annotations

import os
import struct
import zlib

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "png")


def encode_png_rgb(px: np.ndarray) -> bytes:
    """Minimal PNG encoder: 8-bit RGB, filter 0, one IDAT."""
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
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def blob(h: int, w: int, seed: int) -> np.ndarray:
    """Grayscale image with a DENSE low-frequency spectrum: every 2-D
    cosine mode in the pHash's 8x8 low block carries amplitude well
    above the noise floor, with a per-seed random sign pattern. A
    single sine blob concentrates energy in ~2 coefficients and leaves
    the other 60 at ~0 = exactly at the median threshold, where mild
    noise flips bits by coin toss; this spectrum keeps every thresholded
    coefficient far from the median, so the noise twin stays inside the
    banded d <= 3 radius and different seeds land ~32 bits apart."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    g = np.full((h, w), 128.0)
    for u in range(8):
        for v in range(8):
            if u == 0 and v == 0:
                continue  # DC: brightness, excluded from the hash anyway
            amp = rng.choice([-1.0, 1.0]) * rng.uniform(5.0, 9.0)
            g += amp * (
                np.cos(np.pi * (2 * y + 1) * u / (2 * h))
                * np.cos(np.pi * (2 * x + 1) * v / (2 * w))
            )
    return g


def to_rgb(g: np.ndarray) -> np.ndarray:
    u = np.clip(np.rint(g), 0, 255).astype(np.uint8)
    return np.stack([u, u, u], axis=2)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(7)
    # 96x96 so the 32x32 area resample averages 3x3 source blocks —
    # mild per-pixel noise then attenuates ~3x before the DCT, keeping
    # the noise twin inside the banded d <= 3 near-dup radius (the same
    # reason pHash is robust on real photos, which are oversampled
    # relative to the hash grid)
    a = blob(96, 96, seed=101)
    imgs = {
        "blob_a.png": a,
        "blob_a_noise.png": a + rng.normal(0.0, 1.0, a.shape),
        "blob_a_bright.png": a + 20.0,
        "blob_b.png": blob(96, 96, seed=202),
        "blob_c.png": blob(96, 96, seed=303),
    }
    for name, g in imgs.items():
        path = os.path.join(OUT, name)
        with open(path, "wb") as f:
            f.write(encode_png_rgb(to_rgb(g)))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
