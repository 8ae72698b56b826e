"""Binary/multimodal columns (S10/S11 + north-star multimodal ops).

PDFs, images, audio, video are opaque `binary` columns with typed metadata
structs. The scan is Spark's binaryFile source (distributed, predicate
pushdown on path/length/modificationTime); decode / feature-extract runs as
Arrow-batched mapInPandas with per-partition model/library init — exactly
the reference's one-time Marker model load (pdf_marker_extraction.py:
219-233) generalized to executors.

The decode bodies are STUBBED (image/audio libs are not in this container):
`decode_stub=True` produces a deterministic fake so the Spark-side plumbing
— schema, batch shape, partition init, metadata struct — is real and
tested; passing a real decoder swaps in actual extraction unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EXTRACT_SCHEMA = (
    "path string, length bigint, content_md5 string, text string, "
    "meta_title string, meta_doi string"
)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Distributed binary-file scan (S10). Columns: path, modificationTime,
    length, content."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def _fake_decode(content: bytes, path: str) -> tuple[str, str, str]:
    """Deterministic stand-in for Marker PDF->Markdown + metadata probe.

    Returns (text, title, doi) derived only from the bytes, so tests are
    stable. Real integration point: replace via the `decoder` parameter.
    """
    h = hashlib.md5(content).hexdigest()
    return (
        f"# Extracted {path.rsplit('/', 1)[-1]}\n\nbody:{h}",
        f"Title {h[:8]}",
        f"10.{int(h[:4], 16) % 9000 + 1000}/stub.{h[4:10]}",
    )


Decoder = Callable[[bytes, str], tuple[str, str, str]]


def extract_documents(
    binaries: DataFrame, decoder: Decoder | None = None
) -> DataFrame:
    """binary rows -> {text, metadata{title, doi}} extraction (S10/S11).

    ref: pdf_marker_extraction.py:210-282 (converter), 166-203 (metadata
    probe). mapInPandas so a real model loads once per partition, not per
    row; the stub keeps the identical dataflow.
    """
    dec = decoder or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = dec  # per-partition init point (load models here)
        for pdf in batches:
            rows = []
            for path, length, content in zip(
                pdf["path"], pdf["length"], pdf["content"]
            ):
                blob = bytes(content) if content is not None else b""
                text, title, doi = model(blob, path)
                rows.append(
                    {
                        "path": path,
                        "length": int(length),
                        "content_md5": hashlib.md5(blob).hexdigest(),
                        "text": text,
                        "meta_title": title,
                        "meta_doi": doi,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path",
                    "length",
                    "content_md5",
                    "text",
                    "meta_title",
                    "meta_doi",
                ],
            )

    return binaries.mapInPandas(run, schema=EXTRACT_SCHEMA)


def image_features_stub(
    binaries: DataFrame, n_features: int = 8
) -> DataFrame:
    """Multimodal feature-extraction plumbing: binary -> float vector.

    Deterministic fake features (md5-seeded) standing in for a real
    image/audio encoder; schema and batch shape match the real thing
    (array<float> column ready for the similarity operators).
    """
    schema = "path string, features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                blob = bytes(content) if content is not None else b""
                digest = hashlib.md5(blob).digest()
                feats = [
                    (digest[i % 16] - 128) / 128.0 for i in range(n_features)
                ]
                rows.append({"path": path, "features": feats})
            yield pd.DataFrame(rows, columns=["path", "features"])

    return binaries.mapInPandas(run, schema=schema)


RESIZE_SCHEMA = "path string, width int, height int, content binary"

# Real integration points: (bytes, path, w, h) -> resized bytes, and
# (bytes, path, n) -> [(ts_ms, frame_bytes)].
Resizer = Callable[[bytes, str, int, int], bytes]
FrameSampler = Callable[[bytes, str, int], list[tuple[int, bytes]]]


def _fake_resize(content: bytes, path: str, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize: a w*h*3-byte payload
    streamed from md5(content) — size contract matches a real RGB resize
    so downstream batch-memory accounting is honest."""
    out, n, i = b"", width * height * 3, 0
    while len(out) < n:
        out += hashlib.md5(content + i.to_bytes(4, "big")).digest()
        i += 1
    return out[:n]


def pil_resizer() -> Resizer:
    """A REAL decode+resize resizer backed by Pillow, for clusters where
    the imaging lib is installed. Returns raw RGB bytes (w*h*3) — the
    same size contract as _fake_resize, so swapping it in changes only
    the pixel content, never schema/batching/memory accounting.

    Guarded import at factory-call time: the default path never touches
    PIL (this container has no imaging libs — SURVEY §7 non-goal), and a
    cluster that opts in fails loudly at pipeline-build time, not deep
    inside an executor task. tests/test_multimodal.py exercises this on
    a checked-in PNG when Pillow is available and pins the clean
    ImportError contract when it is not.
    """
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - exercised via tests
        raise ImportError(
            "pil_resizer needs Pillow (pip install pillow on the "
            "cluster image); the deterministic stub resizer is the "
            "default and needs nothing"
        ) from exc

    import io

    def rz(content: bytes, path: str, width: int, height: int) -> bytes:
        img = Image.open(io.BytesIO(content)).convert("RGB")
        return img.resize((width, height)).tobytes()

    return rz


def decode_png_rgb(blob: bytes) -> tuple[int, int, bytes]:
    """Pure-stdlib PNG decode (zlib + struct): non-interlaced 8-bit RGB.

    Covers the subset a vision-preprocessing smoke test needs — all five
    scanline filters, single or split IDAT — so the REAL-decode proof in
    tests/test_multimodal.py executes on any box, imaging libs or not.
    Anything outside the subset (palette, alpha, 16-bit, interlaced)
    raises ValueError: this is a test-bench decoder, production clusters
    plug in pil_resizer()/opencv via the same ``resizer=`` seam.
    Returns (width, height, raw RGB bytes, len == w*h*3).
    """
    import struct
    import zlib

    if blob[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    i, idat, w = 8, b"", None
    while i < len(blob):
        ln, typ = struct.unpack(">I4s", blob[i : i + 8])
        if typ == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", blob[i + 8 : i + 21]
            )
            if (depth, ctype, interlace) != (8, 2, 0):
                raise ValueError(
                    "decode_png_rgb handles non-interlaced 8-bit RGB only"
                )
        elif typ == b"IDAT":
            idat += blob[i + 8 : i + 8 + ln]
        i += 12 + ln
    if w is None:
        raise ValueError("no IHDR")
    raw, bpp = zlib.decompress(idat), 3
    stride = w * bpp
    out, prev = bytearray(), bytes(stride)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        for x in range(stride):
            a = line[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ft == 1:
                line[x] = (line[x] + a) & 255
            elif ft == 2:
                line[x] = (line[x] + b) & 255
            elif ft == 3:
                line[x] = (line[x] + (a + b) // 2) & 255
            elif ft == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                line[x] = (line[x] + (a if pa <= pb and pa <= pc else b if pb <= pc else c)) & 255
        out += line
        prev = bytes(line)
    return w, h, bytes(out)


def stdlib_png_resizer() -> Resizer:
    """A REAL decode+resize with zero dependencies: decode_png_rgb +
    center-sample nearest-neighbor (src = floor((i+0.5)·in/out), the
    same mapping PIL's NEAREST uses). Same (bytes, path, w, h) -> RGB
    contract as pil_resizer(); the fallback that keeps the real-decode
    test executable where Pillow is absent."""

    def rz(content: bytes, path: str, width: int, height: int) -> bytes:
        sw, sh, px = decode_png_rgb(bytes(content))
        out = bytearray()
        for y in range(height):
            sy = (2 * y + 1) * sh // (2 * height)
            for x in range(width):
                sx = (2 * x + 1) * sw // (2 * width)
                j = (sy * sw + sx) * 3
                out += px[j : j + 3]
        return bytes(out)

    return rz


def resize_images_stub(
    binaries: DataFrame,
    width: int = 32,
    height: int = 32,
    resizer: Resizer | None = None,
) -> DataFrame:
    """Image resize plumbing: binary row -> binary row (1->1 mapInPandas).

    The stub emits a correctly-sized deterministic payload; passing a
    real `resizer` (PIL/opencv on a real cluster) swaps in actual decode+
    resize with the identical schema, batching, and per-partition init.
    At 100 TB this is pure map work: parallelism = input partitions,
    Arrow batches bound executor memory to batch_size * w * h * 3.
    """
    rz = resizer or _fake_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lib = rz  # per-partition init point (import PIL / load kernels here)
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                blob = bytes(content) if content is not None else b""
                rows.append(
                    {
                        "path": path,
                        "width": width,
                        "height": height,
                        "content": lib(blob, path, width, height),
                    }
                )
            yield pd.DataFrame(rows, columns=["path", "width", "height", "content"])

    return binaries.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "path string, frame_idx int, ts_ms bigint, frame binary"


def _fake_frames(content: bytes, path: str, n: int) -> list[tuple[int, bytes]]:
    """Deterministic stand-in for video frame sampling: n frames at 1 fps,
    each frame's bytes keyed by (content, index)."""
    return [
        (i * 1000, hashlib.md5(content + b"frame" + i.to_bytes(4, "big")).digest())
        for i in range(n)
    ]


def sample_frames_stub(
    binaries: DataFrame,
    n_frames: int = 4,
    sampler: FrameSampler | None = None,
) -> DataFrame:
    """Video frame-sampling plumbing: binary row -> n frame rows (the
    1->N explode-shaped mapInPandas — the batch contract a real ffmpeg
    sampler needs, distinct from the 1->1 decode/resize shape).

    Output fans out inside the task, so a 100 TB video corpus samples
    with NO shuffle: each task turns its video rows into frame rows and
    downstream per-frame ops (resize/encode above) chain map-on-map.
    One giant video cannot skew a task beyond n_frames output rows.
    """
    smp = sampler or _fake_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lib = smp  # per-partition init point (open ffmpeg/codec handles here)
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                blob = bytes(content) if content is not None else b""
                for idx, (ts_ms, frame) in enumerate(lib(blob, path, n_frames)):
                    rows.append(
                        {
                            "path": path,
                            "frame_idx": idx,
                            "ts_ms": ts_ms,
                            "frame": frame,
                        }
                    )
            yield pd.DataFrame(rows, columns=["path", "frame_idx", "ts_ms", "frame"])

    return binaries.mapInPandas(run, schema=FRAME_SCHEMA)
