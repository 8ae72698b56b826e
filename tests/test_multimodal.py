"""Multimodal plumbing contracts (sources/binary.py): the stubbed decode /
resize / frame-sample bodies are fakes, but the Spark-side contracts they
stand in for are real and pinned here — schema, batch fan-out shape,
payload sizing, and determinism under repartitioning.
"""

from __future__ import annotations

import hashlib
import os

import pytest

from rag_pipelines_spark.sources.binary import (
    read_binary_dir,
    resize_images_stub,
    sample_frames_stub,
)

FIXTURE_BIN = os.path.join(os.path.dirname(__file__), "fixtures", "bin")


@pytest.fixture(scope="module")
def images(spark):
    df = read_binary_dir(spark, FIXTURE_BIN, glob="*.binstub")
    assert df.count() >= 2
    return df


@pytest.fixture(scope="module")
def videos(spark):
    df = read_binary_dir(spark, FIXTURE_BIN, glob="*.vidstub")
    assert df.count() >= 2
    return df


def test_resize_is_one_to_one_and_size_honest(spark, images):
    out = resize_images_stub(images, width=32, height=32).collect()
    assert len(out) == images.count()
    for r in out:
        assert (r.width, r.height) == (32, 32)
        # size contract matches a real RGB resize: w*h*3 bytes
        assert len(r.content) == 32 * 32 * 3


def test_resize_accepts_real_resizer(spark, images):
    """The integration point: a caller-supplied resizer replaces the stub
    with identical schema/batching."""
    marker = b"\x01\x02"

    def tiny(content, path, w, h):
        return marker + hashlib.md5(content).digest()

    out = resize_images_stub(images, width=8, height=8, resizer=tiny).collect()
    for r in out:
        assert bytes(r.content).startswith(marker)


def test_frame_sample_fans_out_n_per_video(spark, videos):
    n_videos = videos.count()
    frames = sample_frames_stub(videos, n_frames=4)
    rows = frames.collect()
    assert len(rows) == 4 * n_videos
    by_path = {}
    for r in rows:
        by_path.setdefault(r.path, []).append(r)
    for path, rs in by_path.items():
        assert sorted(r.frame_idx for r in rs) == [0, 1, 2, 3]
        assert sorted(r.ts_ms for r in rs) == [0, 1000, 2000, 3000]
        # frames are distinct (keyed by index, not a copy of one decode)
        assert len({bytes(r.frame) for r in rs}) == 4


def test_frame_sample_deterministic_under_repartition(spark, videos):
    a = {(r.path, r.frame_idx, bytes(r.frame))
         for r in sample_frames_stub(videos, n_frames=3).collect()}
    b = {(r.path, r.frame_idx, bytes(r.frame))
         for r in sample_frames_stub(videos.repartition(5), n_frames=3).collect()}
    assert a == b


# ---------------------------------------------------------------------------
# Real-decoder proof: the resizer seam carries REAL image bytes when an
# imaging lib exists; without one the opt-in fails loudly at build time
# ---------------------------------------------------------------------------

FIXTURE_PNG_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_png_fixture_is_a_real_png():
    """The checked-in fixture is a structurally valid PNG (magic +
    chunks) — pinned independently of PIL so the real-decoder test can
    never silently rot into decoding garbage."""
    blob = open(os.path.join(FIXTURE_PNG_DIR, "tiny_rgb.png"), "rb").read()
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in blob and b"IDAT" in blob and b"IEND" in blob


def test_pil_resizer_decodes_real_bytes(spark):
    """With Pillow installed, pil_resizer() drives the SAME
    resize_images_stub plumbing with an actual decode+resize: output is
    the exact RGB buffer PIL produces for the checked-in PNG."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from rag_pipelines_spark.sources.binary import pil_resizer

    images = read_binary_dir(spark, FIXTURE_PNG_DIR, glob="*.png")
    out = resize_images_stub(
        images, width=2, height=2, resizer=pil_resizer()
    ).collect()
    assert len(out) == 1
    blob = open(os.path.join(FIXTURE_PNG_DIR, "tiny_rgb.png"), "rb").read()
    expected = Image.open(io.BytesIO(blob)).convert("RGB").resize((2, 2)).tobytes()
    assert bytes(out[0].content) == expected
    assert len(out[0].content) == 2 * 2 * 3


@pytest.mark.skipif(_pil_available(), reason="Pillow installed here")
def test_pil_resizer_absent_fails_loudly_at_build_time():
    """Opting into the real decoder without the lib must raise a clear
    ImportError when the pipeline is BUILT — never deep inside an
    executor task."""
    from rag_pipelines_spark.sources.binary import pil_resizer

    with pytest.raises(ImportError, match="Pillow"):
        pil_resizer()
