"""Optional REAL-codec integration test for the multimodal plumbing.

The sandbox ships no image libraries, so `extract_media_features` is normally
exercised with the deterministic `fake_decoder`. This test proves the
injectable-decoder contract against a real codec (PIL) whenever one is
available: it is skipped here and runs automatically on any box with Pillow
installed (round-4 verdict item 6; see TESTDATA.md)."""

from __future__ import annotations

import io

import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from jsonschema_spark.operators.multimodal import extract_media_features  # noqa: E402


def _png_bytes(width: int, height: int, color: tuple[int, int, int]) -> bytes:
    buf = io.BytesIO()
    Image.new("RGB", (width, height), color).save(buf, format="PNG")
    return buf.getvalue()


def pil_decoder(payload: bytes, media_type: str) -> dict:
    """Real decoder satisfying the injectable contract: decode the payload,
    return feature_hash/width/height (duration_ms stays None for images)."""
    import hashlib

    img = Image.open(io.BytesIO(payload))
    return {
        "feature_hash": hashlib.sha256(img.tobytes()).hexdigest()[:32],
        "width": img.width,
        "height": img.height,
        "duration_ms": None,
    }


def test_extract_media_features_with_real_codec(spark):
    rows = [
        ("img-a", "image", _png_bytes(17, 11, (255, 0, 0))),
        ("img-b", "image", _png_bytes(64, 48, (0, 255, 0))),
    ]
    media = spark.createDataFrame(rows, "media_ref string, media_type string, payload binary")
    out = extract_media_features(media, decoder=pil_decoder).orderBy("media_ref").collect()
    assert [(r.media_ref, r.width, r.height) for r in out] == [
        ("img-a", 17, 11),
        ("img-b", 64, 48),
    ]
    assert all(r.n_bytes > 0 and r.feature_hash for r in out)
    assert {r.duration_ms for r in out} == {None}
