"""Import-gated real-decode path: runs wherever PIL is installed,
skips cleanly in this container (which ships no image libs)."""

import pytest

PIL = pytest.importorskip("PIL.Image")

from dots_ocr_spark.textops import _decode_real  # noqa: E402


def _png_bytes(mode: str, size=(20, 10)) -> bytes:
    import io

    im = PIL.new(mode, size, (200, 30, 40, 128) if mode == "RGBA"
                 else (200, 30, 40) if mode == "RGB" else 7)
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    return buf.getvalue()


def test_decode_real_rgb_png():
    m = _decode_real(_png_bytes("RGB"))
    assert (m["width"], m["height"]) == (20, 10)
    assert m["fmt"] == "png"
    assert m["decoder"] == "pil"
    assert m["n_bytes"] > 0


def test_decode_real_flattens_rgba():
    # P6 — RGBA flattens onto white (image_utils.py:135-142); decode must
    # not fail and must report the original geometry
    m = _decode_real(_png_bytes("RGBA"))
    assert (m["width"], m["height"]) == (20, 10)
    assert m["fmt"] == "png"


def test_decode_real_rejects_garbage():
    with pytest.raises(Exception):
        _decode_real(b"not an image at all")
