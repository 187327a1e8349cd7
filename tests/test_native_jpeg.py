"""Native (libjpeg) JPEG decode: bit-parity vs PIL, grayscale expansion,
malformed-input errors, and the load_image opt-in routing."""

import io

import numpy as np
import pytest

from radvlm_tpu import native

pytestmark = pytest.mark.skipif(
    not native.jpeg_available(), reason="native jpeg decoder unavailable"
)


def _jpeg_bytes(arr, mode):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr, mode=mode).save(buf, "JPEG", quality=92)
    return buf.getvalue()


@pytest.mark.parametrize("mode", ["L", "RGB"])
def test_decode_matches_pil(rng, mode):
    from PIL import Image

    base = rng.integers(0, 255, size=(20, 18), dtype=np.uint8)
    img = np.asarray(Image.fromarray(base).resize((180, 200), Image.BILINEAR))
    arr = img if mode == "L" else np.stack([img] * 3, -1)
    data = _jpeg_bytes(arr, mode)
    ours = native.decode_jpeg(data)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert ours.shape == pil.shape
    np.testing.assert_array_equal(ours, pil)  # same libjpeg underneath: exact


def test_malformed_raises():
    with pytest.raises(ValueError):
        native.decode_jpeg(b"not a jpeg")


def test_load_image_native_route(tmp_path, rng, monkeypatch):
    from PIL import Image

    from radvlm_tpu.data.datasets import load_image

    arr = np.stack([rng.integers(0, 255, size=(64, 48), dtype=np.uint8)] * 3, -1)
    p = tmp_path / "x.jpg"
    Image.fromarray(arr).save(p, "JPEG", quality=95)

    monkeypatch.setenv("RADVLM_NATIVE_JPEG", "1")
    via_native = load_image(str(p))
    monkeypatch.delenv("RADVLM_NATIVE_JPEG")
    via_pil = load_image(str(p))
    np.testing.assert_array_equal(via_native, via_pil)
