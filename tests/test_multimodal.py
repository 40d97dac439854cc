from __future__ import annotations

import pytest

from dbt_fal_spark.operators.multimodal import decode_image, fake_decode_meta


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_fake_decode_is_deterministic():
    a = fake_decode_meta(b"hello world")
    b = fake_decode_meta(b"hello world")
    assert a == b
    assert set(a) == {"width", "height", "format"}
    assert 1 <= a["width"] <= 640
    assert 1 <= a["height"] <= 480
