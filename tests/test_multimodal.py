"""Unit tests for the multimodal decode seam and fake decoder."""

from __future__ import annotations

import pytest

from mapreduce_lab_spark.multimodal.binary_ops import decode_image, fake_decode


def test_decode_image_is_a_gated_stub():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: stub not exercised in this environment")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...", "png")


def test_fake_decode_deterministic_shape():
    px = fake_decode(b"abc", width=4, height=3)
    assert px == [97, 98, 99, 97, 98, 99, 97]
    assert fake_decode(b"", width=2, height=2) == [0, 0, 0, 0]
    assert fake_decode(b"abc", width=4, height=3) == px
