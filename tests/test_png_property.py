"""Property tests for the dependency-free PNG codec: any image
round-trips through encode_png, and the unfilter inverts every
spec filter on arbitrary pixel data (filters chosen per row, the
way real encoders emit them)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduce_lab_spark.multimodal.codecs import decode_png, encode_png
from tests.test_multimodal import _png_with_filters

_dims = st.tuples(st.integers(1, 9), st.integers(1, 9))


@st.composite
def _images(draw):
    w, h = draw(_dims)
    px = draw(
        st.lists(
            st.tuples(*[st.integers(0, 255)] * 3),
            min_size=w * h,
            max_size=w * h,
        )
    )
    return w, h, px


@settings(max_examples=40, deadline=None)
@given(_images())
def test_encode_decode_roundtrip(img):
    w, h, px = img
    assert decode_png(encode_png(w, h, px)) == (w, h, px)


@settings(max_examples=40, deadline=None)
@given(_images(), st.data())
def test_unfilter_inverts_every_filter_choice(img, data):
    w, h, px = img
    ftypes = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h)
    )
    assert decode_png(_png_with_filters(w, h, px, ftypes)) == (w, h, px)
