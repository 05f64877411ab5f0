"""Property-based tests for the DM3/DM4 codec (SURVEY.md §5: property
tests for the native-seam components)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from emx.io import dm

dtypes = st.sampled_from(["float32", "float64", "uint16", "int16",
                          "uint32", "int32"])


@st.composite
def images(draw):
    h = draw(st.integers(2, 40))
    w = draw(st.integers(2, 40))
    dt = draw(dtypes)
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    if dt.startswith("float"):
        return rng.standard_normal((h, w)).astype(dt)
    info = np.iinfo(dt)
    return rng.integers(info.min, info.max, (h, w)).astype(dt)


@settings(max_examples=40, deadline=None)
@given(img=images(), version=st.sampled_from([3, 4]),
       data_le=st.booleans())
def test_roundtrip_any_image(img, version, data_le):
    blob = dm.encode_dm(dm.make_image_tags(img, with_thumbnail=False),
                        version=version, data_le=data_le)
    f = dm.parse_dm(blob)
    out = f.image().data
    assert out.dtype == img.dtype
    np.testing.assert_array_equal(out, img)


@settings(max_examples=30, deadline=None)
@given(st.recursive(
    st.one_of(
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                max_size=12),
        st.integers(-2**31, 2**31 - 1).map(np.int32),
        st.floats(allow_nan=False, allow_infinity=False, width=32)
        .map(np.float32),
    ),
    lambda children: st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=1, max_size=6),
        children, min_size=1, max_size=4),
    max_leaves=12,
).filter(lambda t: isinstance(t, dict)))
def test_roundtrip_arbitrary_tag_trees(tags):
    blob = dm.encode_dm(tags, version=3)
    f = dm.parse_dm(blob)

    def check(expect, got):
        assert set(expect) == set(got)
        for k, v in expect.items():
            if isinstance(v, dict):
                check(v, got[k])
            elif isinstance(v, str):
                assert got[k] == v
            else:
                np.testing.assert_allclose(np.asarray(got[k]),
                                           np.asarray(v), rtol=1e-6)

    check(tags, f.tags)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=256))
def test_decoder_never_crashes_on_garbage(blob):
    # Must raise DMDecodeError (or parse), never any other exception.
    try:
        dm.parse_dm(b"\x00\x00\x00\x03" + blob)
    except dm.DMDecodeError:
        pass
