"""DM3/DM4 decoder tests against synthesized tag trees (the corpus the
reference never shipped — SURVEY.md §7 hard part 4)."""

import numpy as np
import pytest

from emx.io import dm


@pytest.mark.parametrize("version", [3, 4])
@pytest.mark.parametrize("data_le", [True, False])
@pytest.mark.parametrize("dtype", ["float32", "uint16", "int32", "float64"])
def test_roundtrip_image(tmp_path, version, data_le, dtype):
    rng = np.random.default_rng(42)
    if dtype.startswith("float"):
        img = rng.random((24, 32)).astype(dtype)
    else:
        img = rng.integers(0, 1000, (24, 32)).astype(dtype)
    path = str(tmp_path / f"t.dm{version}")
    dm.write_dm(path, img, version=version, data_le=data_le, scale=0.25, units="nm")
    f = dm.read_dm(path, prefer_native=False)
    assert f.version == version
    assert f.data_little_endian == data_le
    im = f.image()
    assert im.data.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(im.data, img)
    assert im.scale == pytest.approx(0.25)
    assert im.units == "nm"
    assert im.is_imaging_mode


def test_picks_main_image_not_thumbnail(tmp_path):
    img = np.arange(64 * 64, dtype=np.float32).reshape(64, 64)
    path = str(tmp_path / "t.dm3")
    dm.write_dm(path, img)
    f = dm.read_dm(path, prefer_native=False)
    assert f.num_images() == 2
    assert f.image().data.shape == (64, 64)  # not the subsampled thumbnail


def test_stack_3d(tmp_path):
    stack = np.random.default_rng(0).random((5, 16, 16)).astype(np.float32)
    path = str(tmp_path / "s.dm4")
    dm.write_dm(path, stack, with_thumbnail=False)
    im = dm.read_dm(path, prefer_native=False).image()
    assert im.data.shape == (5, 16, 16)
    np.testing.assert_array_equal(im.data, stack)


def test_walk_celltag_paths(tmp_path):
    img = np.ones((8, 8), np.float32)
    path = str(tmp_path / "t.dm3")
    dm.write_dm(path, img, scale=2.0, with_thumbnail=True)
    f = dm.read_dm(path, prefer_native=False)
    # The reference celltag paths (ReadDMFile.m:30-35).
    assert float(f.walk("ImageList 2 ImageData Calibrations Dimension 1 Scale")) == 2.0
    assert int(f.walk("ImageList 2 ImageData Dimensions 1")) == 8
    assert f.walk("ImageList 2 ImageData Data").size == 64


def test_struct_and_string_tags():
    tags = {
        "Root": {
            "AString": "hello world",
            "AStruct": (np.float32(1.5), np.int32(7)),
            "Nested": {"Value": np.float64(3.25)},
        }
    }
    blob = dm.encode_dm(tags, version=3)
    f = dm.parse_dm(blob)
    assert f.walk("Root AString") == "hello world"
    s = f.walk("Root AStruct")
    assert float(s[0]) == 1.5 and int(s[1]) == 7
    assert float(f.walk("Root Nested Value")) == 3.25


def test_long_array_over_1000_elements():
    # ReadDMFile.m special-cases >1000-element arrays (:293-299).
    arr = np.arange(5000, dtype=np.float32)
    blob = dm.encode_dm({"Big": arr}, version=4)
    out = dm.parse_dm(blob).walk("Big")
    np.testing.assert_array_equal(out, arr)


def test_truncated_file_raises():
    blob = dm.encode_dm({"A": np.float32(1.0)}, version=3)
    with pytest.raises(dm.DMDecodeError):
        dm.parse_dm(blob[: len(blob) - 2])


def test_bad_version_raises():
    with pytest.raises(dm.DMDecodeError):
        dm.parse_dm(b"\x00\x00\x00\x09" + b"\x00" * 32)
