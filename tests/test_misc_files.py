"""Ancillary file plumbing (misc_py filecopy / img_info / gated tools)."""

import os

import numpy as np
import pytest

from emx.data.misc_files import (
    images_to_text,
    noise_census,
    partition_dataset,
    video_to_slices,
)
from emx.io.tiff import write_tiff


def test_partition_dataset_splits_and_renames(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for i in range(20):
        write_tiff(str(src / f"img{i}.tif"),
                   np.full((8, 8), i / 20, np.float32))
    counts = partition_dataset(str(src), str(tmp_path / "out"), seed=1)
    assert counts == {"train": 14, "val": 3, "test": 3}
    assert sorted(os.listdir(tmp_path / "out" / "val")) == [
        "val1.tif", "val2.tif", "val3.tif"]
    # Deterministic: same seed -> same partition.
    counts2 = partition_dataset(str(src), str(tmp_path / "out2"), seed=1)
    a = open(tmp_path / "out" / "train" / "train1.tif", "rb").read()
    b = open(tmp_path / "out2" / "train" / "train1.tif", "rb").read()
    assert a == b and counts2 == counts


def test_noise_census_orders_by_noise(tmp_path):
    rng = np.random.default_rng(0)
    quiet = str(tmp_path / "quiet.tif")
    loud = str(tmp_path / "loud.tif")
    write_tiff(quiet, np.full((64, 64), 0.5, np.float32)
               + rng.normal(0, 0.01, (64, 64)).astype(np.float32))
    write_tiff(loud, np.full((64, 64), 0.5, np.float32)
               + rng.normal(0, 0.2, (64, 64)).astype(np.float32))
    recs = {r["path"]: r for r in noise_census([quiet, loud, "missing"])}
    assert set(recs) == {quiet, loud}
    assert recs[loud]["noise"] > 5 * recs[quiet]["noise"]


def test_gated_tools_raise_informative_importerror(tmp_path):
    for fn, arg in ((video_to_slices, ("x.mp4", str(tmp_path))),
                    (images_to_text, (str(tmp_path),))):
        try:
            fn(*arg)
        except ImportError as e:
            assert "requires" in str(e)
        except Exception:
            pytest.fail("gated tool raised the wrong error type")
