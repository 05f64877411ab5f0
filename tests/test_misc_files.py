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
    for fn, arg, dep in ((video_to_slices, ("x.mp4", str(tmp_path)),
                          "cv2"),
                         (images_to_text, (str(tmp_path),),
                          "pytesseract")):
        try:
            __import__(dep)
        except ImportError:
            pass
        else:
            continue  # dependency present: the gate is not reachable
        try:
            fn(*arg)
        except ImportError as e:
            assert "requires" in str(e)
        except Exception:
            pytest.fail("gated tool raised the wrong error type")


def test_video_to_slices_roundtrip(tmp_path):
    """mp4 -> per-frame slices (misc_py/mp4_to_slices.py): synthesize a
    short video, slice every 2nd frame, check count and pixel content."""
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path / "clip.avi")
    # MJPG/avi is available in every OpenCV build (no ffmpeg needed).
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 5.0,
                         (32, 32))
    if not vw.isOpened():
        pytest.skip("no usable VideoWriter backend")
    frames = []
    for i in range(6):
        f = np.full((32, 32, 3), i * 40, np.uint8)
        frames.append(f)
        vw.write(f)
    vw.release()
    out = tmp_path / "slices"
    n = video_to_slices(path, str(out), every_n=2)
    assert n == 3
    for j, src_idx in enumerate([0, 2, 4]):
        img = cv2.imread(str(out / f"frame{j}.png"))
        assert img is not None and img.shape == (32, 32, 3)
        # MJPG is lossy; flat frames survive within a small tolerance.
        assert abs(int(img.mean()) - src_idx * 40) <= 4
