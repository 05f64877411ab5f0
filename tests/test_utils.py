import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emx.utils import config as cfgmod
from emx.utils import image as imutil
from emx.utils import metrics as metmod


def test_scale0to1_batch_and_constant():
    x = jnp.asarray([[[0.0, 2.0], [4.0, 8.0]], [[3.0, 3.0], [3.0, 3.0]]])
    out = imutil.scale0to1(x, axis=(-2, -1))
    np.testing.assert_allclose(np.asarray(out[0]), [[0, 0.25], [0.5, 1.0]])
    np.testing.assert_allclose(np.asarray(out[1]), 0.5)


def test_flip_rotate_covers_d4():
    img = jnp.arange(16.0).reshape(4, 4)
    outs = {np.asarray(imutil.flip_rotate(img, jnp.int32(c))).tobytes()
            for c in range(8)}
    assert len(outs) == 8  # all 8 D4 elements distinct


def test_sanitize():
    x = jnp.asarray([1.0, jnp.nan, jnp.inf, -jnp.inf])
    np.testing.assert_allclose(np.asarray(imutil.sanitize(x)), [1.0, 0.5, 0.5, 0.5])


def test_psnr():
    a = jnp.zeros((8, 8))
    assert float(imutil.psnr(a, a + 0.1)) == pytest.approx(20.0, abs=1e-3)


def test_config_roundtrip_and_flags():
    import dataclasses

    @dataclasses.dataclass
    class C(cfgmod.Config):
        lr: float = 1e-3
        batch: int = 4
        name: str = "x"

    c = C.from_args(["--lr=0.5", "--batch=8"])
    assert c.lr == 0.5 and c.batch == 8 and c.name == "x"
    assert C.from_dict(c.to_dict()) == c


def test_hot_reload_file(tmp_path):
    p = str(tmp_path / "learning_rate.txt")
    poll = cfgmod.watch_file(p)
    assert poll() is None
    with open(p, "w") as f:
        f.write("0.0005")
    out = poll()
    assert out == {"learning_rate": 0.0005}
    assert poll() is None  # unchanged
    with open(p, "w") as f:
        f.write("learning_rate 0.1\nclip 5.0")
    os.utime(p, (1e9, 2e9))
    assert poll() == {"learning_rate": 0.1, "clip": 5.0}


def test_metrics_jsonl_and_mirror(tmp_path):
    logger = metmod.MetricsLogger(str(tmp_path))
    logger.log(1, loss=0.5)
    logger.log(2, loss=0.25, lr=1e-3)
    logger.close()
    recs = metmod.read_jsonl(str(tmp_path / "metrics.jsonl"))
    assert [r["step"] for r in recs] == [1, 2]
    losses = metmod.read_loss_log(str(tmp_path / "log.txt"))
    assert losses == [0.5, 0.25]


def test_throughput_meter():
    m = metmod.ThroughputMeter(batch_size=10, every=2)
    assert m.update(0) is None  # first step excluded (compile)
    assert m.update(1) is None
    out = m.update(2)
    assert out and out["examples_per_sec"] > 0


def test_manifest_split_and_shard(tmp_path):
    from emx.io.manifest import Manifest, build_manifest, split_manifest

    for i in range(20):
        (tmp_path / f"img{i:02d}.tif").write_bytes(b"x")
    m = build_manifest(str(tmp_path / "*.tif"), seed=1)
    train, val, test = split_manifest(m)
    assert len(train) == 14 and len(val) == 3 and len(test) == 3
    p = str(tmp_path / "manifest.jsonl")
    m.save(p)
    m2 = Manifest.load(p)
    assert m2.records == m.records
    shards = [list(m.shard(i, 4)) for i in range(4)]
    assert sum(len(s) for s in shards) == 20
    # Deterministic across rebuilds.
    m3 = build_manifest(str(tmp_path / "*.tif"), seed=1)
    assert m3.records == m.records


def test_tiff_roundtrip(tmp_path):
    from emx.io.tiff import read_tiff, write_tiff

    img = np.random.default_rng(0).random((32, 48)).astype(np.float32)
    p = str(tmp_path / "a.tif")
    write_tiff(p, img)
    out = read_tiff(p)
    np.testing.assert_array_equal(out, img)
    # Failed read falls back to neutral image (reference guard behavior).
    bad = read_tiff(str(tmp_path / "missing.tif"), fallback_shape=(8, 8))
    np.testing.assert_allclose(bad, 0.5)
