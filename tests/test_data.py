import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emx.data import (
    apply_partial_scan,
    bernoulli_mask,
    box_downsample,
    center_square_crop,
    box_resize,
    denoiser_example,
    fixed_scan_mask,
    gaussian_blur,
    infilling_example,
    norm_neg1to1,
    occlude,
    poisson_dose,
    random_crop,
    sample_dose_scale,
    tile_grid,
)
from emx.data.crops import untile_grid
from emx.data.pipeline import DataPipeline, PipelineConfig, synthetic_micrographs


def test_dose_scale_distribution():
    keys = jax.random.split(jax.random.key(0), 4096)
    scales = jax.vmap(sample_dose_scale)(keys)
    assert float(scales.min()) >= 25.0
    # mean = 25 + 75 = 100
    assert float(scales.mean()) == pytest.approx(100.0, rel=0.05)


def test_poisson_dose_snr_scales_with_dose():
    img = jnp.full((128, 128), 0.5)
    key = jax.random.key(1)
    lo = poisson_dose(key, img, jnp.asarray(10.0))
    hi = poisson_dose(key, img, jnp.asarray(1000.0))
    assert float(jnp.std(hi)) < float(jnp.std(lo))
    assert 0.0 <= float(lo.min()) and float(lo.max()) <= 1.0


def test_denoiser_example_target_rescaled():
    img = jnp.asarray(synthetic_micrographs(1, 64)[0])
    lq, target = jax.jit(denoiser_example)(jax.random.key(2), img)
    assert lq.shape == img.shape == target.shape
    # target mean matches the noisy image's mean (reference record_parser).
    assert float(jnp.mean(target)) == pytest.approx(float(jnp.mean(lq)), rel=1e-4)


def test_fixed_scan_mask_reproducible_and_coverage():
    m1 = fixed_scan_mask((512, 512), 1 / 64)
    m2 = fixed_scan_mask((512, 512), 1 / 64)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    cov = float(jnp.mean(m1))
    assert cov == pytest.approx(1 / 64, rel=0.15)


def test_partial_scan_fill():
    img = jnp.ones((8, 8))
    mask = bernoulli_mask(jax.random.key(0), (8, 8), 0.5)
    out = apply_partial_scan(img, mask)
    assert set(np.unique(np.asarray(out))) <= {-1.0, 1.0}


def test_infilling_example_range():
    img = jnp.asarray(synthetic_micrographs(1, 64)[0])
    mask = bernoulli_mask(jax.random.key(1), (64, 64), 0.1)
    lq, full = infilling_example(jax.random.key(3), img, mask)
    assert float(full.min()) >= -1.0 and float(full.max()) <= 1.0
    assert float(lq.min()) == -1.0


def test_norm_neg1to1_constant():
    out = norm_neg1to1(jnp.full((4, 4), 3.0))
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_occlude_marks_pixels():
    img = jnp.ones((32, 32))
    out = occlude(jax.random.key(5), img)
    vals = set(np.unique(np.asarray(out)))
    assert vals <= {0.5, 1.0}


def test_gaussian_blur_reduces_variance():
    img = jnp.asarray(np.random.default_rng(0).random((64, 64)), jnp.float32)
    out = gaussian_blur(img, sigma=2.0)
    assert out.shape == img.shape
    assert float(jnp.std(out)) < float(jnp.std(img))
    # Mean preserved (kernel sums to 1) away from boundary effects.
    assert float(jnp.mean(out[8:-8, 8:-8])) == pytest.approx(
        float(jnp.mean(img[8:-8, 8:-8])), abs=0.02
    )


def test_box_downsample_exact():
    img = jnp.arange(16.0).reshape(4, 4)
    out = box_downsample(img, 2)
    np.testing.assert_allclose(np.asarray(out), [[2.5, 4.5], [10.5, 12.5]])


def test_crop_resize_tile_roundtrip():
    img = jnp.asarray(np.random.default_rng(1).random((96, 128)), jnp.float32)
    sq = center_square_crop(img)
    assert sq.shape == (96, 96)
    small = box_resize(sq, 48)
    assert small.shape == (48, 48)
    up = box_resize(small, 96)
    assert up.shape == (96, 96)
    tiles = tile_grid(img, 32)
    assert tiles.shape == (12, 32, 32)
    back = untile_grid(tiles, 3, 4)
    np.testing.assert_allclose(np.asarray(back), np.asarray(img[:96, :128]))


def test_random_crop_shape_and_bounds():
    img = jnp.asarray(np.arange(64 * 64, dtype=np.float32).reshape(64, 64))
    out = random_crop(jax.random.key(0), img, 16)
    assert out.shape == (16, 16)
    flat = np.asarray(out)
    assert flat.min() >= 0 and flat.max() < 64 * 64


def test_pipeline_determinism_and_resume():
    data = synthetic_micrographs(10, 32)
    cfg = PipelineConfig(batch_size=4, crop_size=32, seed=7, prefetch=2)
    p1 = DataPipeline(data, cfg)
    it1 = iter(p1)
    batches1 = [next(it1) for _ in range(5)]

    # Replay from scratch matches.
    p2 = DataPipeline(data, cfg)
    it2 = iter(p2)
    batches2 = [next(it2) for _ in range(5)]
    for a, b in zip(batches1, batches2):
        np.testing.assert_array_equal(a, b)

    # Resume from saved cursor reproduces the tail — through the
    # PREFETCHING iterator: the worker runs ahead but the resumable
    # cursor is committed only as batches are consumed, so state_dict()
    # taken mid-stream must not skip prefetched-but-unconsumed batches.
    p3 = DataPipeline(data, cfg)
    it3 = iter(p3)
    for _ in range(3):
        next(it3)
    saved = p3.state_dict()
    p4 = DataPipeline(data, cfg)
    p4.load_state_dict(saved)
    it4 = iter(p4)
    tail4 = [next(it4) for _ in range(2)]
    tail1 = batches1[3:5]
    for a, b in zip(tail1, tail4):
        np.testing.assert_array_equal(a, b)


def test_pipeline_random_crop_from_large_images():
    data = synthetic_micrographs(4, 64)
    cfg = PipelineConfig(batch_size=2, crop_size=32, seed=0)
    batch = next(iter(DataPipeline(data, cfg)))
    assert batch.shape == (2, 32, 32)


def test_device_dataset_batches_and_resume():
    from emx.data.pipeline import DeviceDataset

    data = synthetic_micrographs(12, 32)
    cfg = PipelineConfig(batch_size=4, crop_size=32, seed=2)
    ds = DeviceDataset(data, cfg)
    it = iter(ds)
    b1 = [np.asarray(next(it)) for _ in range(4)]  # crosses an epoch
    assert all(b.shape == (4, 32, 32) for b in b1)

    # Same seed -> same order.
    ds2 = DeviceDataset(data, cfg)
    b2 = [np.asarray(next(iter(ds2))) for _ in range(1)]
    np.testing.assert_array_equal(b1[0], b2[0])

    # Resume from cursor.
    ds3 = DeviceDataset(data, cfg)
    it3 = iter(ds3)
    next(it3); next(it3)
    saved = ds3.state_dict()
    ds4 = DeviceDataset(data, cfg)
    ds4.load_state_dict(saved)
    np.testing.assert_array_equal(np.asarray(next(iter(ds4))),
                                  np.asarray(b1[2]))


def test_ctf_micrographs_out_of_family():
    """OOD eval family (emx.bench.quant_check ood): finite, [0,1], and
    spectrally distinct from the training family — its radial spectrum
    must carry lattice Bragg peaks (a dominant non-DC mid-band peak)."""
    import numpy as np

    from emx.data.pipeline import ctf_micrographs

    x = ctf_micrographs(2, 128, seed=3)
    assert x.shape == (2, 128, 128) and np.isfinite(x).all()
    assert -1e-6 <= x.min() and x.max() <= 1 + 1e-5
    # deterministic in seed
    y = ctf_micrographs(2, 128, seed=3)
    np.testing.assert_allclose(x, y)


def test_grain_micrographs_second_ood_family():
    """Second, EVAL-ONLY OOD family (quant_check ood family='grains'):
    polycrystalline Voronoi grains. Must be finite, [0,1],
    deterministic, and piecewise-textured (several distinct grains ->
    local orientation varies across the image: the dominant gradient
    direction in one quadrant differs from another)."""
    import numpy as np

    from emx.data.pipeline import grain_micrographs

    x = grain_micrographs(2, 128, seed=3)
    assert x.shape == (2, 128, 128) and np.isfinite(x).all()
    assert -1e-6 <= x.min() and x.max() <= 1 + 1e-5
    y = grain_micrographs(2, 128, seed=3)
    np.testing.assert_allclose(x, y)
    # Piecewise texture: per-quadrant dominant gradient angle must not
    # be globally constant (a single global fringe would make them all
    # agree within ~5 degrees).
    gy, gx = np.gradient(x[0])
    angs = []
    for sy in (slice(0, 64), slice(64, 128)):
        for sx in (slice(0, 64), slice(64, 128)):
            a = np.arctan2(gy[sy, sx], gx[sy, sx]) % np.pi
            # circular mean over orientation (period pi)
            angs.append(0.5 * np.angle(np.mean(np.exp(2j * a))))
    spread = np.ptp(angs)
    assert spread > 0.15, f"quadrant orientations too uniform: {angs}"


def test_mixed_micrographs_composition():
    import numpy as np

    from emx.data.pipeline import mixed_micrographs

    x = mixed_micrographs(8, 64, seed=5)
    assert x.shape == (8, 64, 64) and np.isfinite(x).all()
    y = mixed_micrographs(8, 64, seed=5)
    np.testing.assert_allclose(x, y)  # deterministic


def test_filament_micrographs_third_ood_family():
    """Third, EVAL-ONLY OOD family (quant_check ood family='filaments'):
    curvilinear worm-like tubes + vesicle rings. Finite, [0,1],
    deterministic — and curvilinear rather than fringed: unlike every
    training family its orientation field must be smooth but globally
    isotropic (no dominant global fringe direction) while still being
    strongly structured (non-flat)."""
    import numpy as np

    from emx.data.pipeline import filament_micrographs

    x = filament_micrographs(2, 128, seed=7)
    assert x.shape == (2, 128, 128) and np.isfinite(x).all()
    assert -1e-6 <= x.min() and x.max() <= 1 + 1e-5
    y = filament_micrographs(2, 128, seed=7)
    np.testing.assert_allclose(x, y)
    # Structured (not flat background).
    assert x[0].std() > 0.05
    # No dominant global fringe: the orientation coherence of the
    # gradient field (|mean e^{2i theta}| weighted by magnitude) stays
    # well below a lattice image's (~1 for a single global fringe).
    gy, gx = np.gradient(x[0])
    mag = np.hypot(gy, gx)
    a = np.arctan2(gy, gx)
    coh = np.abs(np.sum(mag * np.exp(2j * a)) / max(np.sum(mag), 1e-9))
    assert coh < 0.5, f"filament family looks like a global fringe: {coh}"


def test_mixed_micrographs_v2_includes_grains():
    """Round-4 corpus: mixed_micrographs(grains=True) must differ from
    the round-3 mix and contain n//4 grain images (composition check by
    construction: the two calls share synthetic/ctf seeds, so any
    difference comes from the grains quarter + reshuffle)."""
    import numpy as np

    from emx.data.pipeline import mixed_micrographs

    v2 = mixed_micrographs(8, 64, seed=5)
    v1 = mixed_micrographs(8, 64, seed=5, grains=False)
    assert v2.shape == v1.shape == (8, 64, 64)
    assert not np.allclose(v2, v1)
    np.testing.assert_allclose(v2, mixed_micrographs(8, 64, seed=5))


def test_pipeline_integer_pack_fast_path():
    """Packed integer corpora flow through DataPipeline dtype-preserving
    (the device-side cast in the train step is what converts), and the
    per-crop affine of quantize_pack cancels under scale0to1."""
    import jax.numpy as jnp

    from emx.data.harvest import quantize_pack
    from emx.utils.image import scale0to1

    data = synthetic_micrographs(8, 32)
    q16 = quantize_pack(data, np.uint16)
    assert q16.dtype == np.uint16

    cfg = PipelineConfig(batch_size=4, crop_size=32, seed=3)
    batch = next(iter(DataPipeline(q16, cfg)))
    assert batch.dtype == np.uint16
    assert batch.shape == (4, 32, 32)

    # Same order as the float pipeline (the fast path only changes HOW
    # the gather happens, not WHAT it yields).
    fbatch = next(iter(DataPipeline(data, cfg)))
    a = np.asarray(scale0to1(jnp.asarray(batch, jnp.float32),
                             axis=(-2, -1)))
    b = np.asarray(scale0to1(jnp.asarray(fbatch), axis=(-2, -1)))
    np.testing.assert_allclose(a, b, atol=2.0 / 65535)


def test_trainer_step_accepts_integer_batch():
    """The jitted train step casts integer-packed batches on device."""
    import dataclasses

    import jax.numpy as jnp

    from emx.data.degrade import denoiser_example
    from emx.data.harvest import quantize_pack
    from emx.nn import Denoiser, DenoiserConfig
    from emx.train.engine import TrainConfig, Trainer

    cfg = dataclasses.replace(DenoiserConfig.tiny(), norm="group")
    trainer = Trainer(Denoiser(cfg),
                      TrainConfig(learning_rate=1e-3, log_every=100),
                      example_fn=denoiser_example)
    data = quantize_pack(synthetic_micrographs(4, 32), np.uint16)
    state = trainer.init(jnp.asarray(data[:2], jnp.float32))
    step0 = int(state.step)  # step_fn donates `state`
    state2, metrics = trainer.step_fn(state, jnp.asarray(data[:2]))
    assert int(state2.step) == step0 + 1
    assert np.isfinite(float(metrics["loss"]))
