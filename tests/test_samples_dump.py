import glob
import os

import jax.numpy as jnp

from emx.data.degrade import denoiser_example
from emx.data.pipeline import DataPipeline, PipelineConfig, synthetic_micrographs
from emx.nn import Denoiser, DenoiserConfig
from emx.train import TrainConfig, Trainer


def test_sample_dump_writes_tiff_triples(tmp_path):
    cfg = TrainConfig(learning_rate=0.01, optimizer="adam", log_every=0,
                      sample_every=2, model_dir=str(tmp_path))
    model = Denoiser(DenoiserConfig(features=(8, 8, 8, 8, 8),
                                    num_middle_blocks=0, aspp_filters=8,
                                    aspp_out=8, norm="group"))
    trainer = Trainer(model, cfg, example_fn=denoiser_example)
    pipe = DataPipeline(synthetic_micrographs(8, 32), PipelineConfig(
        batch_size=8, crop_size=32))
    state = trainer.init(jnp.zeros((8, 32, 32)))
    trainer.fit(state, pipe, num_steps=2)
    files = sorted(glob.glob(os.path.join(tmp_path, "samples", "*.tif")))
    names = {os.path.basename(f) for f in files}
    assert {"2_input.tif", "2_truth.tif", "2_output.tif"} <= names
