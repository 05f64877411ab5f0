"""emx — TPU-native electron-microscopy CV framework.

A ground-up JAX/XLA/Pallas/pjit re-design with the capabilities of the
reference research monorepo (Jeffrey-Ede/AI-CV-Automation-Elect-Micr):
micrograph harvesting (DM3/DM4 decode), low-dose degradation synthesis,
CNN/GAN training (denoising, partial-scan infilling, autoencoding),
exit-wavefunction reconstruction, tiled/batched inference serving, and
microscope control.

Layering (see SURVEY.md §7):
  emx.io       — DM3/DM4 decode (C++ + Python fallback), TIFF/npy, manifests
  emx.physics  — CTF / Fresnel propagation / aberrations / image statistics
  emx.data     — degradation synthesis + sharded deterministic input pipeline
  emx.ops      — Pallas TPU kernels for hot data/compute paths
  emx.nn       — flax model zoo (denoiser, infilling GAN, autoencoders, ...)
  emx.parallel — mesh construction, sharding rules, spatial (halo) parallelism
  emx.train    — one training engine (pjit step, optax, GAN scheduling, orbax)
  emx.recon    — exit-wavefunction reconstruction (EWREC, aberration fitting)
  emx.serve    — tiled/batched inference, export, HTTP serving
  emx.scope    — microscope daemon protocol, simulator, RL environments
"""

__version__ = "0.1.0"
