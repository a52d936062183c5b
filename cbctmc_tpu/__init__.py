"""cbctmc_tpu — a TPU-native framework for Monte-Carlo simulation of 3D/4D
cone-beam CT (CBCT) from CT images.

This is a from-scratch re-design (not a port) of the capabilities of the
IPMI-ICNS-UKE/4d-cbct-mc reference pipeline:

- photon-transport Monte-Carlo engine (Woodcock delta-tracking with
  PENELOPE-2006-style Compton/Rayleigh/photoelectric sampling and
  scatter-separated detector tallies) as batched JAX/XLA compute, replacing
  the CUDA MC-GPU binary (reference: docker/mcgpu/MC-GPU_kernel_v1.3.cu),
- Joseph forward projection and FDK/4D-ROOSTER reconstruction in JAX,
  replacing the RTK CLI apps (reference: cbctmc/reconstruction/),
- CT -> tissue segmentation -> material/density voxel geometry pipeline
  (reference: cbctmc/mc/geometry.py, cbctmc/segmentation/),
- respiratory-signal-driven 4D simulation via correspondence-model geometry
  warping (reference: cbctmc/mc/simulation.py, cbctmc/registration/),
- DL projection-denoising "speedup" models in flax
  (reference: cbctmc/speedup/).

Distribution model: photon batches and projections are sharded over a
``jax.sharding.Mesh``; detector tallies are reduced with ``psum`` over ICI
(replacing the reference's MPI_Reduce multi-GPU path).
"""

__version__ = "0.1.0"
