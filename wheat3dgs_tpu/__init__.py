"""wheat3dgs_tpu — a TPU-native 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Wheat3DGS
(zdwww/Wheat-3DGS): differentiable Gaussian-splat rasterization with
depth+alpha channels, FlashSplat-style 2D->3D instance-mask lifting,
wheat-head segmentation, novel-view-synthesis training/eval, 360 video
rendering, and per-head morphology — designed TPU-first:

- Gaussians are a fixed-capacity pytree of arrays (no tensor re-allocs);
  densify/clone/prune are masked scatter ops under jit.
- The rasterizer replaces the CUDA tile rasterizers
  (reference: submodules/diff-gaussian-rasterization, flashsplat-rasterization)
  with: pure-jnp EWA projection, XLA lexicographic (tile, depth) key sort for
  binning, and Pallas per-tile compositing kernels where front-to-back alpha
  blending is expressed with cumulative transmittance so the color reduction
  runs on the MXU as a matmul.
- Scale-out is a jax.sharding Mesh: plots (scenes) data-parallel on one axis,
  image tiles sharded on a second axis with psum-combined gradients.
"""

__version__ = "0.1.0"
