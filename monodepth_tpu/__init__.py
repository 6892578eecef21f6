"""monodepth_tpu — a TPU-native self-supervised monocular depth framework.

A from-scratch JAX/XLA/Flax/Pallas rebuild of the capabilities of
`russellgeum/Digging-into-Self-Supervised-Monocular-Depth-Estimation`
(a Monodepth2 reimplementation; see /root/repo/SURVEY.md):

- ResNet depth encoder + skip-connection depth decoder + pose networks
  (``separate`` / ``shared`` / ``posecnn`` wirings)                      -> models/
- Differentiable geometry: disparity->depth, axis-angle SE(3),
  backprojection/projection, bilinear grid sampling                      -> ops/
- Monodepth2 loss stack: per-pixel minimum SSIM+L1 reprojection with
  auto-masking, edge-aware disparity smoothness                          -> losses/
- KITTI raw data pipeline (mono / stereo / mono+stereo), velodyne->depth
  ground truth, device-side augmentation                                 -> data/
- Jitted training step + epoch loop, Orbax checkpoint/resume             -> training/
- KITTI Eigen evaluation protocol (median scaling, Garg crop)            -> evaluation/
- Data-parallel scaling over a `jax.sharding.Mesh` (ICI collectives)     -> parallel/

Everything on the compute path is NHWC, statically shaped, and traced
once under `jax.jit`; the host side only decodes JPEGs and resizes —
augmentation, the scale pyramid, warping and losses all run on TPU.
"""

__version__ = "0.1.0"

from monodepth_tpu.config import Config, options  # noqa: F401
