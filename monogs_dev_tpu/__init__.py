"""monogs_dev_tpu — a TPU-native Gaussian-Splatting SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of MonoGS
("Gaussian Splatting SLAM", CVPR 2024): dense monocular / RGB-D / stereo
SLAM whose map is a 3D Gaussian point set, with camera tracking done by
differentiating a tile-based rasterizer w.r.t. SE(3) camera pose.

Layout:
  geometry/  SE(3)/SO(3) exp maps, projection matrices, spherical harmonics
  utils/     config (YAML + inherit_from), losses, logging, PLY I/O
  models/    camera state, fixed-capacity Gaussian map + state surgery
  ops/       differentiable rasterizer (tiled XLA + Pallas), kNN scale init
  core/      jitted tracking/mapping steps, keyframe policy, SLAM system
  parallel/  device-mesh sharding helpers (pixel/keyframe data parallelism)
  data/      TUM / Replica / EuRoC / Realsense-replay / synthetic datasets
  eval/      ATE (Umeyama), PSNR/SSIM/LPIPS rendering metrics
"""

__version__ = "0.1.0"
