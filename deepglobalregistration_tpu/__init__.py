"""deepglobalregistration_tpu — a TPU-native (JAX/XLA/Pallas) Deep Global Registration framework.

A from-scratch rebuild of the capabilities of chrischoy/DeepGlobalRegistration
(CVPR 2020) designed for TPU hardware:

- MinkowskiEngine's C++ sparse-tensor engine is replaced by a coordinate-hashed
  gather-GEMM-scatter engine over *padded, statically-shaped* buffers
  (`ops/hashing.py`, `ops/sparse_grid.py`, `ops/kernel_map.py`, `ops/sparse_conv.py`).
- Feature-space nearest-neighbor matching is a tiled on-device top-1 distance scan
  (`ops/knn.py`).
- The Weighted Procrustes solver, SE(3) refinement loop, safeguard RANSAC and ICP
  polish are fully jitted device code (`ops/procrustes.py`, `ops/se3.py`,
  `ops/ransac.py`, `ops/icp.py`, `core/registration.py`).
- Models are functional pytrees mirroring the reference model zoo
  (`models/resunet.py`, `models/simpleunet.py`, `models/pyramidnet.py`).
- The public API mirrors the reference:
  `core.pipeline.DeepGlobalRegistration(config).register(xyz0, xyz1) -> 4x4 T`.

Reference behavior citations use `file:line` into the upstream repo.
"""

__version__ = "0.1.0"
