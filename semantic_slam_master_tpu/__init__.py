"""semantic_slam_master_tpu — a TPU-native RGB-D semantic-SLAM framework in JAX.

A ground-up re-design of the capability surface of the reference repo
(Siverteh/semantic-slam-master) for TPU hardware:

- ``core``     — differentiable Lie groups (SO3/SE3), pinhole cameras,
                 fixed-shape masked utilities (XLA-friendly replacements for
                 the reference's dynamic-shape host loops).
- ``ops``      — the compute kernels: FAST corner scoring, oriented-BRIEF
                 (ORB) descriptors, Hamming/cosine brute-force matching on
                 the MXU, NMS, bilinear feature sampling, Sobel edges,
                 image pyramids.  Pallas variants live in ``ops/pallas``.
- ``models``   — the learned frontend family (ViT backbone, saliency
                 selector, descriptor refiner, uncertainty head) and a
                 per-frame semantic-segmentation CNN.
- ``losses``   — the 7+1 self-supervised training losses, vectorized and
                 mask-correct (no per-image Python loops).
- ``slam``     — PnP + RANSAC, Gauss-Newton frame-to-frame tracking,
                 Levenberg-Marquardt local bundle adjustment with
                 semantic/confidence-weighted residuals, keyframe policy,
                 the full-sequence SLAM system, TUM trajectory I/O.
- ``data``     — TUM RGB-D loading, timestamp association, a deterministic
                 synthetic RGB-D world for CI, host->HBM prefetch.
- ``eval``     — ATE/RPE (evo-parity Umeyama alignment) and the four
                 metric acceptance tests of the reference.
- ``train``    — pjit'd data-parallel training loop with orbax checkpoints.
- ``parallel`` — device-mesh and sharding helpers (DP + model axes).

Reference layer map: SURVEY.md §1; component inventory: SURVEY.md §2.
"""

__version__ = "0.1.0"
