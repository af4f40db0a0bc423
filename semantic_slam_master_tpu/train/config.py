"""Typed training configuration with reference-portable YAML keys.

One dataclass tree replacing the reference's untyped
``yaml.safe_load`` + dict-indexing config plumbing (`train.py:41-164`,
`configs/train_config.yaml`). Key names match the reference YAML so its
config files load unchanged; unknown keys are ignored with a warning.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional


@dataclass
class ModelConfig:
    backbone: str = "vit_small_patch16_dinov3.lvd1689m"
    input_size: int = 448
    num_keypoints: int = 500
    selector_hidden: int = 256
    selector_layers: int = 3
    descriptor_dim: int = 128
    refiner_hidden: int = 384
    refiner_layers: int = 4
    estimator_hidden: int = 128
    # TPU-build extensions (absent from the reference):
    backbone_depth: int = 12
    backbone_dim: int = 384
    backbone_heads: int = 6
    # Canonical pos-embed grid (param resolution; resized to the input's
    # patch grid at apply time, models/backbone.py).
    backbone_pos_grid: int = 28
    # Learned sub-patch keypoint offsets (models.frontend.OffsetHead);
    # train with it on + loss.weights.localization > 0.
    subpatch_refine: bool = False


@dataclass
class AugmentationConfig:
    enabled: bool = True
    brightness: float = 0.2
    contrast: float = 0.2
    hue: float = 0.1
    saturation: float = 0.2
    gaussian_blur: float = 0.3


@dataclass
class DatasetConfig:
    root: str = "data/tum_rgbd"
    train_sequences: List[str] = field(
        default_factory=lambda: [
            "rgbd_dataset_freiburg1_desk",
            "rgbd_dataset_freiburg1_room",
            "rgbd_dataset_freiburg3_walking_static",
        ]
    )
    val_sequences: List[str] = field(
        default_factory=lambda: ["rgbd_dataset_freiburg1_plant"]
    )
    test_sequences: List[str] = field(
        default_factory=lambda: [
            "rgbd_dataset_freiburg3_long_office_household",
            "rgbd_dataset_freiburg3_walking_xyz",
        ]
    )
    frame_spacing: int = 1
    max_frames: Optional[int] = None
    augmentation: AugmentationConfig = field(default_factory=AugmentationConfig)
    # TPU-build extension: use the synthetic world instead of TUM on disk.
    synthetic: bool = False
    synthetic_frames: int = 64
    # Independently-seeded synthetic rooms per split (texture/trajectory
    # diversity — the descriptor's lookalike-texture confusions are a
    # world-diversity problem, not a capacity problem).
    synthetic_worlds: int = 3


@dataclass
class LossConfig:
    weights: Dict[str, float] = field(
        default_factory=lambda: {
            "desc": 8.0,
            "repeat": 0.3,
            "variance": 0.5,
            "peakiness": 0.1,
            "activation": 0.05,
            "edge": 0.3,
            "sparsity": 0.3,
            # TPU-build extension: the uncertainty head is TRAINED (the
            # reference declares it but gives it zero gradient).
            "calibration": 0.3,
            "expected_error": 0.02,
        }
    )
    # NOTE: the reference's `num_negatives: 40` knob is intentionally NOT
    # carried over: the batched InfoNCE uses ALL in-frame descriptors as
    # negatives (strictly stronger signal, and subsampling would add a
    # gather for no TPU win). Unknown YAML keys are ignored on load, so
    # reference configs stay portable.
    desc_temperature: float = 0.10
    repeat_threshold: float = 2.0
    target_variance: float = 0.22
    sparsity_target: float = 0.35
    edge_threshold: float = 0.1
    sparsity_penalty: float = 2.0
    # TPU-build extension (synthetic recipe only): build InfoNCE
    # positives from the GT depth+pose warp instead of in-training
    # mutual-NN matches. The reference's self-supervised bootstrap works
    # because its FROZEN pretrained DINOv3 descriptors are already
    # discriminative; trained from scratch (no pretrained weights can
    # exist in this container — recorded waiver) the bootstrap
    # self-reinforces lookalike-texture mismatches (measured: the true
    # correspondent's similarity stays at 0.15 while lookalikes reach
    # 0.87). GT supervision is only used where GT is free (the synthetic
    # world); TUM configs keep the reference's self-supervised matching.
    gt_supervision: bool = False
    # Pairing radius (px at the training resolution) for GT positives:
    # below half the 16-px patch pitch, so the paired cell is
    # unambiguous even before the OffsetHead localizes.
    gt_match_radius: float = 6.0
    # Hard-negative mining (TPU-build extension; requires
    # gt_supervision — the safe-radius mask needs GT warp distances).
    # See losses.descriptor_matching_loss_hard: safe-radius spatial
    # masking + cross-image negatives + hardest-negative margin
    # (weighted by weights['hard']).
    hard_negatives: bool = False
    # Frame-2 keypoints within this px radius of the warped GT position
    # are NOT negatives (they see nearly the same surface).
    safe_radius: float = 12.0
    cross_image_negatives: bool = True
    hard_margin: float = 0.2


@dataclass
class TrainingConfig:
    epochs: int = 60
    batch_size: int = 4
    lr: float = 1e-4
    lr_min: float = 1e-6
    weight_decay: float = 1e-4
    grad_clip: float = 1.0
    num_workers: int = 4
    warmup_epochs: int = 3
    val_interval: int = 1
    save_interval: int = 5
    save_dir: str = "checkpoints"
    # TPU-build extensions:
    mesh_data: Optional[int] = None  # None = all devices
    mesh_model: int = 1
    steps_per_epoch: Optional[int] = None
    seed: int = 0
    # Unfreeze the ViT backbone. The reference always freezes its
    # pretrained DINOv3 (`train.py:57-61`); training from scratch (e.g.
    # on the synthetic world, where no pretrained weights exist) needs
    # backbone gradients or the frozen random features are the ceiling.
    train_backbone: bool = False


@dataclass
class LoggingConfig:
    use_wandb: bool = False
    project: str = "semantic-slam-tpu"
    run_name: str = "run"
    log_interval: int = 50


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    logging: LoggingConfig = field(default_factory=LoggingConfig)


def _update_dataclass(obj, data: dict, path: str = ""):
    for key, value in data.items():
        if not hasattr(obj, key):
            print(f"[config] ignoring unknown key {path}{key}")
            continue
        current = getattr(obj, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            _update_dataclass(current, value, path=f"{path}{key}.")
        else:
            # YAML parses "1e-4" as a string; coerce to the field's numeric
            # type (the reference papers over this with float() casts,
            # `train.py:119-127`).
            if isinstance(current, float) and isinstance(value, (str, int)):
                value = float(value)
            elif isinstance(current, int) and not isinstance(current, bool) and isinstance(value, str):
                value = int(float(value))
            setattr(obj, key, value)


def load_config(path: str | Path | None = None, overrides: dict | None = None) -> Config:
    """Load a Config from a reference-format YAML file + dict overrides."""
    import yaml

    cfg = Config()
    if path is not None:
        with open(path, "r") as f:
            data = yaml.safe_load(f) or {}
        _update_dataclass(cfg, data)
    if overrides:
        _update_dataclass(cfg, overrides)
    return cfg


def to_dict(cfg: Config) -> dict:
    return dataclasses.asdict(cfg)
