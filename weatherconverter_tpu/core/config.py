"""Unified configuration tree for the WeatherConverter-TPU framework.

The PyTorch reference keeps two independent pydantic schemas, one per package
(reference: diffusion_model/config/models.py:5-66 and
seg_model/config/models.py). This framework unifies them into a single config
tree with per-subsystem sections, loaded from YAML with the same field names
and defaults so that the reference's YAML files
(diffusion_model/config/config.yaml, seg_model/config/config.yaml) parse
directly into the corresponding sections.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import yaml
from pydantic import BaseModel, Field


# ---------------------------------------------------------------------------
# Diffusion-side config (reference: diffusion_model/config/models.py)
# ---------------------------------------------------------------------------


class DiffusionDataConfig(BaseModel):
    """Mirrors DataConfig (reference: diffusion_model/config/models.py:5-14)."""

    root_dir: str = "data"
    acdc_dir: str = "ACDC"
    acdc_labels: str = "ACDC/gt"
    acdc_images: str = "ACDC/rgb_anon"
    bdd_dir: str = "BDD"
    dawn_dir: str = "DAWN"
    weather: list[str] = Field(default_factory=lambda: ["fog", "rain"])
    image_size: Any = 128  # int or [H, W] as in the reference YAML


class DiffusionProcessConfig(BaseModel):
    """Mirrors DiffusionConfig (reference: diffusion_model/config/models.py)."""

    num_timesteps: int = 1000
    beta_start: float = 1e-4
    beta_end: float = 0.02
    schedule: str = "linear"  # framework extension: linear | cosine


class UnetModelConfig(BaseModel):
    """Mirrors ModelConfig (reference: diffusion_model/config/models.py and
    config.yaml:16-28)."""

    name: str = "ddpm"
    im_channels: int = 3
    im_size: int = 128
    down_channels: list[int] = Field(default_factory=lambda: [64, 128, 256, 512, 768])
    mid_channels: list[int] = Field(default_factory=lambda: [768, 768, 512])
    down_sample: list[bool] = Field(default_factory=lambda: [True, True, True, False])
    time_emb_dim: int = 128
    num_down_layers: int = 2
    num_mid_layers: int = 2
    num_up_layers: int = 2
    num_heads: int = 4
    attn_resolutions: list[int] = Field(default_factory=lambda: [8, 16, 32, 64])


class TrainingConfig(BaseModel):
    """Mirrors TrainingConfig (reference: diffusion_model/config/models.py,
    config.yaml:30-43)."""

    device: str = "auto"
    random_seed: int = 3455
    epochs: int = 200
    batch_size: int = 4
    num_workers: int = 0
    lr: float = 1e-4
    log_interval: int = 10
    save_interval: int = 10
    sample_interval: int = 1_000_000_000
    resume_training: bool = False
    resume_checkpoint: str = ""
    sample_size: int = 8
    num_grid_rows: int = 4
    # Framework extensions (TPU-first):
    dtype: str = "bfloat16"  # compute dtype for model fwd/bwd
    param_dtype: str = "float32"
    data_axis: str = "data"  # mesh axis name for DP sharding
    donate_state: bool = True
    # EMA shadow of the UNet params (standard DDPM practice the reference
    # lacks); samplers prefer EMA params when a checkpoint carries them.
    ema_decay: float = 0.999
    # TPU-native batch scaling: batch_size is PER-DEVICE and the global batch
    # grows with the mesh (8 chips -> 8x the reference's global batch). Set
    # False to treat batch_size as global (reference semantics).
    scale_batch_to_mesh: bool = True
    scale_lr_with_batch: bool = False  # linear LR scaling when batch grows
    # ZeRO-3-style param/opt-state sharding across the data mesh
    # (parallel/fsdp.py); DP-replicated state when False (the default)
    fsdp: bool = False
    # gradient accumulation: microbatches per optimizer update (must divide
    # the per-device batch); 1/accum the activation memory, same estimator
    accum_steps: int = 1


class FolderConfig(BaseModel):
    """Mirrors FolderConfig (reference: diffusion_model/config/models.py)."""

    output: str = "outputs"
    weights: str = "weights"
    logs: str = "logs"
    checkpoints: str = "outputs/checkpoints"
    samples: str = "outputs/samples"


class DiffusionConfig(BaseModel):
    """Top-level diffusion config (reference: diffusion_model/config/models.py:61-66)."""

    data: DiffusionDataConfig = Field(default_factory=DiffusionDataConfig)
    diffusion: DiffusionProcessConfig = Field(default_factory=DiffusionProcessConfig)
    model: UnetModelConfig = Field(default_factory=UnetModelConfig)
    training: TrainingConfig = Field(default_factory=TrainingConfig)
    folders: FolderConfig = Field(default_factory=FolderConfig)


# ---------------------------------------------------------------------------
# Segmentation-side config (reference: seg_model/config/models.py + config.yaml)
# ---------------------------------------------------------------------------


class LossConfig(BaseModel):
    type: str = "CrossEntropyLoss"
    params: dict[str, Any] = Field(
        default_factory=lambda: {"ignore_index": 255, "reduction": "mean"}
    )


class LRSchedulerConfig(BaseModel):
    type: str = "PolyLR"
    params: dict[str, Any] = Field(default_factory=lambda: {"power": 0.9})


class SegTrainingConfig(BaseModel):
    """Mirrors seg TrainingConfig (reference: seg_model/config/config.yaml:1-27)."""

    device: str = "auto"
    random_seed: int = 42
    epochs: int = 20
    batch_size: int = 8
    num_workers: int = 0
    log_interval: int = 10
    save_interval: int = 5
    resume_training: bool = False
    resume_checkpoint: str = ""
    loss_function: LossConfig = Field(default_factory=LossConfig)
    scheduler: LRSchedulerConfig = Field(default_factory=LRSchedulerConfig)
    dtype: str = "bfloat16"
    param_dtype: str = "float32"
    data_axis: str = "data"
    scale_batch_to_mesh: bool = True  # batch_size is per-device (see diffusion)
    scale_lr_with_batch: bool = False
    fsdp: bool = False  # ZeRO-3 state sharding (parallel/fsdp.py)
    accum_steps: int = 1  # gradient-accumulation microbatches per update


class JitterConfig(BaseModel):
    brightness: float = 0.2
    contrast: float = 0.2
    saturation: float = 0.2


class RandomNoiseConfig(BaseModel):
    mean: float = 0.1
    std_range: list[float] = Field(default_factory=lambda: [0.0, 0.05])


class ClassWiseMaskingConfig(BaseModel):
    p: float = 0.1
    num_classes_to_keep: int = 1


class SegTransformConfig(BaseModel):
    """Mirrors the transform section (reference: seg_model/config/config.yaml:36-51)."""

    resize_resolution: list[int] = Field(default_factory=lambda: [270, 480])
    target_resolution: list[int] = Field(default_factory=lambda: [256, 256])
    mean: list[float] = Field(default_factory=lambda: [0.485, 0.456, 0.406])
    std: list[float] = Field(default_factory=lambda: [0.229, 0.224, 0.225])
    horizontal_flip: float = 0.5
    # optional geometric legs of the reference's ExtCompose toolbox
    # (ext_transforms.py:184-207 RandomScale, :239-310 RandomRotation);
    # None/0 = off (the reference's shipped config does not enable them)
    scale_range: list[float] | None = None
    rotation_degrees: float = 0.0
    hue: float = 0.0
    jitter: JitterConfig = Field(default_factory=JitterConfig)
    random_noise: RandomNoiseConfig = Field(default_factory=RandomNoiseConfig)
    class_wise_masking: ClassWiseMaskingConfig = Field(
        default_factory=ClassWiseMaskingConfig
    )


class SegDataConfig(BaseModel):
    """Mirrors seg DataConfig (reference: seg_model/config/config.yaml:29-51)."""

    root_dir: str = "data/ACDC"
    labels: str = "gt"
    images: str = "rgb_anon"
    train_split: str = "train"
    val_split: str = "val"
    weather: list[str] = Field(default_factory=lambda: ["fog", "rain"])
    transform: SegTransformConfig = Field(default_factory=SegTransformConfig)


class OptimizerConfig(BaseModel):
    """Mirrors the optimizer section (reference: seg_model/config/config.yaml:53-61).

    `layerwise_lr` implements the backbone-at-0.1x-head-lr param groups of
    reference seg_model/train.py:333-344.
    """

    type: str = "SGD"
    params: dict[str, Any] = Field(
        default_factory=lambda: {"lr": 1e-4, "momentum": 0.9, "weight_decay": 1e-4}
    )
    layerwise_lr: dict[str, float] = Field(
        default_factory=lambda: {"backbone": 1e-5, "classifier": 1e-4}
    )


class SegModelConfig(BaseModel):
    """Mirrors seg ModelConfig (reference: seg_model/config/config.yaml:63-68)."""

    path: str = ""
    name: str = "deeplabv3plus_resnet101"
    num_classes: int = 19
    # ImageNet backbone init — the reference's pretrained_backbone=True
    # (modeling.py:128-222): either an explicit classification-checkpoint
    # .pth path, or 'imagenet'/'auto' to resolve the torch.hub-cached file
    # by backbone name (compat.torch_import.resolve_backbone_checkpoint;
    # no egress here, so the download itself happens on a connected machine)
    pretrained_backbone: str = ""
    output_stride: int = 16
    bn_momentum: float = 0.01


class SegConfig(BaseModel):
    """Top-level segmentation config (reference: seg_model/config/models.py:72-77)."""

    training: SegTrainingConfig = Field(default_factory=SegTrainingConfig)
    data: SegDataConfig = Field(default_factory=SegDataConfig)
    optimizer: OptimizerConfig = Field(default_factory=OptimizerConfig)
    model: SegModelConfig = Field(default_factory=SegModelConfig)
    folders: FolderConfig = Field(default_factory=FolderConfig)


# ---------------------------------------------------------------------------
# SRGAN config (reference hardcodes Generator hyperparams: srgan_model/models.py:76)
# ---------------------------------------------------------------------------


class SRGANConfig(BaseModel):
    in_channels: int = 3
    num_channels: int = 64
    num_blocks: int = 16
    upscale_factor: int = 4
    checkpoint: str = ""


class SRGANTrainingConfig(TrainingConfig):
    """Swift-SRGAN training knobs (capability the reference lacks — it ships
    only srgan_model/inference.py; recipe follows the Swift-SRGAN paper:
    pixel-loss pretrain, then adversarial fine-tune)."""

    pretrain_epochs: int = 5
    g_lr: float = 1e-4
    d_lr: float = 1e-4
    pixel_loss: str = "l1"  # 'l1' | 'l2'
    adv_weight: float = 1e-3
    hr_crop: int = 96  # HR patch size; LR patch = hr_crop / upscale_factor


class SRGANTrainConfig(BaseModel):
    srgan: SRGANConfig = Field(default_factory=SRGANConfig)
    data: DiffusionDataConfig = Field(default_factory=DiffusionDataConfig)
    training: SRGANTrainingConfig = Field(default_factory=SRGANTrainingConfig)
    folders: FolderConfig = Field(default_factory=FolderConfig)


# ---------------------------------------------------------------------------
# Translation / guided-sampling config (reference: translation.py:55-56 hardcodes
# LAMBDA = 60.0, N = 500)
# ---------------------------------------------------------------------------


class GuidanceConfig(BaseModel):
    lambda_: float = Field(default=60.0, alias="lambda")
    num_steps: int = 500
    # 'reference' replicates translation.py:90 (the guided xt is overwritten by
    # mu + sigma*z every step — a latent bug in the reference); 'fixed' keeps the
    # guided xt as the paper intends.
    mode: str = "fixed"
    model_config = {"populate_by_name": True}


class TranslationConfig(BaseModel):
    diffusion: DiffusionConfig = Field(default_factory=DiffusionConfig)
    seg: SegConfig = Field(default_factory=SegConfig)
    srgan: SRGANConfig = Field(default_factory=SRGANConfig)
    guidance: GuidanceConfig = Field(default_factory=GuidanceConfig)


# ---------------------------------------------------------------------------
# Loading
# ---------------------------------------------------------------------------


def load_yaml(path: str) -> dict:
    with open(path, "r") as f:
        return yaml.safe_load(f) or {}


def load_diffusion_config(path: Optional[str] = None, **overrides) -> DiffusionConfig:
    """Load a diffusion config YAML (same schema as reference
    diffusion_model/config/config.yaml); `load_config` in the reference is
    per-entry-point (reference: diffusion_model/train_ddpm.py:20-23)."""
    data = load_yaml(path) if path else {}
    data = _deep_update(data, overrides)
    return DiffusionConfig(**data)


def load_seg_config(path: Optional[str] = None, **overrides) -> SegConfig:
    """Load a segmentation config YAML (same schema as reference
    seg_model/config/config.yaml; loader at seg_model/train.py:24-27)."""
    data = load_yaml(path) if path else {}
    data = _deep_update(data, overrides)
    return SegConfig(**data)


def load_srgan_train_config(path: Optional[str] = None, **overrides) -> SRGANTrainConfig:
    """Load a Swift-SRGAN training config YAML (framework capability — the
    reference ships no SRGAN training, srgan_model/inference.py only)."""
    data = load_yaml(path) if path else {}
    data = _deep_update(data, overrides)
    return SRGANTrainConfig(**data)


def load_translation_config(path: Optional[str] = None, **overrides) -> TranslationConfig:
    data = load_yaml(path) if path else {}
    data = _deep_update(data, overrides)
    return TranslationConfig(**data)


def _deep_update(base: dict, upd: dict) -> dict:
    out = dict(base)
    for k, v in upd.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_update(out[k], v)
        else:
            out[k] = v
    return out


def resolve_device_count() -> int:
    """Number of local accelerator devices visible to JAX."""
    import jax

    return jax.local_device_count()


def default_config_dir() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(here, "configs")
