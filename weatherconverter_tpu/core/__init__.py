"""Core: config tree, RNG threading, checkpointing, logging, profiling."""

from weatherconverter_tpu.core.config import (
    DiffusionConfig,
    SegConfig,
    TranslationConfig,
    load_diffusion_config,
    load_seg_config,
    load_translation_config,
)
from weatherconverter_tpu.core.rng import run_key, split_named

__all__ = [
    "DiffusionConfig", "SegConfig", "TranslationConfig",
    "load_diffusion_config", "load_seg_config", "load_translation_config",
    "run_key", "split_named",
]
