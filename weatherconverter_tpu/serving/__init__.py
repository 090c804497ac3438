"""Serving layer: micro-batched HTTP inference (framework-new capability;
the reference serves nothing — its entry points are one-shot scripts)."""

from weatherconverter_tpu.serving.batcher import MicroBatcher
from weatherconverter_tpu.serving.hlo_runtime import load_stablehlo
from weatherconverter_tpu.serving.server import TranslationService, serve

__all__ = ["MicroBatcher", "TranslationService", "load_stablehlo", "serve"]
