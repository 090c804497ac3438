"""Semantic Gradient Guidance operators and the guided-translation scan."""

from weatherconverter_tpu.guidance.sgg import (
    apply_gsg,
    apply_lcg,
    gradient_magnitude,
    guidance_field,
    seg_input_gradients,
)
from weatherconverter_tpu.guidance.translate import make_translate_fn, sample_with_sgg

__all__ = [
    "apply_gsg", "apply_lcg", "gradient_magnitude", "guidance_field",
    "seg_input_gradients", "sample_with_sgg", "make_translate_fn",
]
