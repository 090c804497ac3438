"""Diffusion: noise schedules and scan-based samplers."""

from weatherconverter_tpu.diffusion.sampling import (
    ddim_sample,
    ddpm_sample,
    ddpm_sample_legacy,
    partial_forward_then_reverse,
)
from weatherconverter_tpu.diffusion.schedule import (
    NoiseSchedule,
    cosine_schedule,
    ddpm_step,
    linear_schedule,
    make_schedule,
    posterior_mean,
    posterior_sigma,
    predict_x0,
    q_sample,
)

__all__ = [
    "NoiseSchedule", "linear_schedule", "cosine_schedule", "make_schedule",
    "q_sample", "predict_x0", "posterior_mean", "posterior_sigma", "ddpm_step",
    "ddpm_sample", "ddim_sample", "ddpm_sample_legacy",
    "partial_forward_then_reverse",
]
