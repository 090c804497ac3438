"""WeatherConverter-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for
semantic-gradient-guided diffusion weather translation.

Re-designed from scratch with the capabilities of the PyTorch reference
(xXCoffeeColaXc/WeatherConverter): DDPM training/sampling, DeepLabV3+/
DeepLabV3 segmentation over four backbone families, Swift-SRGAN 4x
super-resolution, and the SGG guided-translation pipeline — all expressed as
pure functions jitted over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
