"""Model zoo: DDPM UNets, DeepLabV3(+) x {resnet, mobilenet, xception,
hrnet}, Swift-SRGAN."""

from weatherconverter_tpu.models.factory import make_seg_model
from weatherconverter_tpu.models.srgan import Discriminator, Generator
from weatherconverter_tpu.models.unet import Unet
from weatherconverter_tpu.models.unet_legacy import LegacyUNet

__all__ = ["Unet", "LegacyUNet", "Generator", "Discriminator", "make_seg_model"]
