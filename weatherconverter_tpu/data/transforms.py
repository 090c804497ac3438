"""Batched ON-DEVICE augmentation pipelines.

The reference augments per-sample on the host CPU through torchvision /
PIL (diffusion: train_ddpm.py:150-159; seg: the ExtCompose paired pipeline,
seg_model/utils/ext_transforms.py). TPU-first re-design: every random
transform is a pure jnp function over a whole batch and a jax.random key,
jitted together with the train step, so augmentation rides the accelerator
and the host only decodes+resizes.

Paired transforms keep image and label geometrically aligned (the ExtCompose
contract): the same crop offsets / flip mask apply to both, labels always
via nearest/gather (never interpolated).

Parity map (reference ext_transforms.py / train_ddpm.py):
  random_crop            <- ExtRandomCrop / transforms.RandomCrop
  random_hflip           <- ExtRandomHorizontalFlip(p) (:243-258)
  color_jitter           <- ExtColorJitter(brightness, contrast, saturation)
  add_gaussian_noise     <- AddGaussianNoise(mean, std_range) (:21-54)
  class_wise_masking     <- ClassWiseMasking(p, num_classes_to_keep) (:57-95)
  to_diffusion_range     <- Lambda(x*2-1) (train_ddpm.py:157-158)
  normalize              <- ExtNormalize(ImageNet mean/std)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

# Classes the reference's ClassWiseMasking may keep (ext_transforms.py:71):
# road, sidewalk, building, vegetation, sky, person, car, bus
CLASSWISE_ALLOWED = (0, 1, 2, 8, 10, 11, 13, 15)


def to_float(x: jax.Array) -> jax.Array:
    """uint8 HWC -> float32 [0,1] (ToTensor without the layout change)."""
    return x.astype(jnp.float32) / 255.0


def to_diffusion_range(x: jax.Array) -> jax.Array:
    """[0,1] -> [-1,1] (reference: train_ddpm.py:157-158, dataloader.py:47)."""
    return x * 2.0 - 1.0


def random_crop(
    key: jax.Array, images: jax.Array, size: tuple[int, int],
    labels: Optional[jax.Array] = None,
):
    """Batched random crop; one offset per example (torchvision RandomCrop /
    ExtRandomCrop). images (B, H, W, C); labels (B, H, W) share offsets."""
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    th, tw = size
    ky, kx = jax.random.split(key)
    ys = jax.random.randint(ky, (b,), 0, h - th + 1)
    xs = jax.random.randint(kx, (b,), 0, w - tw + 1)

    def crop_one(img, y, x):
        return jax.lax.dynamic_slice(img, (y, x, 0), (th, tw, img.shape[-1]))

    out = jax.vmap(crop_one)(images, ys, xs)
    if labels is None:
        return out

    def crop_lbl(lbl, y, x):
        return jax.lax.dynamic_slice(lbl, (y, x), (th, tw))

    return out, jax.vmap(crop_lbl)(labels, ys, xs)


def random_hflip(
    key: jax.Array, images: jax.Array, p: float = 0.5,
    labels: Optional[jax.Array] = None,
):
    """Per-example horizontal flip (ExtRandomHorizontalFlip,
    ext_transforms.py:243-258)."""
    b = images.shape[0]
    flip = jax.random.uniform(key, (b,)) < p
    fi = jnp.where(flip[:, None, None, None], images[:, :, ::-1, :], images)
    if labels is None:
        return fi
    fl = jnp.where(flip[:, None, None], labels[:, :, ::-1], labels)
    return fi, fl


def random_vflip(
    key: jax.Array, images: jax.Array, p: float = 0.5,
    labels: Optional[jax.Array] = None,
):
    """ExtRandomVerticalFlip parity."""
    b = images.shape[0]
    flip = jax.random.uniform(key, (b,)) < p
    fi = jnp.where(flip[:, None, None, None], images[:, ::-1, :, :], images)
    if labels is None:
        return fi
    fl = jnp.where(flip[:, None, None], labels[:, ::-1, :], labels)
    return fi, fl


def color_jitter(
    key: jax.Array,
    images: jax.Array,
    brightness: float = 0.2,
    contrast: float = 0.2,
    saturation: float = 0.2,
) -> jax.Array:
    """Per-example brightness/contrast/saturation jitter with torchvision
    factor semantics (factor ~ U[max(0, 1-a), 1+a]; images in [0,1])."""
    b = images.shape[0]
    kb, kc, ks = jax.random.split(key, 3)

    def factors(k, a):
        return jax.random.uniform(
            k, (b, 1, 1, 1), minval=max(0.0, 1.0 - a), maxval=1.0 + a
        )

    out = images
    if brightness:
        out = out * factors(kb, brightness)
    if contrast:
        mean = jnp.mean(
            0.299 * out[..., 0:1] + 0.587 * out[..., 1:2] + 0.114 * out[..., 2:3],
            axis=(1, 2), keepdims=True,
        )
        out = (out - mean) * factors(kc, contrast) + mean
    if saturation:
        gray = (
            0.299 * out[..., 0:1] + 0.587 * out[..., 1:2] + 0.114 * out[..., 2:3]
        )
        out = (out - gray) * factors(ks, saturation) + gray
    return jnp.clip(out, 0.0, 1.0)


def add_gaussian_noise(
    key: jax.Array,
    images: jax.Array,
    mean: float = 0.1,
    std_range: tuple[float, float] = (0.0, 0.05),
) -> jax.Array:
    """AddGaussianNoise parity (ext_transforms.py:21-54): per-example std
    drawn from std_range, noise added in [0,1] space, clipped."""
    b = images.shape[0]
    ks, kn = jax.random.split(key)
    std = jax.random.uniform(
        ks, (b, 1, 1, 1), minval=std_range[0], maxval=std_range[1]
    )
    noise = jax.random.normal(kn, images.shape) * std + mean * std
    return jnp.clip(images + noise, 0.0, 1.0)


def class_wise_masking(
    key: jax.Array,
    images: jax.Array,
    labels: jax.Array,
    p: float = 0.1,
    num_classes_to_keep: int = 1,
    allowed: Sequence[int] = CLASSWISE_ALLOWED,
    ignore_index: int = 255,
):
    """ClassWiseMasking parity (ext_transforms.py:57-95): with prob p per
    example, choose `num_classes_to_keep` classes from the allowed set that
    are PRESENT in the label, black out all other pixels in the image and
    set their labels to ignore_index."""
    b = images.shape[0]
    kp, kc = jax.random.split(key)
    allowed_arr = jnp.asarray(allowed, dtype=jnp.int32)  # (A,)

    # presence (B, A): does class a appear in example b's label?
    present = jnp.any(
        labels[:, None, :, :] == allowed_arr[None, :, None, None], axis=(2, 3)
    )
    # only examples that contain at least one allowed class can be masked
    # (the reference samples from the present-class list, ext_transforms.py:75)
    apply = (jax.random.uniform(kp, (b,)) < p) & jnp.any(present, axis=1)
    # Gumbel-top-k over present classes -> indices of kept classes
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(kc, (b, len(allowed)), minval=1e-6, maxval=1.0)))
    scores = jnp.where(present, gumbel, -jnp.inf)
    _, top_idx = jax.lax.top_k(scores, num_classes_to_keep)  # (B, K)
    kept = allowed_arr[top_idx]  # (B, K)

    keep_mask = jnp.any(
        labels[:, None, :, :] == kept[:, :, None, None], axis=1
    )  # (B, H, W)
    do = apply[:, None, None]
    keep_final = jnp.where(do, keep_mask, True)
    out_img = images * keep_final[..., None].astype(images.dtype)
    out_lbl = jnp.where(keep_final, labels, ignore_index).astype(labels.dtype)
    return out_img, out_lbl


def normalize(x: jax.Array, mean: Sequence[float], std: Sequence[float]) -> jax.Array:
    m = jnp.asarray(mean, dtype=x.dtype)
    s = jnp.asarray(std, dtype=x.dtype)
    return (x - m) / s


# ---------------------------------------------------------------------------
# Assembled pipelines
# ---------------------------------------------------------------------------


def diffusion_train_augment(
    key: jax.Array, images_u8: jax.Array, crop: int = 128
) -> jax.Array:
    """The reference's diffusion train transform chain (train_ddpm.py:150-159):
    [host resize already done] -> RandomCrop -> RandomHorizontalFlip ->
    [0,1] -> [-1,1]. Batched, jittable."""
    kc, kf = jax.random.split(key)
    x = to_float(images_u8)
    x = random_crop(kc, x, (crop, crop))
    x = random_hflip(kf, x, 0.5)
    return to_diffusion_range(x)


def seg_train_augment(
    key: jax.Array,
    images_u8: jax.Array,
    labels: jax.Array,
    crop: tuple[int, int] = (256, 256),
    hflip_p: float = 0.5,
    jitter: tuple[float, float, float] = (0.2, 0.2, 0.2),
    noise_mean: float = 0.1,
    noise_std_range: tuple[float, float] = (0.0, 0.05),
    masking_p: float = 0.1,
    num_classes_to_keep: int = 1,
    mean: Sequence[float] = (0.485, 0.456, 0.406),
    std: Sequence[float] = (0.229, 0.224, 0.225),
):
    """The seg ExtCompose train chain (seg config.yaml transform section +
    train.py:289-309): crop, hflip, color jitter, gaussian noise, class-wise
    masking, ImageNet normalize. Returns (images, labels)."""
    kc, kf, kj, kn, km = jax.random.split(key, 5)
    x = to_float(images_u8)
    x, y = random_crop(kc, x, crop, labels=labels)
    x, y = random_hflip(kf, x, hflip_p, labels=y)
    x = color_jitter(kj, x, *jitter)
    x = add_gaussian_noise(kn, x, noise_mean, noise_std_range)
    x, y = class_wise_masking(km, x, y, masking_p, num_classes_to_keep)
    return normalize(x, mean, std), y


def seg_eval_preprocess(
    images_u8: jax.Array,
    labels: Optional[jax.Array] = None,
    crop: tuple[int, int] = (256, 256),
    mean: Sequence[float] = (0.485, 0.456, 0.406),
    std: Sequence[float] = (0.229, 0.224, 0.225),
):
    """Deterministic center-crop + normalize (reference val transform and
    inference.py preprocess: ExtResize -> ExtCenterCrop -> Normalize)."""
    h, w = images_u8.shape[1], images_u8.shape[2]
    th, tw = crop
    y0, x0 = (h - th) // 2, (w - tw) // 2
    x = to_float(images_u8[:, y0 : y0 + th, x0 : x0 + tw, :])
    x = normalize(x, mean, std)
    if labels is None:
        return x
    return x, labels[:, y0 : y0 + th, x0 : x0 + tw]
