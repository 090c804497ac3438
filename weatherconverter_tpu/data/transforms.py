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

# Classes the reference's ClassWiseMasking may keep. The reference masks in
# RAW labelId space BEFORE encode_target (acdc.py:157-163), with allowed raw
# ids {7,11,19,20,21,22,23,24,26,27,28,32,33} (ext_transforms.py:71). THIS
# pipeline's labels are already train-ids at transform time (datasets encode
# in __getitem__), so the set here is the train-id image of that raw set —
# the mapping is 1:1 (each of these raw ids is the unique raw id of its
# train class): road, building, traffic light, traffic sign, vegetation,
# terrain, sky, person, car, truck, bus, motorcycle, bicycle.
CLASSWISE_ALLOWED = (0, 2, 6, 7, 8, 9, 10, 11, 13, 14, 15, 17, 18)

# Fallback candidate pool: when fewer than `num_classes_to_keep` allowed
# classes are present, the reference samples from ALL classes present in the
# label (ext_transforms.py:75-77). In train-id space that pool is every
# train-id plus the 255 ignore bucket (all raw ids with trainId 255 collapse
# into one candidate here — a documented divergence, see PARITY.md: the raw
# pool weights 255 by its number of distinct raw ids present).
_CLASSWISE_CANDIDATES = tuple(range(19)) + (255,)


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
    if th > h or tw > w:
        raise ValueError(
            f"random_crop {size} exceeds image extent {(h, w)} — "
            "jax.random.randint with maxval<=minval is undefined and "
            "dynamic_slice would silently clamp; resize the source larger "
            "or pad first (torchvision RandomCrop raises here too)"
        )
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
    drawn from std_range, noise ~ N(mean, std) added in [0,1] space, clipped
    (the reference draws np.random.normal(mean, std) — the mean is an
    ADDITIVE brightness offset, not scaled by std)."""
    b = images.shape[0]
    ks, kn = jax.random.split(key)
    std = jax.random.uniform(
        ks, (b, 1, 1, 1), minval=std_range[0], maxval=std_range[1]
    )
    noise = jax.random.normal(kn, images.shape) * std + mean
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
    example, choose `num_classes_to_keep` uniformly (without replacement)
    from the allowed classes PRESENT in the label — falling back to ALL
    present classes when fewer than that many allowed ones are present
    (ext_transforms.py:75-77) — then black out all other pixels in the image
    and set their labels to ignore_index (the reference writes raw id 0
    'unlabeled', which encode_target maps to 255; labels here are already
    train-ids, so 255 directly — CLAUDE.md rule 5).

    Divergence from the reference when the label holds fewer total classes
    than `num_classes_to_keep`: random.sample raises ValueError there; this
    keeps every present class instead (the surplus slots match no pixels).
    """
    b = images.shape[0]
    kp, kc = jax.random.split(key)
    cand = jnp.asarray(_CLASSWISE_CANDIDATES, dtype=labels.dtype)  # (C,)
    is_allowed = jnp.isin(cand, jnp.asarray(allowed, dtype=labels.dtype))  # (C,)

    # presence (B, C): does candidate class c appear in example b's label?
    present = jnp.any(
        labels[:, None, :, :] == cand[None, :, None, None], axis=(2, 3)
    )
    allowed_present = present & is_allowed[None, :]
    fallback = jnp.sum(allowed_present, axis=1) < num_classes_to_keep  # (B,)
    pool = jnp.where(fallback[:, None], present, allowed_present)
    # the reference masks whenever random() < p regardless of which classes
    # are present (the fallback covers the no-allowed-class case)
    apply = jax.random.uniform(kp, (b,)) < p
    # Gumbel-top-k over the pool = uniform sample without replacement
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(kc, (b, cand.shape[0]), minval=1e-6, maxval=1.0)))
    scores = jnp.where(pool, gumbel, -jnp.inf)
    _, top_idx = jax.lax.top_k(scores, num_classes_to_keep)  # (B, K)
    # surplus -inf slots (pool smaller than K) resolve to ABSENT candidates:
    # every present id is in the pool whenever fallback is active, so a
    # tie-broken -inf pick can only name a class with zero pixels
    kept = cand[top_idx]  # (B, K)

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
    scale_range: Optional[tuple[float, float]] = None,
    rotation_degrees: float = 0.0,
    hue: float = 0.0,
):
    """The seg ExtCompose train chain (seg config.yaml transform section +
    train.py:289-309): [scale+]crop, [rotation,] hflip, color jitter [+hue],
    gaussian noise, class-wise masking, ImageNet normalize. The optional
    geometric legs mirror ExtRandomScale / ExtRandomRotation / ColorJitter
    hue (ext_transforms.py:184-207, :239-310, :545). Returns
    (images, labels)."""
    kc, kf, kj, kn, km, kr, kh = jax.random.split(key, 7)
    x = to_float(images_u8)
    if scale_range is not None:
        x, y = random_scale_crop(kc, x, crop, labels, scale_range=tuple(scale_range))
    else:
        x, y = random_crop(kc, x, crop, labels=labels)
    if rotation_degrees:
        x, y = random_rotation(kr, x, y, degrees=rotation_degrees)
    x, y = random_hflip(kf, x, hflip_p, labels=y)
    x = color_jitter(kj, x, *jitter)
    if hue:
        x = hue_jitter(kh, x, hue)
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


# ---------------------------------------------------------------------------
# Geometric paired transforms with resampling (round-2 additions; parity:
# ExtRandomScale ext_transforms.py:184-207, ExtRandomRotation :239-310,
# ExtPad :355-366). TPU adaptation: jit needs static shapes, so "resize to
# (H*s, W*s)" becomes coordinate-remapped sampling on a fixed canvas; the
# reference always follows RandomScale with a fixed-size RandomCrop anyway,
# which `random_scale_crop` fuses exactly.
# ---------------------------------------------------------------------------


def _paired_gather(images, labels, ys, xs, img_fill=0.0, lbl_fill=255):
    """Sample per-example float source coords (B,H',W'): bilinear for images,
    nearest for labels, out-of-bounds -> fill. The paired-label contract:
    identical geometry, never interpolated labels."""
    b, h, w = images.shape[0], images.shape[1], images.shape[2]

    def sample_one(img, lbl, y, x):
        valid = (y >= -0.5) & (y <= h - 0.5) & (x >= -0.5) & (x <= w - 0.5)
        # clamp-to-edge for the sub-pixel border band (PIL convention) —
        # without this, coords in (-0.5, 0) blend toward row/col 1
        y = jnp.clip(y, 0.0, h - 1.0)
        x = jnp.clip(x, 0.0, w - 1.0)
        y0 = jnp.floor(y)
        x0 = jnp.floor(x)
        wy = (y - y0)[..., None]
        wx = (x - x0)[..., None]
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
        y1i = jnp.clip(y0i + 1, 0, h - 1)
        x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
        x1i = jnp.clip(x0i + 1, 0, w - 1)
        v = (
            img[y0i, x0i] * (1 - wy) * (1 - wx)
            + img[y0i, x1i] * (1 - wy) * wx
            + img[y1i, x0i] * wy * (1 - wx)
            + img[y1i, x1i] * wy * wx
        )
        v = jnp.where(valid[..., None], v, jnp.asarray(img_fill, v.dtype))
        out_l = None
        if lbl is not None:
            yn = jnp.clip(jnp.round(y).astype(jnp.int32), 0, h - 1)
            xn = jnp.clip(jnp.round(x).astype(jnp.int32), 0, w - 1)
            out_l = jnp.where(valid, lbl[yn, xn], jnp.asarray(lbl_fill, lbl.dtype))
        return v, out_l

    if labels is None:
        out_i, _ = jax.vmap(lambda i, y, x: sample_one(i, None, y, x))(images, ys, xs)
        return out_i, None
    return jax.vmap(sample_one)(images, labels, ys, xs)


def random_scale_crop(
    key: jax.Array,
    images: jax.Array,
    size: tuple[int, int],
    labels: Optional[jax.Array] = None,
    scale_range: tuple[float, float] = (0.5, 2.0),
    img_fill: float = 0.0,
    lbl_fill: int = 255,
):
    """ExtRandomScale + ExtRandomCrop fused (reference ext_transforms.py:
    184-207 then 101-160): scale ~ U(scale_range), virtual resize to
    (H*s, W*s) (bilinear img / nearest lbl — :202), uniform crop of `size`
    from the scaled plane; regions past the scaled extent (crop bigger than
    the scaled image) take the fill, matching pad_if_needed."""
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    th, tw = size
    ks, ky, kx = jax.random.split(key, 3)
    s = jax.random.uniform(ks, (b,), minval=scale_range[0], maxval=scale_range[1])
    sh = jnp.floor(h * s)
    sw = jnp.floor(w * s)
    u_y = jax.random.uniform(ky, (b,))
    u_x = jax.random.uniform(kx, (b,))
    y0 = u_y * jnp.maximum(sh - th, 0.0)
    x0 = u_x * jnp.maximum(sw - tw, 0.0)
    ii = jnp.arange(th, dtype=jnp.float32)
    jj = jnp.arange(tw, dtype=jnp.float32)
    # half-pixel-center mapping from the virtual (H*s, W*s) plane back to the
    # source (PIL resize convention)
    ys = (y0[:, None] + ii[None, :] + 0.5) / s[:, None] - 0.5  # (B, th)
    xs = (x0[:, None] + jj[None, :] + 0.5) / s[:, None] - 0.5  # (B, tw)
    # mask crop pixels beyond the scaled extent (only when scaled < target)
    oob_y = (y0[:, None] + ii[None, :]) >= sh[:, None]
    oob_x = (x0[:, None] + jj[None, :]) >= sw[:, None]
    ys = jnp.where(oob_y, -1e6, ys)
    xs = jnp.where(oob_x, -1e6, xs)
    ys2 = jnp.broadcast_to(ys[:, :, None], (b, th, tw))
    xs2 = jnp.broadcast_to(xs[:, None, :], (b, th, tw))
    return _paired_gather(images, labels, ys2, xs2, img_fill, lbl_fill)


def random_rotation(
    key: jax.Array,
    images: jax.Array,
    labels: Optional[jax.Array] = None,
    degrees: float | tuple[float, float] = 10.0,
    img_fill: float = 0.0,
    lbl_fill: int = 255,
):
    """ExtRandomRotation (reference ext_transforms.py:239-310): angle ~
    U(degrees), rotation about the image center on the same canvas
    (expand=False), bilinear img / nearest lbl.

    lbl_fill note: PIL's F.rotate fills labels with 0 — but the reference
    rotates RAW labelIds where id 0 ('unlabeled') later encodes to 255
    ignore (acdc.py:135-138), while THIS pipeline's labels are already
    train-ids at augmentation time (datasets.py encodes in __getitem__),
    where 0 = 'road'. The reference-equivalent fill for train-id labels is
    therefore 255 (the default); pass lbl_fill=0 only when rotating raw
    labelIds."""
    lo, hi = (-degrees, degrees) if isinstance(degrees, (int, float)) else degrees
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    ang = jax.random.uniform(key, (b,), minval=lo, maxval=hi) * (jnp.pi / 180.0)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ii = jnp.arange(h, dtype=jnp.float32) - cy
    jj = jnp.arange(w, dtype=jnp.float32) - cx
    cos = jnp.cos(ang)[:, None, None]
    sin = jnp.sin(ang)[:, None, None]
    dy = ii[None, :, None]
    dx = jj[None, None, :]
    # inverse rotation (sample where the output pixel came from)
    ys = cos * dy + sin * dx + cy
    xs = -sin * dy + cos * dx + cx
    ys = jnp.broadcast_to(ys, (b, h, w))
    xs = jnp.broadcast_to(xs, (b, h, w))
    return _paired_gather(images, labels, ys, xs, img_fill, lbl_fill)


def pad_to_multiple(
    images: jax.Array,
    labels: Optional[jax.Array] = None,
    diviser: int = 32,
    img_fill: float = 0.0,
    lbl_fill: int = 255,
):
    """ExtPad (reference ext_transforms.py:355-366): centered zero-pad of
    both planes up to the next multiple of `diviser`. (The reference
    hardcodes 32 in the body regardless of its `diviser` argument; this one
    honors the argument.) lbl_fill defaults to the 255 ignore id: labels are
    train-ids at transform time in this pipeline (see random_rotation's
    note) and padding fabricated border pixels as class 0 ('road') would
    corrupt the CE loss."""
    h, w = images.shape[1], images.shape[2]
    ph = 0 if h % diviser == 0 else (h // diviser + 1) * diviser - h
    pw = 0 if w % diviser == 0 else (w // diviser + 1) * diviser - w
    pads = ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2))
    out_i = jnp.pad(images, pads + ((0, 0),), constant_values=img_fill)
    out_l = None
    if labels is not None:
        out_l = jnp.pad(labels, pads, constant_values=lbl_fill)
    return out_i, out_l


def _rgb_to_hsv(x):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    d = mx - mn
    safe = jnp.where(d == 0, 1.0, d)
    h = jnp.where(
        mx == r, ((g - b) / safe) % 6.0,
        jnp.where(mx == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0),
    )
    h = jnp.where(d == 0, 0.0, h) / 6.0
    s = jnp.where(mx == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx))
    return h, s, mx


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def hue_jitter(key: jax.Array, images: jax.Array, hue: float = 0.1) -> jax.Array:
    """torchvision adjust_hue with factor ~ U[-hue, hue] per example
    (the ColorJitter hue leg, reference ext_transforms.py:545-:600): shift
    the HSV hue channel cyclically, leave s/v untouched."""
    b = images.shape[0]
    f = jax.random.uniform(key, (b, 1, 1), minval=-hue, maxval=hue)
    h, s, v = _rgb_to_hsv(jnp.clip(images, 0.0, 1.0))
    return _hsv_to_rgb((h + f) % 1.0, s, v)


def apply_affine(
    images: jax.Array,
    labels: Optional[jax.Array] = None,
    *,
    angle: float = 0.0,
    translate: tuple[float, float] = (0.0, 0.0),
    scale: float = 1.0,
    shear: float = 0.0,
    img_fill: float = 0.0,
    lbl_fill: int = 255,
):
    """Deterministic affine about the image center (rotation degrees,
    translation as a fraction of H/W, isotropic scale, x-shear degrees) —
    torchvision RandomAffine's transform family (the reference's geometric
    augmentation gallery, visualizer.py:177-191). Bilinear images / nearest
    labels via the shared paired gather."""
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    th = angle * jnp.pi / 180.0
    sh = shear * jnp.pi / 180.0
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ty, tx = translate[0] * h, translate[1] * w
    # forward map: dst = S(scale) @ Shear @ R(theta) @ (src - c) + c + t
    # => src = R(-theta) @ Shear^{-1} @ (dst - c - t)/scale + c
    ii = jnp.arange(h, dtype=jnp.float32)[:, None] - cy - ty
    jj = jnp.arange(w, dtype=jnp.float32)[None, :] - cx - tx
    dy = jnp.broadcast_to(ii, (h, w)) / scale
    dx = jnp.broadcast_to(jj, (h, w)) / scale
    dx = dx - jnp.tan(sh) * dy  # inverse x-shear
    cos, sin = jnp.cos(th), jnp.sin(th)
    ys = cos * dy + sin * dx + cy
    xs = -sin * dy + cos * dx + cx
    ys = jnp.broadcast_to(ys[None], (b, h, w))
    xs = jnp.broadcast_to(xs[None], (b, h, w))
    return _paired_gather(images, labels, ys, xs, img_fill, lbl_fill)
