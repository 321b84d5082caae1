"""Augmentation op library.

Counterpart of reference ``utils/ops.py:5-121`` (Cutout + the AutoAugment-style
PIL op set; note the reference never wires these into any transform pipeline —
they are provided here as a usable library, selectable via config
``extras['augment_ops']`` on the train pipeline).

Two tiers:
* PIL ops (host-side, per-sample) matching the reference op semantics;
* :func:`cutout_batch` — a vectorized device-side Cutout over whole batches.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageOps


FILL = (128, 128, 128)  # the reference's gray fillcolor (utils/ops.py:34 etc.)


def cutout(img: Image.Image, length: int, rng: np.random.Generator) -> Image.Image:
    """Zero a random length² square around a uniform center, clamped at borders
    (reference ``Cutout.__call__``: side = 2·(length//2), utils/ops.py:10-30)."""
    arr = np.asarray(img).copy()
    h, w = arr.shape[:2]
    y, x = int(rng.integers(h)), int(rng.integers(w))
    y1, y2 = np.clip(y - length // 2, 0, h), np.clip(y + length // 2, 0, h)
    x1, x2 = np.clip(x - length // 2, 0, w), np.clip(x + length // 2, 0, w)
    arr[y1:y2, x1:x2] = 0
    return Image.fromarray(arr)


def shear_x(img, v):  # v in [-0.3, 0.3] (signed; ref randomizes the sign)
    return img.transform(img.size, Image.AFFINE, (1, v, 0, 0, 1, 0),
                         Image.BICUBIC, fillcolor=FILL)


def shear_y(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, v, 1, 0),
                         Image.BICUBIC, fillcolor=FILL)


def translate_x(img, v):  # v: signed fraction of width
    return img.transform(img.size, Image.AFFINE, (1, 0, v * img.size[0], 0, 1, 0),
                         fillcolor=FILL)


def translate_y(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, v * img.size[1]),
                         fillcolor=FILL)


def rotate(img, v):  # degrees; composite onto gray like the reference (:73-76)
    rot = img.convert("RGBA").rotate(v)
    return Image.composite(rot, Image.new("RGBA", rot.size, (128,) * 4), rot).convert(img.mode)


def color(img, v):
    return ImageEnhance.Color(img).enhance(v)


def posterize(img, v):
    return ImageOps.posterize(img, max(1, int(v)))


def solarize(img, v):
    return ImageOps.solarize(img, int(v))


def contrast(img, v):
    return ImageEnhance.Contrast(img).enhance(v)


def sharpness(img, v):
    return ImageEnhance.Sharpness(img).enhance(v)


def brightness(img, v):
    return ImageEnhance.Brightness(img).enhance(v)


def auto_contrast(img, _v=None):
    return ImageOps.autocontrast(img)


def equalize(img, _v=None):
    return ImageOps.equalize(img)


def invert(img, _v=None):
    return ImageOps.invert(img)


# op name -> (fn, value range)
AUGMENT_OPS: Dict[str, Tuple[Callable, Optional[Tuple[float, float]]]] = {
    "shear_x": (shear_x, (-0.3, 0.3)),
    "shear_y": (shear_y, (-0.3, 0.3)),
    "translate_x": (translate_x, (-0.45, 0.45)),
    "translate_y": (translate_y, (-0.45, 0.45)),
    "rotate": (rotate, (-30.0, 30.0)),
    "color": (color, (0.1, 1.9)),
    "posterize": (posterize, (4, 8)),
    "solarize": (solarize, (0, 256)),
    "contrast": (contrast, (0.1, 1.9)),
    "sharpness": (sharpness, (0.1, 1.9)),
    "brightness": (brightness, (0.1, 1.9)),
    "auto_contrast": (auto_contrast, None),
    "equalize": (equalize, None),
    "invert": (invert, None),
}


def random_augment(img: Image.Image, rng: np.random.Generator,
                   ops: Optional[Sequence[str]] = None, n: int = 2) -> Image.Image:
    """Apply ``n`` randomly chosen ops with random magnitudes (RandAugment-style
    driver over the reference op set)."""
    names: List[str] = list(ops or AUGMENT_OPS.keys())
    for name in rng.choice(names, size=n, replace=False):
        fn, rng_range = AUGMENT_OPS[name]
        if rng_range is None:
            img = fn(img)
        else:
            lo, hi = rng_range
            img = fn(img, float(rng.uniform(lo, hi)))
    return img


def cutout_batch(images, lengths, seed: int = 0):
    """Vectorized device-side Cutout on ``[B, H, W, C]`` float batches."""
    import jax
    import jax.numpy as jnp

    b, h, w, _ = images.shape
    key = jax.random.PRNGKey(seed)
    ky, kx = jax.random.split(key)
    ys = jax.random.randint(ky, (b,), 0, h)
    xs = jax.random.randint(kx, (b,), 0, w)
    row = jnp.arange(h)[None, :, None]
    col = jnp.arange(w)[None, None, :]
    l = jnp.asarray(lengths).reshape(-1, 1, 1) // 2  # side = length (ref Cutout)
    mask = ((row >= ys[:, None, None] - l) & (row < ys[:, None, None] + l)
            & (col >= xs[:, None, None] - l) & (col < xs[:, None, None] + l))
    return jnp.where(mask[..., None], 0.0, images)
