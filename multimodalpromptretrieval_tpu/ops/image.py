"""Device-side CLIP image preprocessing.

The reference preprocesses with torchvision/PIL on the host
(dataset/VQAFeatureDataset.py:25,41: ``clip.load``'s transform = Resize(224,
bicubic, shorter side) -> CenterCrop(224) -> ToTensor -> Normalize). Per the
BASELINE north star this moves onto the device as jax.image kernels:

  * ``clip_preprocess``       — one static-shape jit per unique input
    resolution (images are grouped by shape by the cache builder; this runs
    once per unique image, it is not on the serving hot path);
  * bicubic resize with antialiasing (jax.image.resize matches PIL's
    antialiased bicubic closely; parity is validated against torch in
    tests/test_image_ops.py within fp32 tolerance);
  * center crop + CLIP channel normalization fused into the same jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from multimodalpromptretrieval_tpu.models.clip import IMAGE_MEAN, IMAGE_STD


@functools.partial(jax.jit, static_argnames=("size",))
def clip_preprocess(images: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """(N, H, W, 3) uint8/float -> (N, 3, size, size) float32 normalized.

    torchvision semantics: scale the shorter side to ``size`` (bicubic,
    antialiased), center-crop ``size``², scale to [0,1], normalize with
    CLIP's mean/std.
    """
    n, h, w, _ = images.shape
    x = images.astype(jnp.float32) / 255.0
    # torchvision truncates the long side (int(), not round —
    # _compute_resized_output_size); a 1-px difference would shift the
    # center crop and change the CLIP embedding vs the reference cache
    if h <= w:
        nh = size
        nw = max(size, int(size * w / h))
    else:
        nw = size
        nh = max(size, int(size * h / w))
    x = jax.image.resize(x, (n, nh, nw, 3), method="bicubic", antialias=True)
    top = (nh - size) // 2
    left = (nw - size) // 2
    x = jax.lax.dynamic_slice(x, (0, top, left, 0), (n, size, size, 3))
    x = jnp.clip(x, 0.0, 1.0)
    mean = jnp.asarray(IMAGE_MEAN, jnp.float32)
    std = jnp.asarray(IMAGE_STD, jnp.float32)
    x = (x - mean) / std
    return jnp.transpose(x, (0, 3, 1, 2))


def preprocess_pil_images(pil_images, size: int = 224, batch: int = 64):
    """Group PIL images by resolution and preprocess each group on device.

    Returns a list of (N, 3, size, size) float32 numpy arrays in input order.
    """
    import numpy as np

    arrays = []
    for im in pil_images:
        if im.mode != "RGB":
            im = im.convert("RGB")
        arrays.append(np.asarray(im, np.uint8))
    groups = {}
    for i, a in enumerate(arrays):
        groups.setdefault(a.shape, []).append(i)
    out = [None] * len(arrays)
    for shape, idxs in groups.items():
        for s in range(0, len(idxs), batch):
            chunk = idxs[s:s + batch]
            stacked = np.stack([arrays[i] for i in chunk])
            res = np.asarray(clip_preprocess(jnp.asarray(stacked), size=size))
            for j, i in enumerate(chunk):
                out[i] = res[j]
    return out
