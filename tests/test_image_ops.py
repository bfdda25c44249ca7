"""Device-side CLIP preprocessing vs the PIL reference transform.

The reference preprocesses with clip.load's torchvision pipeline
(Resize(224, bicubic, shorter side) -> CenterCrop(224) -> ToTensor ->
Normalize; dataset/VQAFeatureDataset.py:25,41). torchvision is not in this
image, so the oracle is PIL's antialiased bicubic resize — which is what
torchvision's Resize wraps for PIL inputs — plus numpy crop/normalize.
jax.image.resize(antialias=True) is a close but not bit-identical
resampler; tolerance reflects that (the model is robust to it — both are
valid antialiased bicubic filters).
"""

import numpy as np
import pytest
from PIL import Image

from multimodalpromptretrieval_tpu.models.clip import IMAGE_MEAN, IMAGE_STD
from multimodalpromptretrieval_tpu.ops.image import (
    clip_preprocess,
    preprocess_pil_images,
)


def _pil_reference(arr: np.ndarray, size: int) -> np.ndarray:
    im = Image.fromarray(arr)
    w, h = im.size
    # torchvision truncates the long side: int(), not round
    if h <= w:
        nh, nw = size, max(size, int(size * w / h))
    else:
        nw, nh = size, max(size, int(size * h / w))
    im = im.resize((nw, nh), Image.BICUBIC)
    left = (nw - size) // 2
    top = (nh - size) // 2
    im = im.crop((left, top, left + size, top + size))
    x = np.asarray(im, np.float32) / 255.0
    x = (x - np.asarray(IMAGE_MEAN)) / np.asarray(IMAGE_STD)
    return np.transpose(x, (2, 0, 1))


@pytest.mark.parametrize("shape", [(64, 64), (96, 64), (64, 96),
                                   (70, 96)])  # 48*96/70=65.83: int != round
def test_preprocess_close_to_pil(shape):
    rng = np.random.default_rng(0)
    size = 48
    arr = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    # smooth it so resampler differences aren't amplified by noise
    arr = np.asarray(Image.fromarray(arr).resize(shape[::-1], Image.BICUBIC))
    ref = _pil_reference(arr, size)
    import jax.numpy as jnp

    got = np.asarray(clip_preprocess(jnp.asarray(arr[None]), size=size))[0]
    assert got.shape == ref.shape == (3, size, size)
    # mean abs difference in normalized units; both are antialiased bicubic
    assert np.abs(got - ref).mean() < 0.05
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.99


def test_preprocess_same_size_is_normalize_only():
    """When input already equals the target size, the op must be exactly
    scale+normalize (no resampling error)."""
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    import jax.numpy as jnp

    got = np.asarray(clip_preprocess(jnp.asarray(arr[None]), size=32))[0]
    x = arr.astype(np.float32) / 255.0
    ref = np.transpose(
        (x - np.asarray(IMAGE_MEAN)) / np.asarray(IMAGE_STD), (2, 0, 1))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_preprocess_pil_images_groups_and_orders():
    """Mixed resolutions come back in input order at the target size."""
    rng = np.random.default_rng(2)
    images = [
        Image.fromarray(rng.integers(0, 256, size=(h, w, 3),
                                     dtype=np.uint8))
        for h, w in [(40, 40), (64, 48), (40, 40), (48, 64)]
    ]
    out = preprocess_pil_images(images, size=32)
    assert len(out) == 4
    for o in out:
        assert o.shape == (3, 32, 32)
    # identical inputs -> identical outputs regardless of grouping
    a = np.asarray(images[0])
    images2 = [Image.fromarray(a), Image.fromarray(a)]
    o2 = preprocess_pil_images(images2, size=32)
    np.testing.assert_array_equal(o2[0], o2[1])


def test_grayscale_converted():
    im = Image.fromarray(
        np.random.default_rng(3).integers(0, 256, size=(40, 40),
                                          dtype=np.uint8), mode="L")
    out = preprocess_pil_images([im], size=32)
    assert out[0].shape == (3, 32, 32)
