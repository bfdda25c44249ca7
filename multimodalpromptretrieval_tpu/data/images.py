"""Preprocessed-image cache (the analogue of ``images_{split}.pkl``).

The reference PIL-opens and torchvision-preprocesses every unique image once
and pickles the tensor dict (dataset/VQAFeatureDataset.py:27-47). Here the
preprocessing runs on device (ops/image.py) and the result is stored as a
compressed npz keyed by image name.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import numpy as np


class ImageCache:
    def __init__(self, arrays: Dict[str, np.ndarray]):
        self.arrays = arrays

    def __getitem__(self, name: str) -> np.ndarray:
        return self.arrays[name]

    def __contains__(self, name: str) -> bool:
        return name in self.arrays

    def __len__(self) -> int:
        return len(self.arrays)

    def update(self, other: "ImageCache") -> None:
        self.arrays.update(other.arrays)

    def batch(self, names: Sequence[str]) -> np.ndarray:
        return np.stack([self.arrays[n] for n in names])

    @staticmethod
    def build(dataroot: str, entries: List[dict], split: str,
              size: int = 224, subdir: str = "imgs",
              cache_dir: str | None = None) -> "ImageCache":
        """Load-or-build ``images_{split}.npz`` for the unique images in
        ``entries`` (same dedup behavior as the reference)."""
        from PIL import Image

        from multimodalpromptretrieval_tpu.ops.image import (
            preprocess_pil_images,
        )

        cache_dir = cache_dir or dataroot
        path = os.path.join(cache_dir, f"images_{split}.npz")
        if os.path.exists(path):
            with np.load(path) as z:
                return ImageCache({k: z[k] for k in z.files})
        names: List[str] = []
        for e in entries:
            if e["image_name"] not in names:
                names.append(e["image_name"])
        # preserve first-seen order; dedup via set for speed
        seen = set()
        names = [n for n in names if not (n in seen or seen.add(n))]
        pil = [Image.open(os.path.join(dataroot, subdir, n)) for n in names]
        arrays = preprocess_pil_images(pil, size=size)
        for im in pil:
            im.close()
        cache = ImageCache(dict(zip(names, arrays)))
        os.makedirs(cache_dir, exist_ok=True)
        np.savez_compressed(path, **cache.arrays)
        return cache
