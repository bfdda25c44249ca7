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
        # the resolution is part of the cache key: the reference's
        # images_{split}.pkl is keyed by split only, but its resolution is
        # fixed at 224 — here clip_overrides.image_resolution makes it a
        # config knob, so a shared filename would silently serve arrays of
        # the wrong grid size to a later run
        path = os.path.join(cache_dir, f"images_{split}_{size}.npz")
        arrays: Dict[str, np.ndarray] = {}
        if os.path.exists(path):
            with np.load(path) as z:
                arrays = {k: z[k] for k in z.files}
            if arrays and next(iter(arrays.values())).shape[-1] != size:
                arrays = {}  # stale wire format — rebuild everything
        # preserve first-seen order; dedup via set
        seen = set()
        names = [e["image_name"] for e in entries
                 if not (e["image_name"] in seen
                         or seen.add(e["image_name"]))]
        # a cache written by a filtered run (train_subset / fewshot) may
        # not cover this run's entry set: build only what's missing and
        # extend the file instead of KeyError-ing mid-training
        missing = [n for n in names if n not in arrays]
        if missing:
            # threaded decode — the counterpart of the reference's
            # DataLoader(num_workers=2) host parallelism (main.py:94-96);
            # PIL decode releases the GIL, so threads scale
            from concurrent.futures import ThreadPoolExecutor

            def load(n):
                with Image.open(os.path.join(dataroot, subdir, n)) as im:
                    if im.mode != "RGB":
                        im = im.convert("RGB")
                    return im.copy()

            with ThreadPoolExecutor(max_workers=8) as pool:
                pil = list(pool.map(load, missing))
            arrays.update(zip(missing, preprocess_pil_images(pil,
                                                             size=size)))
            os.makedirs(cache_dir, exist_ok=True)
            np.savez_compressed(path, **arrays)
        return ImageCache({n: arrays[n] for n in names})
