"""Image-folder dataset: recursive scan + robust decode.

Capabilities mirrored from the reference Dataset (/root/reference/data/
dataset.py): recursive os.walk collecting .png/.jpg/.jpeg (:11-14), RGB decode
(:22-26), and decode-error fallback to a *random substitute image* (:28-30) —
kept as the failure-detection mechanism SURVEY.md §5.3 identifies.

Decoding runs on the host; items come back as uint8 HWC at a fixed (h, w) so
batches stack into static shapes (jit requirement). Normalization to network
space happens vectorized at batch level in the pipeline.
"""

from __future__ import annotations

import os
import random
from typing import List, Tuple

import numpy as np

from fast_neural_style_transfer_tpu.utils.image_io import decode_image, resize_image

IMAGE_EXTENSIONS = (".png", ".jpg", ".jpeg")


def scan_image_files(root: str) -> List[str]:
    files: List[str] = []
    for dirpath, dirnames, filenames in os.walk(root):
        # sort the traversal itself, not just filenames: multi-host SPMD
        # requires every process to derive the identical index->file mapping,
        # and os.walk's directory order is filesystem-dependent
        dirnames.sort()
        for fn in sorted(filenames):
            if fn.lower().endswith(IMAGE_EXTENSIONS):
                files.append(os.path.join(dirpath, fn))
    return files


class ImageFolderDataset:
    def __init__(self, root: str, image_size: Tuple[int, int] = (256, 256), seed: int = 0):
        self.root = root
        self.image_size = image_size
        self.files = scan_image_files(root)
        self.seed = seed
        if not self.files:
            raise FileNotFoundError(f"no images ({'/'.join(IMAGE_EXTENSIONS)}) under {root}")
        print(f"dataset: {len(self.files)} images under {root}", flush=True)

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> np.ndarray:
        """uint8 (h, w, 3); on decode error retry a random other image
        (bounded, unlike the reference's unbounded recursion).

        The substitute draw is seeded by (dataset seed, failing index) —
        NOT the shared instance RNG — so concurrent decode threads (the
        InputPipeline pool) can't make substitution depend on scheduler
        order: same seed, same corrupt file -> same substitute, every run."""
        sub_rng = None
        for attempt in range(16):
            try:
                img = decode_image(self.files[idx])
                return resize_image(img, self.image_size)
            except Exception as e:  # corrupt file — substitute another
                print(f"decode failed for {self.files[idx]}: {e}; substituting", flush=True)
                if sub_rng is None:
                    sub_rng = random.Random(f"{self.seed}:{idx}")
                idx = sub_rng.randrange(len(self.files))
        raise RuntimeError("16 consecutive image decode failures — dataset unusable")
