"""Dataset index (IMDB) base: naming + pickle cache bookkeeping.
Reference: human_utils/dataset/imdb.py:104-135.
"""

from __future__ import annotations

import os


class IMDB:
    def __init__(self, benchmark_name, image_set_name, dataset_path,
                 patch_width, patch_height, cache_path_root, extra_param):
        self.benchmark_name = benchmark_name
        self.image_set_name = image_set_name
        self.dataset_path = dataset_path
        self.patch_width = patch_width
        self.patch_height = patch_height
        self.cache_path_root = cache_path_root
        self.num_images = 0
        self.name = (
            f"{benchmark_name}_{image_set_name}"
            f"_w{patch_width}xh{patch_height}{extra_param}"
        )

    @property
    def cache_path(self) -> str:
        path = os.path.join(self.cache_path_root, f"{self.name}_cache")
        os.makedirs(path, exist_ok=True)
        return path

    def gt_db(self):
        raise NotImplementedError
