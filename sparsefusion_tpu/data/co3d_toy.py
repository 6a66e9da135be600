"""co3d_toy dataset: the reference's preprocessed per-category pickle.

Mirrors ``utils/co3d_toy_dataloader.py:9-30``: ``{root}/{cat}/{cat}_toy.pt``
holds ``{category: [scene_dict, ...]}`` where each scene dict follows the
README contract.  torch (CPU) is used only to deserialize; everything is
converted to numpy/NHWC immediately.
"""
from __future__ import annotations

import os
from typing import List

from sparsefusion_tpu.data.contract import SceneData


class CO3DToyDataset:
    def __init__(self, root: str, category: str):
        self.root = root
        self.category = category
        path = os.path.join(root, category, f"{category}_toy.pt")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"toy dataset not found at {path}; download per the "
                f"reference README or use the synthetic dataset")
        import torch  # deserialization only

        dataset = torch.load(path, map_location="cpu", weights_only=False)
        self.seq_list: List = dataset[category]

    def __len__(self) -> int:
        return len(self.seq_list)

    def __getitem__(self, index: int) -> SceneData:
        return SceneData.from_reference_dict(
            self.seq_list[index],
            sequence_name=f"{self.category}_{index:03d}")
