"""Build a deterministic co3d_toy-format fixture from synthetic scenes.

The reference distributes preprocessed pickles ``{root}/{cat}/{cat}_toy.pt``
holding ``{category: [scene_dict, ...]}`` with torch tensors following the
README.md:111-122 dict contract (``utils/co3d_toy_dataloader.py:9-30``).
When the real CO3D download is unavailable, this tool writes the same
format from the framework's procedural blob scenes, so that:

* the parity sweep (``tools/parity_sweep.py``) is runnable anywhere, and
* the *reference* implementation can load the identical fixture — making
  a true side-by-side comparison one download away (point its ``-r`` at
  the directory this tool wrote).

Usage:
    python tools/make_toy_fixture.py --root /tmp/toy_fixture \
        --categories hydrant teddybear --scenes 2 --views 10 --size 256
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--categories", nargs="+", default=["hydrant"])
    p.add_argument("--scenes", type=int, default=2)
    p.add_argument("--views", type=int, default=10)
    p.add_argument("--size", type=int, default=256,
                   help="image size (reference uses 256)")
    args = p.parse_args()

    import numpy as np
    import torch

    from sparsefusion_tpu.data.synthetic import make_synthetic_scene

    for cat_i, cat in enumerate(args.categories):
        scenes = []
        for si in range(args.scenes):
            # distinct deterministic seed per (category, scene)
            seed = 1000 * cat_i + si
            scene = make_synthetic_scene(
                n_views=args.views, image_size=args.size, seed=seed)
            d = scene.to_reference_dict()
            scenes.append({k: torch.from_numpy(np.ascontiguousarray(v).copy())
                           for k, v in d.items()})
        out_dir = os.path.join(args.root, cat)
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"{cat}_toy.pt")
        torch.save({cat: scenes}, path)
        print(f"wrote {path}: {len(scenes)} scenes x {args.views} views "
              f"@ {args.size}px")


if __name__ == "__main__":
    main()
