"""Parity sweep: per-scene PSNR/SSIM/LPIPS over (category, n_views) configs.

Mirrors BASELINE.json configs[2] (teddybear / laptop / toybus at 2/3/6
input views) against real ``co3d_toy`` pickles when available, or against
the deterministic synthetic fixture (``tools/make_toy_fixture.py``) so the
sweep runs anywhere.  Results land as a JSON file plus a markdown table
ready to paste into README.md — the side-by-side column for the torch
reference comes from running the reference ``demo.py`` on the same fixture
and pasting its ``metrics/{seq}.txt`` values.

Usage:
    python tools/parity_sweep.py --root /tmp/toy_fixture \
        --categories hydrant --views 2 3 6 --scenes 0 --max_itr 3000 \
        --out output/parity
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="data/co3d_toy")
    p.add_argument("--categories", nargs="+",
                   default=["teddybear", "laptop", "toybus"])
    p.add_argument("--views", nargs="+", type=int, default=[2, 3, 6])
    p.add_argument("--scenes", nargs="+", type=int, default=[0],
                   help="scene indices within each category")
    p.add_argument("--max_itr", type=int, default=3000)
    p.add_argument("--no_diffusion", action="store_true")
    p.add_argument("--preset", default="auto",
                   choices=["auto", "reference", "tpu"])
    p.add_argument("--lpips_weights", default=None)
    p.add_argument("--resnet18", default=None)
    p.add_argument("--eft", default=None)
    p.add_argument("--vae", default=None)
    p.add_argument("--vldm", default=None)
    p.add_argument("--out", default="output/parity")
    args = p.parse_args(argv)

    import jax

    from sparsefusion_tpu.cli.demo import select_input_views
    from sparsefusion_tpu.data.co3d_toy import CO3DToyDataset
    from sparsefusion_tpu.distill.loop import (
        DistillConfig,
        distillation_loop,
        tpu_distill_config,
    )
    from sparsefusion_tpu.models import build_models
    from sparsefusion_tpu.nn.lpips import build_lpips_fn
    from sparsefusion_tpu.train.checkpoints import (
        import_resnet18_trunk,
        maybe_import_reference_weights,
    )
    from sparsefusion_tpu.utils.runtime import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    os.makedirs(args.out, exist_ok=True)

    preset = args.preset
    if preset == "auto":
        preset = "tpu" if jax.default_backend() == "tpu" else "reference"

    models = build_models(jax.random.PRNGKey(0))
    models = maybe_import_reference_weights(
        models, args.eft, args.vae, args.vldm)
    if args.eft is None:
        models = import_resnet18_trunk(models, args.resnet18)
    lpips_fn = build_lpips_fn(args.lpips_weights)

    rows = []
    for cat in args.categories:
        try:
            dataset = CO3DToyDataset(args.root, cat)
        except FileNotFoundError as e:
            print(f"SKIP {cat}: {e}")
            continue
        for scene_idx in args.scenes:
            if scene_idx >= len(dataset):
                print(f"SKIP {cat}[{scene_idx}]: only {len(dataset)} scenes")
                continue
            for v in args.views:
                scene = dataset[scene_idx]
                input_idx = select_input_views(0, scene_idx, len(scene), v)
                seq = f"{cat}_{scene_idx:03d}_v{v}"
                scene.sequence_name = seq
                if preset == "tpu":
                    cfg = tpu_distill_config(max_itr=args.max_itr)
                else:
                    cfg = DistillConfig(max_itr=args.max_itr)
                res = distillation_loop(
                    models, scene, input_idx, cfg,
                    jax.random.PRNGKey(scene_idx), save_dir=args.out,
                    use_diffusion=not args.no_diffusion, lpips_fn=lpips_fn)
                row = {"category": cat, "scene": scene_idx, "views": v,
                       **res["metrics"]}
                rows.append(row)
                print("RESULT", json.dumps(row))

    with open(os.path.join(args.out, "parity_sweep.json"), "w") as fp:
        json.dump(rows, fp, indent=2)

    # markdown table
    cols = ["category", "scene", "views", "psnr", "ssim"]
    if rows and "lpips" in rows[0]:
        cols.append("lpips")
    lines = ["| " + " | ".join(cols) + " |",
             "|" + "---|" * len(cols)]
    for r in rows:
        lines.append("| " + " | ".join(
            f"{r[c]:.3f}" if isinstance(r[c], float) else str(r[c])
            for c in cols) + " |")
    table = "\n".join(lines)
    with open(os.path.join(args.out, "parity_sweep.md"), "w") as fp:
        fp.write(table + "\n")
    print(table)
    return rows


if __name__ == "__main__":
    main()
