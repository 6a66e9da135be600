"""Native CO3Dv2 loader tests against a synthesized on-disk fixture."""
import gzip
import json
import os

import numpy as np
import pytest

from sparsefusion_tpu.data.co3d import (
    CO3Dv2Dataset,
    clamp_bbox_to_image,
    co3d_camera_to_ndc,
    crop_around_box,
    get_bbox_from_mask,
    get_clamp_bbox_xyxy,
    resize_topleft,
)


def write_fixture(root, category="hydrant", n_seq=2, n_frames=24,
                  hw=(60, 80)):
    from PIL import Image

    rng = np.random.RandomState(0)
    frames = []
    os.makedirs(f"{root}/{category}/set_lists", exist_ok=True)
    set_lists = {"train": [], "val": [], "test": []}
    for s in range(n_seq):
        seq = f"seq_{s:03d}"
        for fi in range(n_frames):
            img_rel = f"{category}/{seq}/images/frame{fi:03d}.jpg"
            mask_rel = f"{category}/{seq}/masks/frame{fi:03d}.png"
            os.makedirs(os.path.dirname(f"{root}/{img_rel}"), exist_ok=True)
            os.makedirs(os.path.dirname(f"{root}/{mask_rel}"), exist_ok=True)
            img = (rng.rand(*hw, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(f"{root}/{img_rel}")
            mask = np.zeros(hw, np.uint8)
            mask[20:40, 30:60] = 255
            Image.fromarray(mask, mode="L").save(f"{root}/{mask_rel}")
            frames.append({
                "sequence_name": seq,
                "frame_number": fi,
                "frame_timestamp": float(fi) * 0.1,
                "image": {"path": img_rel, "size": list(hw)},
                "mask": {"path": mask_rel, "mass": int(mask.sum() / 255)},
                "viewpoint": {
                    "R": np.eye(3).tolist(),
                    "T": [0.0, 0.0, 3.0 + 0.1 * fi],
                    "focal_length": [2.0, 2.0],
                    "principal_point": [0.0, 0.0],
                    "intrinsics_format": "ndc_norm_image_bounds",
                },
            })
            stage = "train" if fi % 2 == 0 else "test"
            set_lists[stage].append([seq, fi, img_rel])
    with gzip.open(f"{root}/{category}/frame_annotations.jgz", "wt") as f:
        json.dump(frames, f)
    seqs = [{"sequence_name": f"seq_{s:03d}", "category": category,
             "viewpoint_quality_score": 1.0, "point_cloud": None}
            for s in range(n_seq)]
    with gzip.open(f"{root}/{category}/sequence_annotations.jgz", "wt") as f:
        json.dump(seqs, f)
    with open(f"{root}/{category}/set_lists/set_lists_fewview_train.json",
              "w") as f:
        json.dump(set_lists, f)


def test_bbox_helpers():
    mask = np.zeros((20, 30), np.float32)
    mask[5:10, 8:20] = 1.0
    bbox = get_bbox_from_mask(mask, 0.4)
    np.testing.assert_array_equal(bbox, [8, 5, 12, 5])
    xyxy = get_clamp_bbox_xyxy(bbox, 0.0)
    np.testing.assert_allclose(xyxy, [8, 5, 20, 10])
    # context expansion
    xyxy_c = get_clamp_bbox_xyxy(bbox, 0.3)
    assert xyxy_c[0] < 8 and xyxy_c[2] > 20
    clamped = clamp_bbox_to_image(np.array([-5.0, -2.0, 35.0, 25.0]),
                                  (20, 30))
    np.testing.assert_array_equal(clamped, [0, 0, 30, 20])
    img = np.arange(20 * 30, dtype=np.float32).reshape(1, 20, 30)
    crop = crop_around_box(img, np.array([8, 5, 20, 10]))
    assert crop.shape == (1, 5, 12)
    assert crop[0, 0, 0] == img[0, 5, 8]


def test_resize_topleft_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    img = rng.rand(3, 37, 61).astype(np.float32)
    out, scale, mask = resize_topleft(img, (64, 64), "bilinear")
    minscale = min(64 / 37, 64 / 61)
    t = F.interpolate(torch.from_numpy(img)[None], scale_factor=minscale,
                      mode="bilinear", align_corners=False,
                      recompute_scale_factor=True)[0].numpy()
    nh, nw = t.shape[-2:]
    np.testing.assert_allclose(out[:, :nh, :nw], t, atol=1e-5)
    assert np.all(out[:, nh:, :] == 0) and np.all(out[:, :, nw:] == 0)
    assert mask[0, nh - 1, nw - 1] == 1 and mask[0, nh, 0] == 0


def test_camera_conversion_identity_case():
    # square image, no crop, no resize: NDC values unchanged
    vp = {"R": np.eye(3).tolist(), "T": [0, 0, 3.0],
          "focal_length": [2.0, 2.5], "principal_point": [0.1, -0.2],
          "intrinsics_format": "ndc_norm_image_bounds"}
    R, T, f, c = co3d_camera_to_ndc(vp, (256, 256), None, 1.0, (256, 256))
    np.testing.assert_allclose(f, [2.0, 2.5], atol=1e-6)
    np.testing.assert_allclose(c, [0.1, -0.2], atol=1e-6)


def test_dataset_end_to_end(tmp_path):
    write_fixture(str(tmp_path))
    ds = CO3Dv2Dataset(str(tmp_path), "hydrant", subset="fewview_train",
                       stage="train", sample_batch_size=5, image_size=64)
    assert len(ds) == 2  # both sequences retained (12 train frames > 10)
    scene = ds[0]
    assert scene.images.shape == (5, 64, 64, 3)
    assert scene.masks.shape == (5, 64, 64, 1)
    assert scene.valid_region.shape == (5, 64, 64, 1)
    assert scene.R.shape == (5, 3, 3)
    assert np.all(np.isfinite(scene.f)) and np.all(scene.f > 0)
    # masked images: background is zero where fg mask is zero
    bg = scene.images * (1 - scene.masks)
    assert np.abs(bg).max() < 1e-6
    # reference dict contract roundtrip
    d = scene.to_reference_dict()
    assert d["images"].shape == (5, 3, 64, 64)
