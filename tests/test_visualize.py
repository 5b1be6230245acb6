"""Visualizer smoke test on the fixture dataset."""
import os

import pytest

from toist_tpu.config import Config
from toist_tpu.data.fixtures import generate_fixture
from toist_tpu.visualize import visualize


@pytest.mark.slow
def test_visualize_fixture(tmp_path):
    root = generate_fixture(str(tmp_path / "data"), num_tasks=1,
                            imgs_per_split=2, img_size=(96, 128), seed=3)
    cfg = Config.from_sources(None, {
        "model": {"backbone": "resnet18-test", "hidden_dim": 128, "nheads": 8,
                  "dim_feedforward": 128, "enc_layers": 1, "dec_layers": 1,
                  "num_queries": 8, "compute_dtype": "float32",
                  "contrastive_align_loss": False, "mask_model": "smallconv",
                  "backbone_norm": "group_norm", "text_hidden": 64,
                  "text_layers": 1, "text_heads": 4, "text_intermediate": 128},
        "data": {"coco_path": root, "refexp_ann_path": root + "/annotations",
                 "tasks": [1], "image_buckets": [[128, 128]],
                 "max_text_len": 48, "max_boxes": 8,
                 "train_scales": [96], "max_size": 128, "val_size": 96},
        "optim": {"ema": False},
        "run": {"seed": 0, "mesh_shape": [1]},
    })
    out_dir = str(tmp_path / "vis")
    # Random weights: threshold 0 so some boxes draw regardless.
    n = visualize(cfg, out_dir, score_threshold=0.0, max_images=2)
    assert n == 2
    files = os.listdir(out_dir)
    assert len(files) == 2 and all(f.endswith(".png") for f in files)
    # Rendered side-by-side image is twice the original width.
    import cv2
    img = cv2.imread(os.path.join(out_dir, files[0]))
    assert img.shape[1] == 2 * 128 and img.shape[0] == 96
