"""Integration test: the full driver on the synthetic fixture dataset.

Covers SURVEY.md §7 phase 3's "minimum end-to-end slice": data pipeline -> model ->
train epochs -> checkpoint -> per-task eval producing AP numbers through the
from-scratch COCOEval.
"""
import json
import os

import numpy as np
import pytest

from toist_tpu.config import Config
from toist_tpu.data.fixtures import generate_fixture
from toist_tpu.main import main


@pytest.mark.slow
def test_train_and_eval_fixture(tmp_path):
    root = generate_fixture(str(tmp_path / "data"), num_tasks=2,
                            imgs_per_split=4, img_size=(96, 128), seed=1)
    out_dir = str(tmp_path / "out")
    cfg = Config.from_sources(None, {
        "model": {"backbone": "resnet18-test", "hidden_dim": 64, "nheads": 4,
                  "dim_feedforward": 128, "enc_layers": 2, "dec_layers": 2,
                  "num_queries": 12, "compute_dtype": "float32",
                  "contrastive_align_loss": False,
                  "backbone_norm": "group_norm", "text_hidden": 64,
                  "text_layers": 2, "text_heads": 4, "text_intermediate": 128},
        "data": {"coco_path": root, "refexp_ann_path": root + "/annotations",
                 "tasks": [1, 2], "image_buckets": [[128, 128]],
                 "max_text_len": 48, "max_boxes": 8,
                 "train_scales": [96], "max_size": 128, "val_size": 96},
        "optim": {"train_batch_size": 2, "valid_batch_size": 2, "epochs": 2,
                  "lr": 1e-3, "lr_backbone": 1e-3, "text_encoder_lr": 1e-3,
                  "ema": True, "eval_skip": 2},
        "run": {"output_dir": out_dir, "seed": 0, "mesh_shape": [1]},
    })
    best = main(cfg)
    # Training ran, checkpoints + logs exist, eval produced a number.
    assert os.path.isdir(os.path.join(out_dir, "checkpoint"))
    log = [json.loads(l) for l in open(os.path.join(out_dir, "log.jsonl"))]
    kinds = {r["kind"] for r in log}
    assert {"train_step", "epoch", "eval"} <= kinds
    evals = [r for r in log if r["kind"] == "eval"]
    assert evals and np.isfinite(evals[-1]["mean_ap50"])
    assert set(evals[-1]["per_task"].keys()) == {"1", "2"} or \
        set(evals[-1]["per_task"].keys()) == {1, 2}

    # Eval-only path restores from the checkpoint.
    cfg_eval = Config.from_sources(None, {
        **{k: v for k, v in cfg.to_dict().items() if k != "run"},
        "run": {"eval_only": True,
                "resume": os.path.join(out_dir, "checkpoint"),
                "seed": 0, "mesh_shape": [1]},
    })
    m = main(cfg_eval)
    assert np.isfinite(m)


@pytest.mark.slow
def test_segmentation_training_via_main(tmp_path):
    """Workload 3: seg training over a frozen detector warm-started from a
    detection checkpoint (--frozen_weights flow: merge_params keeps the fresh
    mask head), then mask eval through the segm COCOEval path."""
    root = generate_fixture(str(tmp_path / "data"), num_tasks=1,
                            imgs_per_split=3, img_size=(96, 128), seed=4)
    common_model = {
        "backbone": "resnet18-test", "hidden_dim": 128, "nheads": 8,
        "dim_feedforward": 128, "enc_layers": 1, "dec_layers": 1,
        "num_queries": 8, "compute_dtype": "float32",
        "contrastive_align_loss": False, "backbone_norm": "group_norm",
        "text_hidden": 64, "text_layers": 1, "text_heads": 4,
        "text_intermediate": 128,
    }
    common_data = {
        "coco_path": root, "refexp_ann_path": root + "/annotations",
        "tasks": [1], "image_buckets": [[128, 128]], "max_text_len": 48,
        "max_boxes": 8, "train_scales": [96], "max_size": 128, "val_size": 96,
    }
    det_out = str(tmp_path / "det")
    cfg_det = Config.from_sources(None, {
        "model": common_model, "data": common_data,
        "optim": {"train_batch_size": 2, "valid_batch_size": 2, "epochs": 1,
                  "ema": False, "eval_skip": 5},
        "run": {"output_dir": det_out, "seed": 0, "mesh_shape": [1]},
    })
    main(cfg_det)

    seg_out = str(tmp_path / "seg")
    cfg_seg = Config.from_sources(None, {
        "model": {**common_model, "mask_model": "smallconv",
                  "frozen_detector": True},
        "data": common_data,
        "optim": {"train_batch_size": 2, "valid_batch_size": 2, "epochs": 1,
                  "ema": False, "eval_skip": 1},
        "loss": {"aux_loss": False},
        "run": {"output_dir": seg_out, "seed": 0, "mesh_shape": [1],
                "load": os.path.join(det_out, "checkpoint")},
    })
    best = main(cfg_seg)
    assert np.isfinite(best)
    log = [json.loads(l) for l in open(os.path.join(seg_out, "log.jsonl"))]
    steps = [r for r in log if r["kind"] == "train_step"]
    assert steps and "loss_mask" in steps[0] and "loss_dice" in steps[0]
    evals = [r for r in log if r["kind"] == "eval"]
    assert "segm" in evals[-1]["per_task"][
        list(evals[-1]["per_task"].keys())[0]]


@pytest.mark.slow
def test_distillation_training_fixture(tmp_path):
    """Workload 4 (SURVEY.md Appendix A): distillation train + cluster eval."""
    root = generate_fixture(str(tmp_path / "data"), num_tasks=2,
                            imgs_per_split=3, img_size=(96, 128), seed=2)
    out_dir = str(tmp_path / "out")
    cfg = Config.from_sources(None, {
        "model": {"backbone": "resnet18-test", "hidden_dim": 64, "nheads": 4,
                  "dim_feedforward": 128, "enc_layers": 1, "dec_layers": 2,
                  "num_queries": 10, "compute_dtype": "float32",
                  "contrastive_align_loss": False,
                  "backbone_norm": "group_norm", "text_hidden": 64,
                  "text_layers": 1, "text_heads": 4, "text_intermediate": 128},
        "data": {"coco_path": root, "refexp_ann_path": root + "/annotations",
                 "tasks": [1, 2], "image_buckets": [[128, 128]],
                 "max_text_len": 48, "max_boxes": 8,
                 "train_scales": [96], "max_size": 128, "val_size": 96},
        "optim": {"train_batch_size": 2, "valid_batch_size": 2, "epochs": 1,
                  "lr": 1e-3, "lr_backbone": 1e-3, "text_encoder_lr": 1e-3,
                  "ema": True, "eval_skip": 1},
        "loss": {"distillation": True, "softkd_loss": True,
                 "softkd_coef": 50.0, "nsthl2_loss": True, "nsthl2_coef": 1.0,
                 "cluster": True, "cluster_memory_size": 16, "cluster_num": 2,
                 "kmeans_max_iters": 8},
        "run": {"output_dir": out_dir, "seed": 0, "mesh_shape": [1]},
    })
    best = main(cfg)
    assert np.isfinite(best)
    log = [json.loads(l) for l in open(os.path.join(out_dir, "log.jsonl"))]
    steps = [r for r in log if r["kind"] == "train_step"]
    assert steps and "loss_softkd" in steps[0] and "noun_loss_ce" in steps[0]

    # Eval-only resume of the distillation checkpoint (scripts/eval_dete_dis.sh
    # flow: template must carry teacher/bank fields to restore the ckpt).
    cfg_eval = Config.from_sources(None, {
        **{k: v for k, v in cfg.to_dict().items() if k != "run"},
        "run": {"eval_only": True, "seed": 0, "mesh_shape": [1],
                "resume": os.path.join(out_dir, "checkpoint")},
    })
    m = main(cfg_eval)
    assert np.isfinite(m)
