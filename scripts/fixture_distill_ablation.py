#!/usr/bin/env python
"""Fixture-scale distillation ablation: student AP@0.5 with vs without
noun-pronoun distillation.

The reference's headline claim is that distillation adds +2.8 mAP to the
pronoun student (/root/reference/README.md:11; engine.py:119-250 is the
training path). At fixture scale the absolute APs are meaningless, but the
ORDERING is checkable: a teacher trained on privileged noun captions (which
name the true category) hands the student soft per-query targets via softkd;
with them the student should reach a higher train-distribution AP@0.5 than
the same student trained plain for the same number of epochs.

To keep the comparison low-noise the val split is a mirror of the train split
(overfit-style: same images, same annotations) — generalization of a 3-layer
64-dim model on 8 synthetic images is pure noise, optimization progress is
not. Both students share the same init (same run.seed), same epochs, same
deterministic config (dropout 0).

Run (CPU is fine):  python scripts/fixture_distill_ablation.py [--out f.json]
Too slow for the suite (3 trainings x 6 epochs); run standalone — the
measured numbers are recorded in ROUND4.md. The in-suite learning proof is
tests/test_distillation.py::test_distillation_step_learns.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EPOCHS = 6


def mirror_val_to_train(root: str, tasks) -> None:
    """Make the test split identical to the train split (file names are
    split-agnostic `fix_{id}.jpg`, so a copy suffices)."""
    for t in tasks:
        src = os.path.join(root, "annotations", f"task_{t}_train.json")
        dst = os.path.join(root, "annotations", f"task_{t}_test.json")
        shutil.copyfile(src, dst)
        ann = json.load(open(src))
        for im in ann["images"]:
            shutil.copyfile(os.path.join(root, "train2014", im["file_name"]),
                            os.path.join(root, "val2014", im["file_name"]))


def base_config(root: str, out_dir: str, seed: int, epochs: int = EPOCHS,
                **extra):
    from toist_tpu.config import Config
    over = {
        "model": {"backbone": "resnet18-test", "hidden_dim": 64, "nheads": 4,
                  "dim_feedforward": 128, "enc_layers": 1, "dec_layers": 2,
                  "num_queries": 10, "compute_dtype": "float32",
                  "dropout": 0.0, "resizer_dropout": 0.0,
                  "contrastive_align_loss": False,
                  "backbone_norm": "group_norm", "text_hidden": 64,
                  "text_layers": 1, "text_heads": 4,
                  "text_intermediate": 128},
        "data": {"coco_path": root, "refexp_ann_path": root + "/annotations",
                 "tasks": [1, 2], "image_buckets": [[128, 128]],
                 "max_text_len": 48, "max_boxes": 8, "train_scales": [96],
                 "max_size": 128, "val_size": 96},
        "optim": {"train_batch_size": 2, "valid_batch_size": 2,
                  "epochs": epochs, "lr": 1e-3, "lr_backbone": 1e-3,
                  "text_encoder_lr": 1e-3, "ema": False,
                  "eval_skip": max(1, epochs - 1)},
        "run": {"output_dir": out_dir, "seed": seed, "mesh_shape": [1]},
    }
    for sec, kv in extra.items():
        over.setdefault(sec, {}).update(kv)
    return Config.from_sources(None, over)


def last_eval_ap(out_dir: str) -> float:
    recs = [json.loads(l) for l in open(os.path.join(out_dir, "log.jsonl"))]
    evals = [r for r in recs if r.get("kind") == "eval"]
    return float(evals[-1]["mean_ap50"])


def run(workdir: str, epochs: int = EPOCHS) -> dict:
    from toist_tpu.data.fixtures import generate_fixture
    from toist_tpu.main import main

    root = generate_fixture(os.path.join(workdir, "data"), num_tasks=2,
                            imgs_per_split=4, img_size=(96, 128), seed=11)
    mirror_val_to_train(root, (1, 2))

    # 1. Teacher on privileged noun captions (scripts/train_dete_noun.sh).
    tdir = os.path.join(workdir, "teacher")
    main(base_config(root, tdir, seed=0, epochs=epochs,
                     data={"verb_noun_input": True}))
    teacher_ap = last_eval_ap(tdir)

    # 2. Plain pronoun student (scripts/train_dete.sh).
    pdir = os.path.join(workdir, "plain")
    main(base_config(root, pdir, seed=1, epochs=epochs))
    plain_ap = last_eval_ap(pdir)

    # 3. Distilled pronoun student: same init (seed 1), same epochs, teacher
    #    warm-started from step 1 (scripts/train_dete_dis.sh flow).
    ddir = os.path.join(workdir, "distill")
    main(base_config(
        root, ddir, seed=1, epochs=epochs,
        run={"load_noun": os.path.join(tdir, "checkpoint")},
        loss={"distillation": True, "softkd_loss": True, "softkd_coef": 50.0,
              "nsthl2_loss": True, "nsthl2_coef": 1.0, "cluster": True,
              "cluster_memory_size": 16, "cluster_num": 2,
              "kmeans_max_iters": 8}))
    distill_ap = last_eval_ap(ddir)

    return {"teacher_ap50": teacher_ap, "plain_student_ap50": plain_ap,
            "distill_student_ap50": distill_ap,
            "distill_minus_plain": distill_ap - plain_ap,
            "epochs": epochs}


def main_cli():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="")
    p.add_argument("--workdir", default="")
    p.add_argument("--epochs", type=int, default=EPOCHS)
    p.add_argument("--platform", default="cpu",
                   help="JAX platform ('' keeps the session default)")
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    wd = args.workdir or tempfile.mkdtemp(prefix="toist_distill_abl_")
    res = run(wd, epochs=args.epochs)
    print(json.dumps(res))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main_cli()
