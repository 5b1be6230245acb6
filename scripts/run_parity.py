#!/usr/bin/env python
"""Turnkey absolute-parity runner — PARITY.md steps 1-5 in one command.

The reference's de-facto oracle is eval against its published checkpoints
(/root/reference/README.md:84-95,254-400, main.py:546-591). This environment
has zero egress, so the real run waits for the user to drop in the artifacts;
everything downstream of that drop is executed by this script:

  1. verify the COCO-Tasks data layout (the exact paths configs/tdod.json uses)
  2. convert the published torch .pth checkpoints to weights-only orbax
     checkpoints (utils/convert.load_reference_checkpoint), with a structural
     audit of the converted tree against the model's own init tree
  3. run the five BASELINE.json configs through toist_tpu.main
  4. collect per-task AP@0.5 from each run's log.jsonl
  5. emit a per-task AP diff table against --golden (the reference's own
     numbers, captured by running the reference on the same data)

Real run:
  python scripts/run_parity.py \
      --coco-path data/images --ann-path data/coco-tasks/annotations \
      --dete-ckpt toist_dete.pth [--seg-ckpt toist_seg.pth] \
      [--noun-ckpt noun.pth] [--student-ckpt s.pth --teacher-ckpt t.pth] \
      [--golden goldens.json] [--configs dete_task1 dete_all14 seg noun distill] \
      --out logs/parity

Fixture dry-run (hermetic: synthetic dataset + synthetic torch checkpoints in
the reference's exact state_dict layout — the only untested step left for the
real run is the data/checkpoint drop itself):
  python scripts/run_parity.py --fixture --out /tmp/parity

Eval configs load the converted checkpoint via run.load with optim.ema=false:
load_params already prefers the checkpoint's EMA weights (the reference evals
model_ema, main.py:546-562), and run.load deliberately does not touch the
fresh template's ema_params.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

AP_TOLERANCE = 0.2  # BASELINE.md quality bar: |mAP@0.5 - reference| <= 0.2


# ---------------------------------------------------------------------------
# Step 1: data layout
# ---------------------------------------------------------------------------

def verify_layout(coco_path: str, ann_path: str, tasks) -> list:
    """PARITY.md step 1: the exact layout configs/tdod.json points to."""
    missing = []
    for sub in ("train2014", "val2014"):
        if not os.path.isdir(os.path.join(coco_path, sub)):
            missing.append(f"{coco_path}/{sub}/ (images)")
    if not os.path.isfile(os.path.join(ann_path, "id2name.json")):
        missing.append(f"{ann_path}/id2name.json")
    for t in tasks:
        for split in ("train", "test"):
            f = os.path.join(ann_path, f"task_{t}_{split}.json")
            if not os.path.isfile(f):
                missing.append(f)
    for f in ("vocab.json", "merges.txt"):
        if not os.path.isfile(os.path.join(ann_path, f)):
            print(f"note: {ann_path}/{f} absent — tokenizer falls back to a "
                  "BPE trained on the dataset captions (PARITY.md step 2: "
                  "drop the roberta-base files there for HF-identical ids)")
    return missing


# ---------------------------------------------------------------------------
# Step 2: checkpoint conversion + structural audit
# ---------------------------------------------------------------------------

_STAGE_SIZES = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3),
                "resnet18-test": (1, 1, 1, 1)}


def convert_checkpoint(pth: str, cfg, out_path: str) -> str:
    """torch .pth -> weights-only orbax checkpoint consumable by run.load /
    run.load_noun (train/checkpoint.load_params). Returns out_path."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from toist_tpu.main import _dummy_batch, build_all
    from toist_tpu.utils.convert import load_reference_checkpoint

    m = cfg.model
    params, frozen = load_reference_checkpoint(
        pth, d_model=m.hidden_dim, enc_layers=m.enc_layers,
        dec_layers=m.dec_layers, stage_sizes=_STAGE_SIZES[m.backbone],
        with_masks=m.masks)

    # Structural audit vs the model's own init tree (same check as
    # tests/test_convert.py::test_full_tree_conversion_structure, but against
    # the user's actual checkpoint): converted-only keys or shape mismatches
    # are conversion/config errors; init-only keys are fresh heads (e.g. a
    # detection checkpoint under a seg model) and only warned about.
    _, model, _, eval_spec = build_all(cfg)
    b = _dummy_batch(eval_spec, 1, init_hw=(64, 64))
    args = tuple(jnp.asarray(b[k]) for k in
                 ("images", "image_mask", "text_ids", "text_mask"))
    shapes = jax.eval_shape(
        lambda r, *a: model.init(r, *a, method=model.init_forward),
        jax.random.PRNGKey(0), *args)
    want = {jax.tree_util.keystr(p): tuple(v.shape) for p, v in
            jax.tree_util.tree_leaves_with_path(shapes)}
    got = {jax.tree_util.keystr(p): tuple(v.shape) for p, v in
           jax.tree_util.tree_leaves_with_path(
               {"params": params, **frozen})}
    extra = sorted(set(got) - set(want))
    if extra:
        raise SystemExit(
            f"conversion audit: {len(extra)} checkpoint keys have no home in "
            f"the model (config/architecture mismatch), e.g. {extra[:5]}")
    mismatched = {k: (got[k], want[k]) for k in got if got[k] != want[k]}
    if mismatched:
        raise SystemExit(
            "conversion audit: shape mismatches "
            f"{dict(list(mismatched.items())[:5])}")
    fresh = sorted(set(want) - set(got))
    if fresh:
        print(f"conversion audit: {len(fresh)} model keys keep fresh init "
              f"(expected for new heads), e.g. {fresh[:3]}")

    payload = {"state": {"params": params, "ema_params": params},
               "frozen": frozen, "epoch": -1}
    ocp.PyTreeCheckpointer().save(os.path.abspath(out_path), payload,
                                  force=True)
    print(f"converted {pth} -> {out_path}")
    return out_path


# ---------------------------------------------------------------------------
# Steps 3+4: run the BASELINE configs, collect per-task AP@0.5
# ---------------------------------------------------------------------------

def run_workload(name: str, argv: list, out_dir: str) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    cmd = [sys.executable, "-m", "toist_tpu.main"] + argv + \
        ["--output-dir", out_dir]
    print(f"[{name}] {' '.join(cmd)}", flush=True)
    with open(os.path.join(out_dir, "stdout.log"), "w") as log:
        p = subprocess.run(cmd, cwd=REPO, stdout=log,
                           stderr=subprocess.STDOUT, env=dict(os.environ))
    if p.returncode != 0:
        tail = open(os.path.join(out_dir, "stdout.log")).readlines()[-30:]
        raise SystemExit(f"[{name}] failed (exit {p.returncode}):\n"
                         + "".join(tail))
    evals = [json.loads(l) for l in
             open(os.path.join(out_dir, "log.jsonl"))]
    evals = [r for r in evals if r.get("kind") == "eval"]
    if not evals:
        raise SystemExit(f"[{name}] produced no eval record in log.jsonl")
    last = evals[-1]
    result = {"mean_ap50": last["mean_ap50"],
              "per_task_ap50": {t: s["bbox"][1]
                                for t, s in last["per_task"].items()}}
    segm = {t: s["segm"][1] for t, s in last["per_task"].items()
            if "segm" in s}
    if segm:
        result["per_task_ap50_segm"] = segm
    return result


def _sets(d: dict) -> list:
    return [f"{k}={json.dumps(v) if not isinstance(v, str) else v}"
            for k, v in d.items()]


def build_workloads(args, ckpt: dict, base_cfg: list, common: dict) -> list:
    """The five BASELINE.json configs as toist_tpu.main invocations.

    ckpt: converted orbax paths keyed dete/seg/noun/student/teacher.
    base_cfg: leading argv (e.g. --config configs/tdod.json).
    common: shared --set overrides (data paths; fixture-scale model dims).
    """
    eval_common = dict(common)
    eval_common["optim.ema"] = False  # load_params already returned EMA
    w = []
    # 1: single-task detection eval, batch 8, no contrastive align
    #    (reference scripts/eval_dete.sh + BASELINE config 1).
    w.append(("dete_task1", base_cfg + ["--eval", "--load", ckpt["dete"],
              "--set"] + _sets({**eval_common, "data.tasks": [1],
                                "optim.valid_batch_size": args.eval_batch,
                                "model.contrastive_align_loss": False})))
    # 2: all-14-task detection eval, contrastive align on, EMA weights.
    w.append(("dete_all14", base_cfg + ["--eval", "--load", ckpt["dete"],
              "--set"] + _sets({**eval_common,
                                "optim.valid_batch_size": args.eval_batch})))
    # 3: instance segmentation eval (mask mAP), batch 4.
    if ckpt.get("seg"):
        w.append(("seg", base_cfg + ["--eval", "--load", ckpt["seg"],
                  "--set"] + _sets({**eval_common,
                                    "optim.valid_batch_size":
                                        max(1, args.eval_batch // 2),
                                    "model.mask_model": "smallconv",
                                    "model.contrastive_align_loss": False})))
    # 4: verb-noun teacher eval (privileged text path).
    w.append(("noun", base_cfg + ["--eval", "--load",
              ckpt.get("noun") or ckpt["dete"],
              "--set"] + _sets({**eval_common, "data.verb_noun_input": True,
                                "model.contrastive_align_loss": False})))
    # 5: noun-pronoun distillation training
    #    (reference scripts/train_dete_dis.sh; student+teacher warm starts).
    dis = {**common,
           "run.load_noun": ckpt.get("teacher") or ckpt["dete"],
           "optim.train_batch_size": args.dis_batch,
           "optim.valid_batch_size": args.eval_batch,
           "loss.distillation": True, "loss.softkd_loss": True,
           "loss.softkd_coef": 50, "loss.cluster": True,
           "loss.cluster_memory_size": args.cluster_memory,
           "loss.cluster_num": args.cluster_num,
           "loss.cluster_feature_loss": 1e4,
           "optim.eval_skip": 1}
    if args.dis_epochs:
        dis["optim.epochs"] = args.dis_epochs
    w.append(("distill", base_cfg
              + ["--load", ckpt.get("student") or ckpt["dete"], "--set"]
              + _sets(dis)))
    keep = [x for x in w if x[0] in args.configs]
    return keep


# ---------------------------------------------------------------------------
# Step 5: diff table
# ---------------------------------------------------------------------------

def diff_report(results: dict, golden: dict) -> dict:
    rows, worst = [], 0.0
    for name, res in results.items():
        g = golden.get(name)
        if not g:
            continue
        for t, ours in sorted(res["per_task_ap50"].items()):
            ref = g.get("per_task_ap50", {}).get(str(t))
            if ref is None:
                continue
            d = ours - ref
            worst = max(worst, abs(d))
            rows.append((name, t, ours, ref, d))
        if "mean_ap50" in g:
            d = res["mean_ap50"] - g["mean_ap50"]
            worst = max(worst, abs(d))
            rows.append((name, "mean", res["mean_ap50"], g["mean_ap50"], d))
    if rows:
        print(f"\n{'config':<12}{'task':<6}{'ours':>8}{'golden':>8}"
              f"{'delta':>9}  ok(<= {AP_TOLERANCE})")
        for name, t, ours, ref, d in rows:
            ok = "PASS" if abs(d) <= AP_TOLERANCE else "FAIL"
            print(f"{name:<12}{str(t):<6}{ours:>8.4f}{ref:>8.4f}"
                  f"{d:>+9.4f}  {ok}")
    return {"rows": [dict(zip(("config", "task", "ours", "golden", "delta"),
                              r)) for r in rows],
            "max_abs_delta": worst,
            "pass": bool(rows) and worst <= AP_TOLERANCE}


# ---------------------------------------------------------------------------
# Fixture dry-run artifacts
# ---------------------------------------------------------------------------

FIXTURE_MODEL = {
    # frozen_bn: conversion ingests the checkpoint's BN buffers.
    "model.backbone": "resnet18-test", "model.backbone_norm": "frozen_bn",
    "model.hidden_dim": 128, "model.nheads": 8, "model.dim_feedforward": 256,
    "model.enc_layers": 1, "model.dec_layers": 2, "model.num_queries": 12,
    "model.compute_dtype": "float32", "model.text_hidden": 24,
    "model.text_layers": 1, "model.text_heads": 4,
    "model.text_intermediate": 96,
}
FIXTURE_DATA = {
    "data.image_buckets": [[128, 128]], "data.max_text_len": 48,
    "data.max_boxes": 8, "data.train_scales": [96], "data.max_size": 128,
    "data.val_size": 96, "data.tasks": [1, 2],
}


def make_fixture(out: str):
    """Synthetic dataset + synthetic torch checkpoints in the reference's
    exact state_dict layout (utils/convert.synth_reference_state_dict)."""
    import torch

    from toist_tpu.data.fixtures import generate_fixture
    from toist_tpu.main import build_tokenizer
    from toist_tpu.utils.convert import synth_reference_state_dict

    root = generate_fixture(os.path.join(out, "data"), num_tasks=2,
                            imgs_per_split=3, img_size=(96, 128), seed=7)
    common = {**FIXTURE_MODEL, **FIXTURE_DATA,
              "data.coco_path": root,
              "data.refexp_ann_path": root + "/annotations",
              "optim.epochs": 1, "optim.eval_skip": 1, "run.seed": 0,
              "loss.kmeans_max_iters": 8}
    cfg = _cfg_from_sets(common)
    vocab = build_tokenizer(cfg).vocab_size

    kw = dict(stage_sizes=(1, 1, 1, 1), enc=1, dec=2, d=128,
              dim_feedforward=256, text_layers=1, text_hidden=24,
              text_intermediate=96, num_queries=12, vocab_size=vocab)
    paths = {}
    for name, extra in (("dete", dict(with_masks=False, contrastive=True,
                                      seed=0)),
                        ("seg", dict(with_masks=True, contrastive=False,
                                     seed=1))):
        sd = synth_reference_state_dict(**kw, **extra)
        p = os.path.join(out, f"synth_{name}.pth")
        torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()},
                    "model_ema": None}, p)
        paths[name] = p
    return common, paths


def _cfg_from_sets(sets: dict, config_file=None):
    from toist_tpu.config import Config
    overrides = {}
    for k, v in sets.items():
        sec, name = k.split(".", 1)
        overrides.setdefault(sec, {})[name] = v
    return Config.from_sources(config_file, overrides)


# ---------------------------------------------------------------------------

def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--fixture", action="store_true",
                   help="hermetic dry-run on synthetic data + checkpoints")
    p.add_argument("--out", default="logs/parity")
    p.add_argument("--coco-path", default="data/images")
    p.add_argument("--ann-path", default="data/coco-tasks/annotations")
    p.add_argument("--dete-ckpt", default="")
    p.add_argument("--seg-ckpt", default="")
    p.add_argument("--noun-ckpt", default="")
    p.add_argument("--student-ckpt", default="")
    p.add_argument("--teacher-ckpt", default="")
    p.add_argument("--golden", default="", help="reference AP json: "
                   '{"dete_task1": {"mean_ap50": x, "per_task_ap50": '
                   '{"1": y}}, ...}')
    p.add_argument("--configs", nargs="*", default=[
        "dete_task1", "dete_all14", "seg", "noun", "distill"])
    p.add_argument("--eval-batch", type=int, default=8)
    p.add_argument("--dis-batch", type=int, default=3)
    p.add_argument("--dis-epochs", type=int, default=0,
                   help="override distillation epochs (0 = config value)")
    p.add_argument("--cluster-memory", type=int, default=1024)
    p.add_argument("--cluster-num", type=int, default=3)
    p.add_argument("--extra-set", nargs="*", default=[],
                   help="extra k=v overrides appended to every workload")
    p.add_argument("--platform", default="",
                   help="force a JAX platform (e.g. cpu) for the conversion "
                   "step and every workload subprocess; the fixture test "
                   "passes cpu")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        if args.platform == "cpu":
            # The axon sitecustomize pins the TPU tunnel programmatically;
            # dropping it from PYTHONPATH lets JAX_PLATFORMS stick in the
            # workload subprocesses.
            pp = [e for e in os.environ.get("PYTHONPATH", "").split(os.pathsep)
                  if e and "axon" not in e]
            os.environ["PYTHONPATH"] = os.pathsep.join(pp)
        import jax
        jax.config.update("jax_platforms", args.platform)

    if args.fixture:
        common, pths = make_fixture(args.out)
        args.eval_batch, args.dis_batch = 2, 2
        args.dis_epochs = args.dis_epochs or 1
        args.cluster_memory, args.cluster_num = 16, 2
        base_cfg = []
        pth = {"dete": pths["dete"], "seg": pths["seg"], "noun": "",
               "student": "", "teacher": ""}
    else:
        common = {"data.coco_path": args.coco_path,
                  "data.refexp_ann_path": args.ann_path}
        base_cfg = ["--config", os.path.join(REPO, "configs", "tdod.json")]
        pth = {"dete": args.dete_ckpt, "seg": args.seg_ckpt,
               "noun": args.noun_ckpt, "student": args.student_ckpt,
               "teacher": args.teacher_ckpt}
        if not pth["dete"]:
            p.error("--dete-ckpt is required (or use --fixture)")

    for kv in args.extra_set:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        common[k] = v

    # Step 1: layout.
    cfg0 = _cfg_from_sets(common,
                          None if args.fixture else base_cfg[1])
    missing = verify_layout(cfg0.data.coco_path, cfg0.data.refexp_ann_path,
                            cfg0.data.tasks)
    if missing:
        raise SystemExit("data layout incomplete (PARITY.md step 1):\n  "
                         + "\n  ".join(missing))
    print("data layout: ok")

    # Step 2: conversions (seg gets the masks model; others the plain one).
    ckpt = {}
    for name, path in pth.items():
        if not path:
            continue
        sets = dict(common)
        if name == "seg":
            sets["model.mask_model"] = "smallconv"
        if args.fixture and name != "seg":
            sets["model.contrastive_align_loss"] = True
        elif args.fixture:
            sets["model.contrastive_align_loss"] = False
        ckpt[name] = convert_checkpoint(
            path, _cfg_from_sets(sets, None if args.fixture else base_cfg[1]),
            os.path.join(args.out, f"ckpt_{name}"))

    # Steps 3+4: the five workloads.
    results = {}
    for name, argv in build_workloads(args, ckpt, base_cfg, common):
        results[name] = run_workload(name, argv,
                                     os.path.join(args.out, name))
        print(f"[{name}] mean AP@0.5 = {results[name]['mean_ap50']:.4f} "
              f"per-task {results[name]['per_task_ap50']}")

    # Step 5: diff.
    report = {"results": results}
    if args.golden:
        with open(args.golden) as f:
            report["diff"] = diff_report(results, json.load(f))
    with open(os.path.join(args.out, "parity_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(f"report: {os.path.join(args.out, 'parity_report.json')}")


if __name__ == "__main__":
    main()
