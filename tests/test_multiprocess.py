"""Real multi-process (jax.distributed) integration test.

VERDICT r3 missing #2: every cross-host path — MetricLogger.
synchronize_between_processes, the evaluator's pickled process_allgather
merge, JsonlLogger rank gating, eval host-sharding, per-process data
sharding — had only ever run under SIMULATED hosts. This test launches the
REAL driver in two OS processes with a localhost coordinator (2 virtual CPU
devices each -> a 4-device global ('data',) mesh), trains an epoch on the
fixture, runs host-sharded eval with the ownership-keyed merge, and asserts
the merged result equals a single-process run of identical global semantics.

Reference analogue: 6-process torch.distributed.launch
(/root/reference/util/dist.py:205-229, main.py:336,439).
"""
import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from toist_tpu.data.fixtures import generate_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _dis_config(root: str, out_dir: str, batch_size: int) -> dict:
    """Distillation (teacher+student, softkd+nsthl2+cluster bank) at fixture
    scale. Bank small enough (8 rows) that one epoch FILLS it, exercising the
    replace-nearest branch across processes, not just FIFO inserts."""
    cfg = _config(root, out_dir, batch_size)
    cfg["loss"] = {"distillation": True, "softkd_loss": True,
                   "softkd_coef": 50.0, "nsthl2_loss": True, "cluster": True,
                   "cluster_memory_size": 8, "cluster_num": 2,
                   "cluster_feature_loss": 1e4, "kmeans_max_iters": 8}
    return cfg


def _config(root: str, out_dir: str, batch_size: int) -> dict:
    return {
        "model": {"backbone": "resnet18-test", "hidden_dim": 64, "nheads": 4,
                  "dim_feedforward": 128, "enc_layers": 1, "dec_layers": 1,
                  "num_queries": 8, "compute_dtype": "float32",
                  "dropout": 0.0, "resizer_dropout": 0.0,
                  "contrastive_align_loss": False,
                  "backbone_norm": "group_norm", "text_hidden": 64,
                  "text_layers": 1, "text_heads": 4, "text_intermediate": 128},
        "data": {"coco_path": root, "refexp_ann_path": root + "/annotations",
                 "tasks": [1, 2], "image_buckets": [[128, 128]],
                 "max_text_len": 48, "max_boxes": 8, "train_scales": [96],
                 "max_size": 128, "val_size": 96, "num_workers": 2},
        "optim": {"train_batch_size": batch_size, "valid_batch_size": 2,
                  "epochs": 1, "lr": 1e-3, "lr_backbone": 1e-3,
                  "text_encoder_lr": 1e-3, "ema": False, "eval_skip": 1},
        # threefry dropout rng: bitwise equivalence across topologies
        # (CLAUDE.md invariant); dropout is 0 anyway. Opt-state sharding off:
        # rank-0 device_get of a cross-process-sharded tree is not
        # addressable (checkpointing under ZeRO-1 multi-host would need a
        # gather; out of scope here).
        "run": {"output_dir": out_dir, "seed": 0, "mesh_shape": [-1],
                "dropout_rng_impl": "threefry2x32", "shard_opt_state": False,
                "async_checkpoint": False},
    }


def _launch(cfg_path: str, n_devices: int, env_extra: dict,
            timeout: int = 540) -> subprocess.Popen:
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count={n_devices}")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(env_extra)
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
         cfg_path],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)


def _eval_records(out_dir: str):
    with open(os.path.join(out_dir, "log.jsonl")) as f:
        log = [json.loads(line) for line in f]
    return log, [r for r in log if r["kind"] == "eval"]


@pytest.mark.slow
def test_two_process_run_matches_single_process(tmp_path):
    root = generate_fixture(str(tmp_path / "data"), num_tasks=2,
                            imgs_per_split=4, img_size=(96, 128), seed=7)

    # Single-process reference: global batch 4 on a 1-device mesh.
    single_out = str(tmp_path / "single")
    cfg1 = _config(root, single_out, batch_size=4)
    p1 = str(tmp_path / "single.json")
    json.dump(cfg1, open(p1, "w"))
    proc = _launch(p1, n_devices=1, env_extra={})
    out, err = proc.communicate(timeout=540)
    assert proc.returncode == 0, (out[-2000:], err[-4000:])

    # Two processes x 2 devices = a 4-device data mesh: per-DEVICE batch 1
    # -> the SAME global batch of 4 (each process contributes its 2-row
    # local slice; shards interleave the same shuffled order), so the runs
    # are numerically equivalent up to reduction order.
    mp_out = str(tmp_path / "mp")
    cfg2 = _config(root, mp_out, batch_size=1)
    p2 = str(tmp_path / "mp.json")
    json.dump(cfg2, open(p2, "w"))
    port = _free_port()
    procs = [
        _launch(p2, n_devices=2, env_extra={
            "TOIST_COORDINATOR": f"localhost:{port}",
            "TOIST_NUM_PROCESSES": "2",
            "TOIST_PROCESS_ID": str(i),
        }) for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            o, e = p.communicate(timeout=540)
            outs.append((p.returncode, o, e))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, o, e in outs:
        assert rc == 0, (o[-2000:], e[-4000:])

    # Rank gating: exactly rank 0 wrote log.jsonl + checkpoints.
    log, evals = _eval_records(mp_out)
    assert os.path.isdir(os.path.join(mp_out, "checkpoint"))
    assert {"train_step", "epoch", "eval"} <= {r["kind"] for r in log}

    # Cross-host meter merge ran and produced global epoch stats.
    epoch_rec = [r for r in log if r["kind"] == "epoch"][-1]
    assert "iter_time" in epoch_rec and "loss" in epoch_rec

    # Merged host-sharded eval == the single-process eval (each process saw
    # only HALF the val images; the ownership-keyed allgather merge must
    # reassemble the full set).
    log_single, evals1 = _eval_records(single_out)
    e1, e2 = evals1[-1], evals[-1]
    assert np.isfinite(e2["mean_ap50"])
    np.testing.assert_allclose(e2["mean_ap50"], e1["mean_ap50"], atol=1e-6)
    for task, stats in e1["per_task"].items():
        for iou, vec in stats.items():
            np.testing.assert_allclose(
                e2["per_task"][task][iou], vec, atol=1e-5,
                err_msg=f"task {task} {iou}")

    # Both ranks reported through the real coordinator, with the same merged
    # best mAP (the evaluator allgathers records to every process).
    ranks, bests = set(), set()
    for rc, o, e in outs:
        line = [ln for ln in o.splitlines() if ln.startswith("MP_RESULT ")]
        assert line, o[-2000:]
        res = json.loads(line[-1][len("MP_RESULT "):])
        assert res["process_count"] == 2
        ranks.add(res["process_index"])
        bests.add(res["best_map"])
    assert ranks == {0, 1}
    assert len(bests) == 1

    # Per-step loss/grad_norm equality: the global gradient math (mean over
    # the same 4-sample global batch, clip, AdamW) is identical whether the
    # batch lives on 1 local device or is assembled from 2 processes.
    steps1 = [r for r in log_single if r["kind"] == "train_step"]
    steps2 = [r for r in log if r["kind"] == "train_step"]
    assert [r["step"] for r in steps1] == [r["step"] for r in steps2]
    for r1, r2 in zip(steps1, steps2):
        np.testing.assert_allclose(r2["loss"], r1["loss"], rtol=1e-4)
        np.testing.assert_allclose(r2["grad_norm"], r1["grad_norm"],
                                   rtol=1e-3)

    # Trained-weight equality, quantile-bounded: AdamW's sign-like early
    # updates amplify fp reduction-order noise on near-zero-gradient
    # elements to O(lr), so demand 99.9% of elements essentially exact and
    # bound the tail (measured: max 5.4e-5, q999 9.2e-7 over 8.4M params).
    from toist_tpu.train.checkpoint import _ckptr
    p_single = _ckptr().restore(
        os.path.join(single_out, "checkpoint"))["state"]["params"]
    p_mp = _ckptr().restore(
        os.path.join(mp_out, "checkpoint"))["state"]["params"]
    leaves_s = jax.tree_util.tree_leaves_with_path(p_single)
    leaves_m = dict(jax.tree_util.tree_leaves_with_path(p_mp))
    assert len(leaves_s) == len(leaves_m)
    diffs = np.concatenate(
        [np.abs(np.asarray(leaves_m[p]) - np.asarray(l)).ravel()
         for p, l in leaves_s])
    assert float(np.quantile(diffs, 0.999)) < 1e-5, np.quantile(diffs, 0.999)
    assert float(diffs.max()) < 1e-3, diffs.max()


@pytest.mark.slow
def test_two_process_distillation_bank_matches_single_process(tmp_path):
    """The distillation step under the REAL 2-process coordinator (VERDICT r4
    directive #6): the cluster bank is the one piece of cross-replica state
    with bespoke determinism logic (train/cluster.py applies gathered rows via
    a deterministic scan in global batch order instead of the reference's
    concat-order-dependent all_gather, mdetr.py:62-103). Assert the final
    bank (feature rows, k-means centers, counters) and the per-step losses
    are identical whether the global batch lives on 1 local device or is
    assembled from 2 processes."""
    root = generate_fixture(str(tmp_path / "data"), num_tasks=2,
                            imgs_per_split=4, img_size=(96, 128), seed=7)

    # Single-process reference: global paired batch 2 on a 1-device mesh.
    single_out = str(tmp_path / "single")
    cfg1 = _dis_config(root, single_out, batch_size=2)
    p1 = str(tmp_path / "single.json")
    json.dump(cfg1, open(p1, "w"))
    proc = _launch(p1, n_devices=1, env_extra={})
    out, err = proc.communicate(timeout=540)
    assert proc.returncode == 0, (out[-2000:], err[-4000:])

    # Two processes x 1 device: per-device batch 1 -> the same global 2.
    mp_out = str(tmp_path / "mp")
    cfg2 = _dis_config(root, mp_out, batch_size=1)
    p2 = str(tmp_path / "mp.json")
    json.dump(cfg2, open(p2, "w"))
    port = _free_port()
    procs = [
        _launch(p2, n_devices=1, env_extra={
            "TOIST_COORDINATOR": f"localhost:{port}",
            "TOIST_NUM_PROCESSES": "2",
            "TOIST_PROCESS_ID": str(i),
        }) for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            o, e = p.communicate(timeout=540)
            outs.append((p.returncode, o, e))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, o, e in outs:
        assert rc == 0, (o[-2000:], e[-4000:])

    # Per-step loss equality (incl. the cluster/softkd/nsthl2 components the
    # bank feeds): the global step math is topology-independent. Step 1 runs
    # on IDENTICAL params, so every component must match to float-noise;
    # later steps accumulate reduction-order drift through AdamW and the
    # entropic softkd solve (whose iterate is sensitive to last-ulp logits
    # — measured rel 8e-4 on loss_softkd by step 4), so they get a loose
    # bound that still catches any structural divergence (wrong rows in the
    # bank, a missing psum) which shows up at O(1), not O(1e-3).
    log1, _ = _eval_records(single_out)
    log2, _ = _eval_records(mp_out)
    steps1 = [r for r in log1 if r["kind"] == "train_step"]
    steps2 = [r for r in log2 if r["kind"] == "train_step"]
    assert steps1 and [r["step"] for r in steps1] == \
        [r["step"] for r in steps2]
    for r1, r2 in zip(steps1, steps2):
        first = r1["step"] == steps1[0]["step"]
        for k in r1:
            if k.startswith("loss") and isinstance(r1[k], float):
                np.testing.assert_allclose(
                    r2[k], r1[k], rtol=1e-5 if first else 1e-2,
                    atol=1e-6 if first else 1e-4,
                    err_msg=f"step {r1['step']} {k}")

    # Bank equality from the final checkpoints: the deterministic-scan update
    # order must make the 2-process bank STRUCTURALLY identical to the
    # single-process one — integer state (insert counters, full flags) must
    # be bit-equal, and every feature row / k-means center must be the same
    # row up to the parameter drift above (rows inserted at step k reflect
    # k-1 reduction-order-divergent AdamW updates of the teacher).
    from toist_tpu.train.checkpoint import _ckptr
    s1 = _ckptr().restore(os.path.join(single_out, "checkpoint"))["state"]
    s2 = _ckptr().restore(os.path.join(mp_out, "checkpoint"))["state"]
    b1, b2 = s1["cluster_bank"], s2["cluster_bank"]
    assert b1 and b2
    np.testing.assert_array_equal(np.asarray(b2["update_count"]),
                                  np.asarray(b1["update_count"]))
    np.testing.assert_array_equal(np.asarray(b2["full"]),
                                  np.asarray(b1["full"]))
    # One epoch of 8 paired samples through an 8-row bank: full flag behavior
    # and counts must show the bank actually cycled.
    assert int(np.asarray(b1["update_count"]).sum()) >= 8
    for key in ("feature_bank", "cluster_centers"):
        a1, a2 = np.asarray(b1[key]), np.asarray(b2[key])
        # Row correspondence (same slot got the same sample's feature):
        # a wrong-order insert puts a DIFFERENT sample's row in the slot,
        # whose distance is O(row norm), orders above the drift bound.
        np.testing.assert_allclose(a2, a1, atol=5e-3, err_msg=key)
        assert float(np.abs(a2 - a1).mean()) < 5e-4, (key, np.abs(a2 - a1).mean())
