"""Fixture dry-run of the turnkey parity pipeline (scripts/run_parity.py).

Exercises PARITY.md steps 1-5 hermetically: synthetic COCO-Tasks data,
synthetic torch checkpoints in the reference's exact state_dict layout
(utils/convert.synth_reference_state_dict), torch->orbax conversion with the
structural audit, all five BASELINE.json workloads through toist_tpu.main,
per-task AP collection, and the golden diff table. After this, the only
untested step of the real parity run is the data/checkpoint drop itself
(reference oracle: /root/reference/README.md:84-95, main.py:546-591).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_run_parity_fixture(tmp_path):
    out = str(tmp_path / "parity")
    env = dict(os.environ)
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_parity.py"),
         "--fixture", "--out", out, "--platform", "cpu"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3000)
    assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-3000:]

    report = json.load(open(os.path.join(out, "parity_report.json")))
    res = report["results"]
    assert set(res) == {"dete_task1", "dete_all14", "seg", "noun", "distill"}
    for name, r in res.items():
        assert np.isfinite(r["mean_ap50"]), (name, r)
        assert r["per_task_ap50"], name
        for ap in r["per_task_ap50"].values():
            assert np.isfinite(ap)
    # Config 1 evals task 1 only; config 2 both fixture tasks.
    assert set(res["dete_task1"]["per_task_ap50"]) == {"1"}
    assert set(res["dete_all14"]["per_task_ap50"]) == {"1", "2"}
    # Seg eval produced mask APs through the segm COCOEval path.
    assert res["seg"].get("per_task_ap50_segm"), res["seg"]

    # Diff mechanics: the report's own numbers as golden pass with zero
    # delta; a golden shifted beyond the 0.2 bar fails.
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from run_parity import diff_report
    d = diff_report(res, {k: v for k, v in res.items()})
    assert d["pass"] and d["max_abs_delta"] == 0.0
    # And a shifted golden beyond the 0.2 bar fails.
    bad = {"dete_task1": {"mean_ap50": res["dete_task1"]["mean_ap50"] + 0.5}}
    d2 = diff_report(res, bad)
    assert not d2["pass"]
