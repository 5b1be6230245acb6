"""Distillation learning-effect regression gate (VERDICT r4 #7).

The round-4 fixture ablation established the ordering
distilled-student > plain-student on AP@0.5 (6 epochs: 0.113 vs 0.039;
committed artifact docs/ablation_distill_r5.json). This pins a reduced
2-epoch version in the suite so a sign/semantics flip in the softkd /
nsthl2 / cluster gradients cannot pass CI silently again: at 2 epochs the
measured margin is +0.037 AP@0.5 (distill 0.117 vs plain 0.079,
deterministic on the CPU backend), asserted here with a 0.015 floor.

Runs the ablation script as a subprocess (its own CPU-platform process, as
users run it) — teacher + plain + distilled student on the generated
fixture, ~4-6 min on the 1-core dev VM; by far the slowest suite test, kept
because it is the only end-to-end check that distillation LEARNS, not just
that its losses descend (tests/test_distillation.py covers descent).
Reference flow: /root/reference/scripts/train_dete_dis.sh (teacher from
train_dete_noun.sh, student distilled from scripts/train_dete.sh init).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_distilled_student_beats_plain_student(tmp_path):
    out = tmp_path / "ablation.json"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "fixture_distill_ablation.py"),
         "--epochs", "2", "--workdir", str(tmp_path / "work"),
         "--out", str(out)],
        capture_output=True, text=True, timeout=1500, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    res = json.loads(out.read_text())
    margin = res["distill_student_ap50"] - res["plain_student_ap50"]
    assert margin > 0.015, (
        "distillation learning-effect regression: distilled student "
        f"{res['distill_student_ap50']:.4f} vs plain "
        f"{res['plain_student_ap50']:.4f} AP@0.5 (margin {margin:+.4f}, "
        "expected > +0.015; round-5 record +0.037)")
