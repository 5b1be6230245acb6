"""Subprocess worker for the multi-process integration test.

Runs the REAL driver (toist_tpu.main.main) under a real 2-process
jax.distributed runtime on the CPU backend — the reference's
torch.distributed.launch production mode (util/dist.py:205-229, main.py:336).
The coordinator/rank env (TOIST_COORDINATOR / TOIST_NUM_PROCESSES /
TOIST_PROCESS_ID) is consumed by toist_tpu.main.maybe_init_distributed.

Usage: python tests/mp_worker.py <config.json>
Prints one final line: MP_RESULT {"mean_ap50": ..., "process_index": ...}
"""
import json
import sys

import jax

# CPU backend BEFORE any device use (the axon sitecustomize pins the TPU
# tunnel programmatically; the env var alone does not stick).
jax.config.update("jax_platforms", "cpu")

from toist_tpu.config import Config  # noqa: E402
from toist_tpu.main import main  # noqa: E402


def run() -> None:
    cfg = Config.from_sources(sys.argv[1], {})
    best = main(cfg)
    # All ranks hold the MERGED eval results (the evaluator allgathers
    # records to every process), but main() only tracks best_map where it
    # checkpoints (rank 0); re-read rank 0's log for a uniform report.
    out = {"process_index": jax.process_index(),
           "process_count": jax.process_count(),
           "best_map": None if best is None else float(best)}
    print("MP_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    run()
