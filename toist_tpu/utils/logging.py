"""Metric logging: smoothed meters, stdout progress, JSONL sink.

Reference behavior: util/metrics.py SmoothedValue/MetricLogger (window meters,
eta/iter-time printing every N steps) and main.py:687-689 (log.txt JSON lines).
TensorBoard is replaced by the JSONL sink (no TB dependency guaranteed in image);
anything that reads log.jsonl can plot the same scalars.
"""
from __future__ import annotations

import datetime
import json
import os
import time
from collections import defaultdict, deque
from typing import Dict, Iterable, Optional


class SmoothedValue:
    def __init__(self, window: int = 20):
        self.deque = deque(maxlen=window)
        self.total = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / len(self.deque) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)


class MetricLogger:
    def __init__(self, delimiter: str = "  ", print_freq: int = 10,
                 header: str = ""):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.print_freq = print_freq
        self.header = header

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def log_every(self, iterable: Iterable, total: Optional[int] = None):
        i = 0
        start = time.time()
        iter_time = SmoothedValue()
        data_time = SmoothedValue()
        end = time.time()
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            end = time.time()
            if i % self.print_freq == 0:
                eta = ""
                if total:
                    eta_s = iter_time.global_avg * (total - i)
                    eta = f"eta: {datetime.timedelta(seconds=int(eta_s))}  "
                meters = self.delimiter.join(
                    f"{k}: {m.median:.4f} ({m.global_avg:.4f})"
                    for k, m in self.meters.items())
                print(f"{self.header} [{i}{'/' + str(total) if total else ''}]  "
                      f"{eta}{meters}  iter: {iter_time.avg:.3f}s  "
                      f"data: {data_time.avg:.3f}s", flush=True)
            i += 1
        print(f"{self.header} done in "
              f"{datetime.timedelta(seconds=int(time.time() - start))}",
              flush=True)

    def summary(self) -> Dict[str, float]:
        return {k: m.global_avg for k, m in self.meters.items()}


class JsonlLogger:
    """Append-only JSONL sink (the reference's log.txt, main.py:687-689)."""

    def __init__(self, output_dir: str, name: str = "log.jsonl"):
        self.path = os.path.join(output_dir, name) if output_dir else None
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)

    def write(self, record: dict):
        if not self.path:
            return
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=float) + "\n")
