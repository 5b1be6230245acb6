"""Roofline attribution for a profiled train step: bytes, GB/s, bound-ness.

Takes the JSON emitted by scripts/prof_train_ops.py (xprof per-op summary)
and, for every top HLO op, parses operand/result shapes out of the HLO text
to estimate bytes moved, then reports attained bandwidth vs the chip's HBM
peak and whether the op is plausibly bandwidth-bound, layout-bound (attained
far below peak with no compute), or compute-bound (known conv/matmul
fusions). This is the evidence VERDICT r2 asked for in place of bare
assertions about "time inside the compiler".

Usage: python scripts/prof_train_ops.py 80 > prof.json
       python scripts/roofline_report.py prof.json [hbm_gbps]
       python scripts/roofline_report.py prof.json [hbm_gbps] --by-class
"""
from __future__ import annotations

import json
import re
import sys

DTYPE_BYTES = {"bf16": 2, "f32": 4, "f64": 8, "s32": 4, "u32": 4, "s64": 8,
               "u8": 1, "s8": 1, "pred": 1, "f16": 2, "u16": 2, "s16": 2}

SHAPE_RE = re.compile(r"(bf16|f32|f64|f16|s64|s32|u32|s16|u16|s8|u8|pred)"
                      r"\[([0-9,]*)\]")


def op_bytes(hlo: str) -> int:
    """Sum of all shaped tensors named in the HLO line (operands + results).

    Over-counts fused constants and under-counts revisited inputs, but is
    the right order of magnitude for move-dominated ops (copies, pads,
    elementwise fusions)."""
    total = 0
    for dt, dims in SHAPE_RE.findall(hlo):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def classify(name: str, attained_frac: float) -> str:
    head = name.lstrip("%").split(" ")[0].split(".")[0]
    if head in ("self_attn", "_lambda_") or "tpu_custom_call" in name:
        return "pallas kernel"
    if "convolution" in head or head == "fusion":
        return "compute(conv/matmul)"
    if head.startswith(("copy", "slice", "pad", "bitcast", "reshape",
                        "transpose")):
        return ("layout (low BW)" if attained_frac < 0.45 else
                "layout (BW-bound)")
    if head.startswith("while"):
        return "sequential (solver)"
    return ("elementwise (BW-bound)" if attained_frac > 0.45 else
            "elementwise (low BW)")


def main():
    argv = [a for a in sys.argv[1:] if a != "--by-class"]
    by_class = "--by-class" in sys.argv
    path = argv[0] if argv else "/dev/stdin"
    hbm = float(argv[1]) if len(argv) > 1 else 819.0  # v5e GB/s
    with open(path) as f:
        d = json.load(f)
    total_ms = d["device_ms_per_iter"]
    print(f"device_ms_per_iter: {total_ms}")
    rows = []
    for name, ms in d["top_ops"]:
        gb = op_bytes(name) / 1e9
        gbps = gb / (ms / 1e3) if ms else 0.0
        frac = gbps / hbm
        rows.append((ms, gb, gbps, frac, name))
    if by_class:
        agg = {}
        for ms, gb, gbps, frac, name in rows:
            cls = classify(name, frac)
            a = agg.setdefault(cls, [0.0, 0.0, 0, 1.0, 0.0])
            a[0] += ms
            a[1] += gb
            a[2] += 1
            a[3] = min(a[3], frac)
            a[4] = max(a[4], frac)
        covered = sum(a[0] for a in agg.values())
        print(f"profiled top-op coverage: {covered:.1f} ms "
              f"({100 * covered / total_ms:.0f}% of step)")
        print(f"{'ms':>8} {'%step':>6} {'ops':>4} {'GB moved':>9} "
              f"{'%HBM range':>12}  class")
        for cls, (ms, gb, n, lo, hi) in sorted(agg.items(),
                                               key=lambda kv: -kv[1][0]):
            print(f"{ms:8.1f} {100 * ms / total_ms:5.1f}% {n:4d} {gb:9.2f} "
                  f"{100 * lo:4.0f}-{100 * hi:3.0f}%   {cls}")
        return
    print(f"{'ms':>8} {'GB moved':>9} {'GB/s':>7} {'%HBM':>6}  class / op")
    for ms, gb, gbps, frac, name in rows:
        short = name.split(" = ")[0].lstrip("%")
        shape = SHAPE_RE.search(name.split(" = ")[-1])
        shape_s = f"{shape.group(1)}[{shape.group(2)}]" if shape else ""
        print(f"{ms:8.3f} {gb:9.3f} {gbps:7.0f} {100*frac:5.1f}%  "
              f"{classify(name, frac):<22} {short} {shape_s}")


if __name__ == "__main__":
    main()
