"""Render docs/KERNEL_SWEEP.md from a bench_kernels.py --csv output.

Usage: python tools/render_kernel_sweep.py /tmp/kernel_sweep_r4.csv
"""

import csv
import sys
import time
from collections import defaultdict

FEAT_SIZES = [2 ** x for x in range(8)]


def main():
    path = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "docs/KERNEL_SWEEP.md"
    rows = list(csv.DictReader(open(path)))
    # (dataset, kind, op) -> {hidden: (seconds, sol)}
    table = defaultdict(dict)
    for r in rows:
        table[(r["dataset"], r["kind"], r["op"])][int(r["hidden"])] = (
            float(r["seconds"]), r.get("sol_pct", ""))

    lines = [
        "# Kernel microbenchmark sweep (TPU v5e)",
        "",
        f"Measured {time.strftime('%Y-%m-%d %H:%M UTC', time.gmtime())} on a "
        "healthy chip window (probe-gated). Protocol = reference "
        "`kernel/dgl-new.py`: hidden 1..128, 10 reps, 2 cold-start skipped. "
        "`SOL%` = information-theoretic minimum HBM traffic / (time x "
        "819 GB/s) — 100% is speed of light for the op; the gap is gather "
        "replay + reduction machinery.",
        "",
        "Rows: `spmm` = fused gspmm (XLA path unless lane plans dispatch); "
        "`lane_spmm` = forced Pallas lane kernel; `scatter` = user-level "
        "gather + segment op (PyG-twin, K2); `sddmm` = per-edge binary.",
        "",
    ]
    for (ds, kind, op), vals in sorted(table.items()):
        lines.append(f"## {ds} — {kind} ({op})")
        lines.append("")
        lines.append("| hidden | " + " | ".join(str(h) for h in FEAT_SIZES) + " |")
        lines.append("|---|" + "---|" * len(FEAT_SIZES))
        ms = ["ms"] + [
            f"{vals[h][0] * 1e3:.2f}" if h in vals else "—" for h in FEAT_SIZES
        ]
        lines.append("| " + " | ".join(ms) + " |")
        sol = ["SOL%"] + [
            (vals[h][1] or "—") if h in vals else "—" for h in FEAT_SIZES
        ]
        lines.append("| " + " | ".join(sol) + " |")
        lines.append("")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(table)} sweeps")


if __name__ == "__main__":
    main()
