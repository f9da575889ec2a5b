"""Render docs/FULL_SUITE_TPU.md from a generate_result.py output dir.

Keeps the published suite table mechanically in sync with the recorded
results: merges ``results.json`` with the V100 baseline map
(``benchmarks/generate_result.py``), adds the ratio column, and stamps the
chip-health probe so readers can judge how degraded the shared pool was.

Usage: python tools/suite_table.py RESULTS_DIR [--health MS] [--out PATH]
With ``--merge PREV.json`` the best (lowest) epoch time per workload across
runs is kept — the min-over-windows protocol the shared pool requires (the
same code measures up to 100x apart depending on pool load; see
docs/DESIGN_NOTES.md).
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(HERE), "benchmarks"))

from generate_result import BASELINE_EPOCH_S  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("results_dir")
    ap.add_argument("--health", type=float, default=None,
                    help="chip_health_ms() measured near the run (1ms = healthy)")
    ap.add_argument("--out", default=None, help="write markdown here")
    ap.add_argument("--merge", default=None,
                    help="previous results.json; keep per-workload min epoch time")
    args = ap.parse_args()

    with open(os.path.join(args.results_dir, "results.json")) as f:
        rows = json.load(f)
    if args.merge:
        with open(args.merge) as f:
            prev = {r["workload"]: r for r in json.load(f)}
        for r in rows:
            p = prev.get(r["workload"])
            if p and p.get("time_per_epoch") and (
                not r.get("time_per_epoch")
                or p["time_per_epoch"] < r["time_per_epoch"]
            ):
                r["time_per_epoch"] = p["time_per_epoch"]
            if p and p.get("final_test") and not r.get("final_test"):
                r["final_test"] = p["final_test"]
        # a workload present only in the previous file (deleted from the
        # live results for a re-measure that never got a window) still
        # belongs in the published table — carry it over as-is
        have = {r["workload"] for r in rows}
        rows += [p for w, p in prev.items() if w not in have]

    lines = [
        "| workload | epoch (s) | V100 DGL baseline (s) | ratio | "
        "final test (synthetic) | status | note |",
        "|---|---|---|---|---|---|---|",
    ]
    order = {w: i for i, w in enumerate(
        ["cora_sage", "pubmed_sage", "reddit_sage", "arxiv_sage",
         "products_sage", "cora_gat", "pubmed_gat", "reddit_gat", "arxiv_gat",
         "proteins_rgcn", "enzymes_gcn", "molhiv_gcn", "ppa_gcn",
         "gcmc_ml100k", "ns_sage_reddit", "ns_gat_reddit",
         "cluster_sage_products", "cluster_gat_products", "cluster_lp_arxiv"])}
    for r in sorted(rows, key=lambda r: order.get(r["workload"], 99)):
        t = r.get("time_per_epoch")
        base = BASELINE_EPOCH_S.get(r["workload"])
        ratio = f"{base / t:.2f}x" if (base and t) else "-"
        lines.append(
            "| {} | {} | {} | {} | {} | {} | {} |".format(
                r["workload"],
                f"{t:.4f}" if t else "-",
                base if base else "-",
                ratio,
                r.get("final_test") if r.get("final_test") is not None else "-",
                r.get("status", "?"),
                r.get("note") or "",
            )
        )
    header = [
        "# Full-protocol suite results on TPU",
        "",
        time.strftime("Recorded %Y-%m-%d") + (
            f" — chip health probe {args.health:.0f} ms "
            "(healthy v5e = ~1 ms; the shared pool degrades up to ~100x, so "
            "epoch times are upper bounds)" if args.health else ""
        ),
        "",
        "`benchmarks/generate_result.py --suite full` — reference protocol "
        "(epoch counts, --eval accuracy, last-10 mean epoch time; big rows "
        "cap runs/epochs per the WORKLOADS table). Accuracies are on the "
        "synthetic fallback data (zero-egress environment) and gate that "
        "the full stack learns, not reference parity.",
        "",
    ]
    md = "\n".join(header + lines) + "\n"
    if args.out:
        with open(args.out, "w") as f:
            f.write(md)
        print("wrote", args.out)
    else:
        print(md)


if __name__ == "__main__":
    main()
