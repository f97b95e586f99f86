"""Plot the bench-matrix CSVs (the analog of the reference's
mpc-snarks/analysis/ plotting): prove wall vs scheme / vs party count.

    python analysis/plot.py analysis/data/matrix.csv -o analysis/plots/
"""

from __future__ import annotations

import argparse
import csv
import os
from collections import defaultdict

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csvs", nargs="+")
    ap.add_argument("-o", "--outdir", default="analysis/plots")
    args = ap.parse_args()
    rows = []
    for path in args.csvs:
        with open(path) as f:
            rows.extend(csv.DictReader(f))
    os.makedirs(args.outdir, exist_ok=True)

    # prove time by scheme, one figure per system
    by_system = defaultdict(list)
    for r in rows:
        by_system[r["system"]].append(r)
    for system, rs in by_system.items():
        fig, ax = plt.subplots(figsize=(6, 4))
        # group by size
        sizes = sorted({int(r["size_log2"]) for r in rs})
        algs = sorted({r["alg"] for r in rs})
        width = 0.8 / max(1, len(algs))
        for i, alg in enumerate(algs):
            xs, ys = [], []
            for j, s in enumerate(sizes):
                t = [float(r["prove_s"]) for r in rs
                     if r["alg"] == alg and int(r["size_log2"]) == s]
                if t:
                    xs.append(j + i * width)
                    ys.append(min(t))
            ax.bar(xs, ys, width=width, label=alg)
        ax.set_xticks([j + 0.4 for j in range(len(sizes))])
        ax.set_xticklabels([f"2^{s}" for s in sizes])
        ax.set_ylabel("prove wall (s)")
        ax.set_title(f"{system}: prove time by scheme (stacked-sim CPU)")
        ax.legend()
        fig.tight_layout()
        out = os.path.join(args.outdir, f"{system}_prove.png")
        fig.savefig(out, dpi=120)
        print("wrote", out)

    # N-party scaling (if parties vary)
    parties = sorted({int(r["parties"]) for r in rows})
    if len(parties) > 1:
        fig, ax = plt.subplots(figsize=(6, 4))
        for (system, alg) in sorted({(r["system"], r["alg"]) for r in rows}):
            pts = sorted(
                (int(r["parties"]), float(r["prove_s"]))
                for r in rows
                if r["system"] == system and r["alg"] == alg
                and len([x for x in rows if x["system"] == system
                         and x["alg"] == alg]) > 1
            )
            if len(pts) > 1:
                ax.plot([p for p, _ in pts], [t for _, t in pts],
                        marker="o", label=f"{system}/{alg}")
        ax.set_xlabel("parties")
        ax.set_ylabel("prove wall (s)")
        ax.set_title("N-party scaling (stacked-sim: all parties serial)")
        ax.legend()
        fig.tight_layout()
        out = os.path.join(args.outdir, "nparty.png")
        fig.savefig(out, dpi=120)
        print("wrote", out)


if __name__ == "__main__":
    main()
