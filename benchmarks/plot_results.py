"""Stacked-bar latency breakdown chart from a sweep CSV.

Reproduces the reference's logs/benchmark_comparison.png (stacked
H2D/compute/D2H/init bars per algorithm at a chosen grade/size) from our
14-column CSV. Usage:

    python benchmarks/plot_results.py benchmark_results.csv \
        --grade 1 --out logs/benchmark_comparison.png
"""

from __future__ import annotations

import argparse
import csv
import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parents[1]))
from collections import defaultdict
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

PHASES = [
    ("H2D_ms", "host→device"),
    ("Compute_ms", "compute"),
    ("D2H_ms", "device→host"),
    ("Init_ms", "init (cold)"),
]


def load_rows(path, grade=None, memory_mode=None, n_samples=None):
    rows = []
    with open(path) as f:
        for row in csv.DictReader(f):
            if grade is not None and int(row["Grade"]) != grade:
                continue
            if memory_mode and row["MemoryMode"] != memory_mode:
                continue
            if n_samples is not None and int(row["N_Samples"]) != n_samples:
                continue
            rows.append(row)
    return rows


def plot_scaling(csv_path, grade, memory_mode, out):
    """Compute throughput vs input size, one line per algorithm.

    The reference's benchmark_comparison.png core shape (throughput over
    the sweep's size axis); most-recent row wins per (algorithm, N) since
    the CSV is resumable append-mode history.
    """
    rows = load_rows(csv_path, grade, None)
    latest: dict[tuple[str, int], dict] = {}
    for r in rows:
        if r["MemoryMode"] not in (memory_mode, "RAM"):
            continue  # golden_cpu logs mode=RAM; keep it on every panel
        latest[(r["Algorithm"], int(r["N_Samples"]))] = r
    series: dict[str, list[tuple[int, float]]] = defaultdict(list)
    for (algo, n), r in sorted(latest.items()):
        compute_ms = float(r["Compute_ms"])
        if compute_ms > 0:
            series[algo].append((n, n / compute_ms / 1e3))  # MS/s
    if not series:
        raise SystemExit("no matching rows in the CSV")
    fig, ax = plt.subplots(figsize=(7.5, 4.8))
    for algo in sorted(series):
        pts = series[algo]
        ax.plot(
            [n for n, _ in pts], [v for _, v in pts], marker="o", label=algo
        )
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("input samples (N)")
    ax.set_ylabel("compute throughput (MS/s)")
    title = f"throughput vs size ({memory_mode})"
    if grade is not None:
        title += f", grade={grade}"
    ax.set_title(title)
    ax.grid(True, which="both", alpha=0.3)
    ax.legend(fontsize=8)
    fig.tight_layout()
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=120)
    print(f"wrote {out} ({sum(len(v) for v in series.values())} points)")
    return 0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("csv_path")
    p.add_argument("--grade", type=int, default=None)
    p.add_argument("--memory-mode", default="staged")
    p.add_argument("--n-samples", type=int, default=None)
    p.add_argument("--out", default="benchmark_comparison.png")
    p.add_argument(
        "--mode",
        choices=("bars", "scaling"),
        default="bars",
        help="bars = stacked-phase latency at one config; scaling = "
        "throughput vs N lines over the sweep's size axis",
    )
    args = p.parse_args(argv)

    if args.mode == "scaling":
        return plot_scaling(
            args.csv_path, args.grade, args.memory_mode, args.out
        )

    rows = load_rows(args.csv_path, args.grade, args.memory_mode, args.n_samples)
    if not rows:
        rows = load_rows(args.csv_path, args.grade, None, args.n_samples)
    if not rows:
        raise SystemExit("no matching rows in the CSV")

    # average duplicate (algorithm) rows
    acc: dict[str, list[dict]] = defaultdict(list)
    for r in rows:
        acc[r["Algorithm"]].append(r)
    algos = sorted(acc)
    means = {
        a: {k: sum(float(r[k]) for r in acc[a]) / len(acc[a]) for k, _ in PHASES}
        for a in algos
    }

    fig, ax = plt.subplots(figsize=(1.6 * max(len(algos), 4), 4.5))
    bottom = [0.0] * len(algos)
    for key, label in PHASES:
        vals = [means[a][key] for a in algos]
        ax.bar(algos, vals, bottom=bottom, label=label)
        bottom = [b + v for b, v in zip(bottom, vals)]
    ax.set_ylabel("milliseconds")
    title = "latency breakdown"
    if args.grade is not None:
        title += f" (grade={args.grade})"
    ax.set_title(title)
    ax.legend()
    fig.tight_layout()
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out} ({len(rows)} rows, {len(algos)} algorithms)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
