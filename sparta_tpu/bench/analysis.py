"""Method-comparison analysis layer.

Re-design of the reference's ~1550-LoC pandas machinery
(utils/images_utils.py:31-62, images_utils_2.py, src/scripts/curves_plots.py):
compare reordering METHODS (original / similarity-reordered / external
orderings like degree-sort or RCM) across a matrix set:

- best_per_matrix   : best row per (method, matrix) by a metric
- geomean_improvements : per-method geomean of original/method ratio over
  the COMMON matrix set (images_utils.py:49-60 calculate_improvement)
- best_method_counts : how often each method wins, ties to "original"
  (images_utils.py:31-47 count_best_method)
- plot_method_comparison / plot_improvement_violin / plot_tau_curves :
  the blocking_images / multiplication_images figure analogs
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd


def _method_col(df: pd.DataFrame) -> str:
    return "method" if "method" in df.columns else "exp_name"


def best_per_matrix(
    df: pd.DataFrame, metric: str, minimize: bool = True
) -> pd.DataFrame:
    """Best (min or max) row per (method, matrix) by ``metric``."""
    d = df.copy()
    d["matrix"] = d["matrix"].map(lambda p: Path(str(p)).stem)
    mcol = _method_col(d)
    d = d[np.isfinite(d[metric]) & (d[metric] > 0)]
    idx = (
        d.groupby([mcol, "matrix"])[metric].idxmin()
        if minimize
        else d.groupby([mcol, "matrix"])[metric].idxmax()
    )
    return d.loc[idx.values]


def _common_matrices(best: pd.DataFrame) -> list[str]:
    mcol = _method_col(best)
    sets = [set(g["matrix"]) for _, g in best.groupby(mcol)]
    return sorted(set.intersection(*sets)) if sets else []


def geomean_improvements(
    df: pd.DataFrame, metric: str = "VBR_nzcount",
    baseline: str = "original", minimize: bool = True,
) -> dict[str, float]:
    """Per-method geomean of baseline/method metric ratio over the common
    matrix set (ratio > 1 = method better when minimizing)."""
    best = best_per_matrix(df, metric, minimize)
    mcol = _method_col(best)
    common = _common_matrices(best)
    base = (
        best[best[mcol] == baseline].set_index("matrix")[metric].loc[common]
    )
    out = {}
    for method, g in best.groupby(mcol):
        vals = g.set_index("matrix")[metric].loc[common]
        ratio = (base / vals) if minimize else (vals / base)
        ratio = ratio[np.isfinite(ratio) & (ratio > 0)]
        out[str(method)] = float(np.exp(np.log(ratio).mean())) if len(ratio) else float("nan")
    return out


def best_method_counts(
    df: pd.DataFrame, metric: str = "VBR_nzcount",
    baseline: str = "original", minimize: bool = True,
) -> dict[str, int]:
    """How many matrices each method wins on; ties awarded to the baseline
    (reference sorts 'original' first, images_utils.py:40)."""
    best = best_per_matrix(df, metric, minimize)
    mcol = _method_col(best)
    common = _common_matrices(best)
    counts = {str(m): 0 for m in best[mcol].unique()}
    for mat in common:
        sub = best[best["matrix"] == mat]
        # baseline first so exact ties go to it
        sub = sub.sort_values(mcol, key=lambda s: s != baseline, kind="stable")
        row = sub.loc[sub[metric].idxmin() if minimize else sub[metric].idxmax()]
        counts[str(row[mcol])] += 1
    return counts


def method_comparison_table(
    df: pd.DataFrame, metric: str = "VBR_nzcount",
    baseline: str = "original", minimize: bool = True,
) -> pd.DataFrame:
    """One row per method: geomean improvement vs baseline + win count."""
    g = geomean_improvements(df, metric, baseline, minimize)
    c = best_method_counts(df, metric, baseline, minimize)
    return pd.DataFrame(
        {"method": list(g), "geomean_improvement": [g[k] for k in g],
         "best_count": [c.get(k, 0) for k in g]}
    ).sort_values("geomean_improvement", ascending=False, ignore_index=True)


# ------------------------------------------------------------------ figures
def _agg_backend():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_method_comparison(
    df: pd.DataFrame, out_png: str | Path, metric: str = "VBR_nzcount",
    baseline: str = "original", minimize: bool = True,
) -> None:
    """Bars: per-method geomean improvement (left) + win counts (right)."""
    plt = _agg_backend()
    table = method_comparison_table(df, metric, baseline, minimize)
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
    ax1.bar(table["method"], table["geomean_improvement"], color="#4878d0")
    ax1.axhline(1.0, color="k", lw=0.8, ls="--")
    ax1.set_ylabel(f"geomean {baseline}/{metric} ratio")
    ax1.set_title("Geomean improvement")
    ax1.tick_params(axis="x", rotation=30)
    ax2.bar(table["method"], table["best_count"], color="#ee854a")
    ax2.set_ylabel("matrices won")
    ax2.set_title(f"Best method count ({metric})")
    ax2.tick_params(axis="x", rotation=30)
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    plt.close(fig)


def plot_improvement_violin(
    df: pd.DataFrame, out_png: str | Path, metric: str = "VBR_nzcount",
    baseline: str = "original", minimize: bool = True,
) -> None:
    """Violin of the per-matrix improvement distribution per method
    (the reference's seaborn violins, images_utils_2.py)."""
    plt = _agg_backend()
    best = best_per_matrix(df, metric, minimize)
    mcol = _method_col(best)
    common = _common_matrices(best)
    base = best[best[mcol] == baseline].set_index("matrix")[metric].loc[common]
    methods, data = [], []
    for method, g in best.groupby(mcol):
        if method == baseline:
            continue
        vals = g.set_index("matrix")[metric].loc[common]
        ratio = (base / vals) if minimize else (vals / base)
        ratio = ratio[np.isfinite(ratio) & (ratio > 0)]
        if len(ratio):
            methods.append(str(method))
            data.append(np.log2(ratio.values))
    fig, ax = plt.subplots(figsize=(2 + 1.6 * max(len(methods), 1), 4.2))
    if data:
        ax.violinplot(data, showmedians=True)
        ax.set_xticks(range(1, len(methods) + 1), methods, rotation=30)
    ax.axhline(0.0, color="k", lw=0.8, ls="--")
    ax.set_ylabel(f"log2( {baseline} / method ) on {metric}")
    ax.set_title("Per-matrix improvement distribution")
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    plt.close(fig)


def plot_tau_curves(
    df: pd.DataFrame, out_png: str | Path, metric: str = "VBR_nzblocks_count",
) -> None:
    """Per-matrix curves of ``metric`` vs tau, one panel per block size
    (reference src/scripts/curves_plots.py:64-145)."""
    plt = _agg_backend()
    d = df.copy()
    d["matrix"] = d["matrix"].map(lambda p: Path(str(p)).stem)
    d = d[d["tau"] > 0]
    blocks = sorted(d["row_block_size"].unique())
    fig, axes = plt.subplots(
        1, max(len(blocks), 1), figsize=(4.5 * max(len(blocks), 1), 4),
        squeeze=False,
    )
    for ax, b in zip(axes[0], blocks):
        sub = d[d["row_block_size"] == b]
        for mat, g in sub.groupby("matrix"):
            g = g.sort_values("tau")
            ax.plot(g["tau"], g[metric], marker="o", ms=3, label=mat)
        ax.set_xscale("log")
        ax.set_xlabel("tau")
        ax.set_ylabel(metric)
        ax.set_title(f"block {b}")
        if sub["matrix"].nunique() <= 10:
            ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    plt.close(fig)
