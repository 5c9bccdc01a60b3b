"""Analysis + plotting layer (reference L6: blocking_barplots.py,
multiplication_barplots.py, images_utils.py).

Derived metrics follow the reference definitions exactly
(blocking_barplots.py:148-162, multiplication_barplots.py:515):
  density            = nnz / (rows*cols)
  block_density      = nnz / VBR_nzcount
  dense-amp          = block_density / density
  relative-dense-amp = block_density / block_density(natural blocking)
  GFLOPs             = b_cols * VBR_nzcount / (avg_time_multiply * 1e9)
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd


def load_results(csv_path: str | Path) -> pd.DataFrame:
    df = pd.read_csv(csv_path)
    df = df.loc[:, ~df.columns.str.match("Unnamed")]
    return df


def add_derived_metrics(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["density"] = df["nonzeros"] / (df["rows"] * df["cols"])
    df["block_density"] = df["nonzeros"] / df["VBR_nzcount"].replace(0, np.nan)
    df["dense_amp"] = df["block_density"] / df["density"]
    df["GFLOPs"] = df["b_cols"] * df["VBR_nzcount"] / (
        df["avg_time_multiply"].replace(0, np.nan) * 1e9
    )
    # relative dense-amp vs natural blocking of the same (matrix, block size)
    nat = (
        df[df["blocking_algo"] == 2]
        .groupby(["matrix", "row_block_size", "col_block_size"])["block_density"]
        .max()
        .rename("natural_block_density")
    )
    df = df.merge(nat, on=["matrix", "row_block_size", "col_block_size"], how="left")
    df["relative_dense_amp"] = df["block_density"] / df["natural_block_density"]
    return df


def geomean_improvement(df: pd.DataFrame, metric: str = "relative_dense_amp"):
    """Geomean + best-method counts across reordering methods (reference
    images_utils.py:31-62)."""
    vals = df[metric].dropna()
    return float(np.exp(np.log(vals[vals > 0]).mean())) if len(vals) else float("nan")


def speedup_table(df: pd.DataFrame, baseline_algo: int = 2) -> pd.DataFrame:
    """Per-matrix speedups vs a baseline multiplication algo (the reference's
    'Speed-up against CSR' heatmaps)."""
    base = (
        df[df["multiplication_algo"] == baseline_algo]
        .groupby(["matrix", "b_cols"])["avg_time_multiply"]
        .min()
        .rename("baseline_ms")
    )
    out = df.merge(base, on=["matrix", "b_cols"], how="left")
    out["speedup_vs_baseline"] = out["baseline_ms"] / out["avg_time_multiply"]
    return out


def plot_blocking_quality(df: pd.DataFrame, out_png: str | Path) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    df = add_derived_metrics(df)
    fig, ax = plt.subplots(figsize=(8, 4.5))
    for algo, grp in df.groupby("blocking_algo"):
        g = grp.groupby("tau")["dense_amp"].mean()
        ax.plot(g.index, g.values, marker="o", label=f"algo {algo}")
    ax.set_xlabel("tau")
    ax.set_ylabel("density amplification")
    ax.set_title("Blocking quality vs merge threshold")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    plt.close(fig)


def plot_spmm_times(df: pd.DataFrame, out_png: str | Path) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 4.5))
    for algo, grp in df.groupby("multiplication_algo"):
        g = grp.groupby("b_cols")["avg_time_multiply"].mean()
        ax.plot(g.index, g.values, marker="s", label=f"-M {algo}")
    ax.set_xlabel("B columns")
    ax.set_ylabel("SpMM time (ms)")
    ax.set_xscale("log", base=2)
    ax.set_yscale("log")
    ax.set_title("SpMM time by backend")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    plt.close(fig)


def plot_speedup_heatmap(df: pd.DataFrame, out_png: str | Path,
                         baseline_exp: str = "CSR") -> None:
    """Method x matrix heatmap of speedup vs a baseline bundle — the
    reference's images/*heatmap_Speed-up against {CSR,cuSparse}* analog."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    d = df.copy()
    d["matrix"] = d["matrix"].map(lambda p: Path(str(p)).stem)
    # best (min) time per (bundle, matrix): sweep grids produce several
    # rows per cell (taus, block sizes)
    best = (
        d.groupby(["exp_name", "matrix"])["avg_time_multiply"].min()
    )
    base = best.loc[baseline_exp]
    methods = [e for e in d["exp_name"].unique() if e != baseline_exp]
    matrices = sorted(base.index.unique())
    grid = np.full((len(methods), len(matrices)), np.nan)
    for i, exp in enumerate(methods):
        sub = best.loc[exp]
        for j, mat in enumerate(matrices):
            if mat in sub.index and mat in base.index:
                t = float(sub.loc[mat])
                if t > 0:
                    grid[i, j] = float(base.loc[mat]) / t

    fig, ax = plt.subplots(
        figsize=(1.6 + 1.1 * len(matrices), 1.2 + 0.55 * len(methods)))
    im = ax.imshow(np.log10(grid), cmap="RdYlGn", aspect="auto",
                   vmin=-1, vmax=3)
    ax.set_xticks(range(len(matrices)), matrices, rotation=30, ha="right")
    ax.set_yticks(range(len(methods)), methods)
    for i in range(len(methods)):
        for j in range(len(matrices)):
            if np.isfinite(grid[i, j]):
                ax.text(j, i, f"{grid[i, j]:.1f}x", ha="center", va="center",
                        fontsize=8)
    ax.set_title(f"Speed-up against {baseline_exp}")
    fig.colorbar(im, ax=ax, label="log10 speedup")
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    plt.close(fig)
