"""Table export: pandas MultiIndex -> LaTeX + matplotlib-table SVG.

Reference: Evaluate.make_tables / convert_to_scientific / table_jdet
(evaluate.py:531-602).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def convert_to_scientific(value):
    if isinstance(value, (int, float)) and 0.0 < abs(value) < 0.001:
        return format(value, ".2e")
    return value


def make_tables(df: pd.DataFrame, output_dir, name: str | None = None,
                show: bool = False, fontsize: int = 4) -> str:
    """Write <name>.tex (LaTeX) and <name>.svg (matplotlib table)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    df = df.map(convert_to_scientific)
    latex_table = df.style.to_latex()
    fig, ax = plt.subplots()
    fig.patch.set_visible(False)
    ax.axis("off")
    table = ax.table(
        cellText=df.values, colLabels=[str(c) for c in df.columns],
        rowLabels=[str(i) for i in df.index], loc="center",
    )
    table.auto_set_font_size(False)
    table.set_fontsize(fontsize)
    table.auto_set_column_width(col=list(range(len(df.columns))))
    fig.tight_layout()
    if show:
        print(latex_table)
    if name is not None:
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, f"{name}.tex"), "w+") as f:
            f.writelines(latex_table)
        fig.savefig(os.path.join(output_dir, f"{name}.svg"))
    plt.close(fig)
    return latex_table


def multiindex_table(
    mean_metrics: np.ndarray,
    loader_names: list[str],
    metric_names: list[str],
    index,
) -> pd.DataFrame:
    """(metrics, rows, datasets) nanmean data -> MultiIndex[set, metric]
    dataframe (evaluate.py:1483-1490)."""
    data = mean_metrics.T  # (datasets, rows?, ...) handled by caller
    data = np.concatenate(data, axis=1) if data.ndim == 3 else data
    sets = np.repeat(loader_names, len(metric_names))
    mets = np.tile(metric_names, len(loader_names))
    mux = pd.MultiIndex.from_arrays((sets, mets))
    return pd.DataFrame(data, columns=mux, index=index).round(3)


def table_jdet(
    final_dfs: dict[int, np.ndarray],
    individual_dfs: dict[int, np.ndarray],
    output_dir=None,
    name: str = "",
    save: bool = False,
    fontsize: int = 4,
) -> pd.DataFrame:
    """JDet std + %<=0 for combined(final) and individual dfs per level
    (evaluate.py:569-602). dfs are channels-last (B, *spatial, nd)."""
    from pulpo_tpu.eval.metrics import jdet_leq0_percent
    from pulpo_tpu.ops.losses import jacobian_det

    latent_levels = len(final_dfs)
    data = np.zeros((latent_levels, 4))
    for l in reversed(range(latent_levels)):
        jd = np.asarray(jacobian_det(np.asarray(final_dfs[l])))
        data[l, 0] = jd.std(ddof=1)
        data[l, 1] = jdet_leq0_percent(jd)
        jd = np.asarray(jacobian_det(np.asarray(individual_dfs[l])))
        data[l, 2] = jd.std(ddof=1)
        data[l, 3] = jdet_leq0_percent(jd)

    supcol = np.repeat(["combined DF", "individual DF"], 2)
    subcol = np.tile(["JDet std", "% of pixels <= 0"], 2)
    mux = pd.MultiIndex.from_arrays((supcol, subcol))
    df = pd.DataFrame(data, columns=mux).round(3)
    df.index.name = "Level"
    if save and output_dir is not None:
        make_tables(df, output_dir, name="jdet_" + name, fontsize=fontsize)
    return df
