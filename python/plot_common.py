"""Shared plotting conventions for the experiment reproduction scripts.

Contract: every plot uses one y-axis, a fixed variant→color mapping (color
follows the entity across all figures, never the series index), a recessive
grid, and direct log scales where the data spans decades. The two-hue pair is
colorblind-safe (blue/orange, ΔE-separated under CVD simulation).
"""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

#: fixed entity colors — never reassigned when a series is filtered out
VARIANT_COLORS = {
    "standard": "#4053d3",  # blue
    "two-pass": "#dd8a3e",  # orange
}
VARIANT_LABELS = {
    "standard": "One-pass (standard)",
    "two-pass": "Two-pass",
}


def style_axes(ax, xlabel: str, ylabel: str, title: str):
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    ax.grid(True, alpha=0.25, linewidth=0.6)
    ax.spines["top"].set_visible(False)
    ax.spines["right"].set_visible(False)


def new_fig():
    return plt.subplots(figsize=(7.0, 4.5), constrained_layout=True)


def save(fig, path):
    fig.savefig(path)
    plt.close(fig)
    print(f"wrote {path}")
