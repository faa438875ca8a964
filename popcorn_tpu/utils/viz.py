"""Visualization of inputs and prediction maps.

Equivalent of the reference's DDA visualization helpers
(model/DDA_model/utils/visualization.py:13-126): quick-look plots of
optical/SAR composites, built-up probabilities and population maps.
"""

from __future__ import annotations


import numpy as np


def _ax(ax):
    if ax is None:
        import matplotlib.pyplot as plt

        _, ax = plt.subplots(figsize=(6, 6))
    return ax


def plot_optical(s2_rgb: np.ndarray, ax=None, scale_factor: float = 0.4 / 4000):
    """True-colour S2 quicklook; input (H,W,>=3) raw reflectance [R,G,B...]."""
    ax = _ax(ax)
    img = np.clip(s2_rgb[..., :3].astype(np.float32) * scale_factor * 10, 0, 1)
    ax.imshow(img)
    ax.set_axis_off()
    return ax


def plot_sar(s1_vv: np.ndarray, ax=None, vmin: float = -25, vmax: float = 0):
    """Grey SAR backscatter quicklook (dB)."""
    ax = _ax(ax)
    ax.imshow(np.clip(s1_vv, vmin, vmax), cmap="gray", vmin=vmin, vmax=vmax)
    ax.set_axis_off()
    return ax


def plot_probability(prob: np.ndarray, ax=None):
    ax = _ax(ax)
    im = ax.imshow(prob, cmap="viridis", vmin=0, vmax=1)
    ax.set_axis_off()
    return ax


def plot_population(dense: np.ndarray, ax=None, q: float = 99.0):
    """Population-density map with robust upper bound."""
    ax = _ax(ax)
    vmax = np.percentile(dense[dense > 0], q) if (dense > 0).any() else 1.0
    ax.imshow(dense, cmap="magma", vmin=0, vmax=max(vmax, 1e-6))
    ax.set_axis_off()
    return ax


def save_quicklook(path: str, s2=None, s1=None, builtup=None, pop=None):
    """Multi-panel quicklook figure for a sample or a region."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = [(n, a) for n, a in
              [("S2", s2), ("S1 VV", s1), ("built-up", builtup), ("population", pop)]
              if a is not None]
    fig, axs = plt.subplots(1, len(panels), figsize=(5 * len(panels), 5))
    if len(panels) == 1:
        axs = [axs]
    for ax, (name, arr) in zip(axs, panels):
        if name == "S2":
            plot_optical(arr, ax)
        elif name == "S1 VV":
            plot_sar(arr, ax)
        elif name == "built-up":
            plot_probability(arr, ax)
        else:
            plot_population(arr, ax)
        ax.set_title(name)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path
