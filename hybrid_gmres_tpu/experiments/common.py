"""Shared experiment utilities: figure saving, history trimming."""

from __future__ import annotations

import os

import numpy as np


def trim(hist, niters):
    """Finite prefix of a NaN-masked history (reference's 1:k truncation)."""
    h = np.asarray(hist)[: int(niters)]
    return h[np.isfinite(h)] if np.isnan(h).any() else h


def save_figure(fig, outdir, name):
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, name)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    return path


def get_pyplot():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt
