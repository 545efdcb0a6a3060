"""Host-side visualization helpers (t-SNE feature coloring, color maps).

Parity with ``utils/visualization.py``: 1-D t-SNE embedding of point
features normalized to [0, 1] + Spectral color map. Heavy GUI (vedo) lives
in ``corsair_tpu.cli.gui`` and is import-gated; these helpers only need
sklearn/matplotlib and degrade gracefully without them.
"""

from __future__ import annotations

import numpy as np


def embed_tsne(data: np.ndarray) -> np.ndarray:
    """N x D -> N values in [0, 1] (``utils/visualization.py:56-65``)."""
    from sklearn.manifold import TSNE

    tsne = TSNE(n_components=1, verbose=0, perplexity=40,
                max_iter=300, random_state=0)
    results = np.squeeze(tsne.fit_transform(data))
    lo, hi = results.min(), results.max()
    return (results - lo) / max(hi - lo, 1e-12)


def get_color_map(x: np.ndarray) -> np.ndarray:
    """Scalar [0,1] values -> RGB via the Spectral map."""
    try:
        from matplotlib import pyplot as plt

        return plt.cm.Spectral(x)[:, :3]
    except ImportError:
        # simple fallback ramp
        x = np.asarray(x)
        return np.stack([x, 1 - np.abs(x - 0.5) * 2, 1 - x], axis=1)


def feature_colors(features: np.ndarray) -> np.ndarray:
    """Per-point RGB colors from high-dimensional features."""
    return get_color_map(embed_tsne(features))
