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


# ---- point-cloud viewers (``utils/visualize.py`` parity) -------------
#
# The reference's Open3D/Jupyter viewers (``visualize_pc``,
# ``visualize_path``, ``Jvisualize``, ``visual_retrieval``,
# ``visual_pose``, utils/visualize.py:29-118) are re-homed on
# matplotlib 3-D scatter (headless-safe: pass ``out`` to save a PNG
# instead of opening a window). The interactive vedo browser lives in
# ``corsair_tpu.cli.gui``.

_COLORS_DICT = {
    "BLACK": np.array([0.0, 0.0, 0.0]),
    "RED": np.array([1.0, 0.0, 0.0]),
    "GREEN": np.array([0.0, 1.0, 0.0]),
    "BLUE": np.array([0.0, 0.0, 1.0]),
}


def visualize_pc(pcs, colors=None, txt="", out=None, max_points=20000):
    """Scatter a list of [N, 3] clouds in one 3-D axes.

    ``colors``: optional list of RGB triples or color names; defaults to
    a gray ramp like the reference. ``out``: path to save a PNG
    (headless); otherwise ``plt.show()``.
    """
    import matplotlib

    if out is not None:
        matplotlib.use("Agg", force=False)
    from matplotlib import pyplot as plt

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    for idx, pc in enumerate(pcs):
        pc = np.asarray(pc)
        if len(pc) > max_points:
            pc = pc[np.linspace(0, len(pc) - 1, max_points).astype(int)]
        if colors is not None:
            c = colors[idx]
            c = _COLORS_DICT[c] if isinstance(c, str) else np.asarray(c)
        else:
            c = np.ones(3) * idx / max(len(pcs), 1)
        ax.scatter(pc[:, 0], pc[:, 1], pc[:, 2], s=1,
                   color=np.clip(c, 0, 1))
    ax.set_title(txt)
    if out is not None:
        fig.savefig(out, dpi=120)
        plt.close(fig)
        return out
    plt.show()
    return None


def visualize_path(root, paths, random_rot=False, colors=None,
                   txt="clouds", samples=2000, out=None, rng=None):
    """Load + normalize clouds by path and scatter them
    (``utils/visualize.py:47-62``)."""
    import os

    from corsair_tpu.data.readers import load_norm_pc
    from corsair_tpu.ops.transforms import random_rotation

    pcs = []
    for path in paths:
        pc = load_norm_pc(os.path.join(root, path), samples)
        if random_rot:
            pc, _ = random_rotation(pc, rng)
        pcs.append(pc)
    return visualize_pc(pcs, colors=colors, txt=txt, out=out)


def visual_retrieval(idx0, idx1, dataset, out=None):
    """Overlay a query/retrieved pair in their canonical frames
    (``utils/visualize.py:91-108``)."""
    from corsair_tpu.ops.transforms import apply_transform

    data_a = dataset[idx0][0]
    data_ret = dataset[idx1][0]
    a = apply_transform(data_a["origin"], np.linalg.inv(data_a["T"]))
    ret = apply_transform(data_ret["origin"],
                          np.linalg.inv(data_ret["T"]))
    return visualize_pc([a, ret], colors=["RED", "GREEN"],
                        txt="retrieval", out=out)


def visual_pose(raw_pc0, raw_pc1, T_est, T0, T1, out=None):
    """Overlay an estimated alignment in the target's canonical frame
    (``utils/visualize.py:111-118``)."""
    from corsair_tpu.ops.transforms import apply_transform

    inv_t1 = np.linalg.inv(T1)
    xyz0 = apply_transform(apply_transform(raw_pc0, T_est), inv_t1)
    xyz1 = apply_transform(raw_pc1, inv_t1)
    return visualize_pc([xyz0, xyz1], colors=["RED", "GREEN"],
                        txt="pose", out=out)


# ---- symmetry/correspondence debug views (``utils/symmetry.py:36-143``)


def sample_line(p0, p1, sample_num=100):
    """[3, sample_num+1] points interpolating p1 -> p0
    (``utils/symmetry.py:36-42``)."""
    d = np.asarray(p0) - np.asarray(p1)
    return (np.asarray(p1)[:, None]
            + d[:, None] * np.arange(sample_num + 1) / sample_num)


def draw_alignment_lines(feat0, feat1, xyz0, xyz1, T0, T1,
                         horizon_shift=0.0, n_lines=30, out=None):
    """Draw predicted feature matches as lines between the two aligned
    clouds (``utils/symmetry.py:45-81``)."""
    import matplotlib

    if out is not None:
        matplotlib.use("Agg", force=False)
    from matplotlib import pyplot as plt

    from corsair_tpu.ops.transforms import apply_transform

    feat0 = np.asarray(feat0)
    feat1 = np.asarray(feat1)
    match = np.argmin(
        np.linalg.norm(feat1[None, :, :] - feat0[:n_lines, None, :],
                       axis=2), axis=1)
    a = apply_transform(np.asarray(xyz0), np.linalg.inv(T0))
    a = a + np.array([horizon_shift, 0.0, 0.0])
    b = apply_transform(np.asarray(xyz1), np.linalg.inv(T1))

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(a[:, 0], a[:, 1], a[:, 2], s=1, color=(1, 0, 0))
    ax.scatter(b[:, 0], b[:, 1], b[:, 2], s=1, color=(0, 1, 0))
    for i in range(min(n_lines, len(match))):
        ln = sample_line(a[i], b[match[i]])
        ax.plot(ln[0], ln[1], ln[2], color="black", linewidth=0.5)
    if out is not None:
        fig.savefig(out, dpi=120)
        plt.close(fig)
        return out
    plt.show()
    return None


def generate_heat_map(raw_pc, feat, T, index, out=None):
    """Cosine-similarity rank heat map of one point's local feature
    against the whole cloud (``utils/symmetry.py:83-100``)."""
    import matplotlib

    if out is not None:
        matplotlib.use("Agg", force=False)
    from matplotlib import cm
    from matplotlib import pyplot as plt

    from corsair_tpu.ops.transforms import apply_transform

    f = np.asarray(feat, np.float64)
    f = f / np.maximum(np.linalg.norm(f, axis=1, keepdims=True), 1e-12)
    dist = 1.0 - f @ f[index]
    rank = np.empty(len(dist))
    rank[np.argsort(-dist)] = np.arange(len(dist))
    colors = cm.ScalarMappable(cmap="hot").to_rgba(rank)[:, :3]

    pc = apply_transform(np.asarray(raw_pc), np.linalg.inv(T))
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(pc[:, 0], pc[:, 1], pc[:, 2], s=1, c=colors)
    ax.scatter(*pc[index], s=40, color="black")
    if out is not None:
        fig.savefig(out, dpi=120)
        plt.close(fig)
        return out
    plt.show()
    return None


def visual_symmetry_points(feat, raw_pc, i, T, out=None):
    """Highlight the feature-nearest points of one query and return the
    2-means midpoint of the top-100 set (``utils/symmetry.py:103-143``)."""
    import matplotlib

    if out is not None:
        matplotlib.use("Agg", force=False)
    from matplotlib import pyplot as plt

    from corsair_tpu.ops.kmeans import kmeans_lloyd
    from corsair_tpu.ops.transforms import apply_transform

    f = np.asarray(feat, np.float64)
    f = f / np.maximum(np.linalg.norm(f, axis=1, keepdims=True), 1e-12)
    dist = 1.0 - f @ f[i]
    rank = np.empty(len(dist))
    rank[np.argsort(dist)] = np.arange(len(dist))

    colors = np.zeros((len(dist), 3))
    colors[rank >= 200] = np.array([1.0, 0.0, 0.0])
    pc = apply_transform(np.asarray(raw_pc), np.linalg.inv(T))
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(pc[:, 0], pc[:, 1], pc[:, 2], s=1, c=colors)
    if out is not None:
        fig.savefig(out, dpi=120)
        plt.close(fig)
    else:
        plt.show()

    nns = np.asarray(raw_pc)[rank < 100]
    import jax
    import jax.numpy as jnp

    pts = jnp.asarray(nns.astype(np.float32))
    centers = kmeans_lloyd(jax.random.PRNGKey(0), pts,
                           jnp.ones(len(nns), bool), 2)[0]
    return np.mean(np.asarray(centers), axis=0)
