"""Interactive result browser (reference GUI parity, import-gated).

The reference renders a 6-pane vedo window (``evaluation.py:443-635``):
query cloud / predicted closest CAD / predicted farthest CAD / t-SNE
feature coloring / vanilla-RANSAC alignment / symmetry-RANSAC alignment,
with Left/Right navigation. vedo is not available in every deployment, so
this module provides:

* ``VedoResultBrowser`` — the same 6-pane interactive window when vedo is
  importable;
* ``save_result_figures`` — a headless matplotlib fallback writing the
  same six views as PNG files, so results remain inspectable on TPU pods
  without a display.
"""

from __future__ import annotations

import os
import numpy as np

from corsair_tpu.ops.transforms import apply_transform
from corsair_tpu.utils.visualization import feature_colors


def _have_vedo() -> bool:
    try:
        import vedo  # noqa: F401
        return True
    except ImportError:
        return False


def save_result_figures(app, out_dir: str, indices=None,
                        max_points: int = 4000) -> list:
    """Headless six-view dump for query indices (default: first 8)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    if indices is None:
        indices = range(min(8, len(app.base_outputs)))
    paths = []
    for qi in indices:
        fig = plt.figure(figsize=(15, 10))
        pcd = app.base_origins[qi][:max_points]
        T_q = app.base_Ts[qi]
        query_canonical = apply_transform(pcd, np.linalg.inv(T_q))

        dists = np.linalg.norm(
            app.base_feats[qi][None] - app.lib_feats, axis=1
        )
        pos_idx = int(np.argmin(dists))
        neg_idx = int(np.argmax(dists))

        views = [
            ("Query Point Cloud", [(query_canonical, "red")]),
            ("Predicted Closest CAD PC",
             [(query_canonical, "red"),
              (app.lib_origins[pos_idx][:max_points], "green")]),
            ("Predicted Farthest CAD PC",
             [(query_canonical, "red"),
              (app.lib_origins[neg_idx][:max_points], "blue")]),
        ]
        # feature coloring pane
        all_pts = np.concatenate([
            pcd, app.lib_origins[pos_idx][:max_points] + [2, 0, 0]
        ])
        all_feats = np.concatenate([
            app.base_outputs[qi][:max_points],
            app.lib_outputs[pos_idx][:max_points],
        ])
        colors = feature_colors(all_feats)

        reg_views = []
        if hasattr(app, "results") and app.results is not None:
            tgt = app.stat[
                "top1_predict" if app.config.register_top1 else "gt"
            ][qi]
            cad_pts = app.lib_origins[tgt][:max_points]
            for name, T in (
                ("Registration (Vanilla RANSAC)",
                 app.results.Ts_est_ransac[qi]),
                ("Registration (Symmetry RANSAC)",
                 app.results.Ts_est_best[qi]),
            ):
                moved = apply_transform(pcd, T)
                reg_views.append(
                    (name, [(moved, "red"), (cad_pts, "green")])
                )

        panes = views + [("Point features coloring", None)] + reg_views
        for i, (title, content) in enumerate(panes[:6], start=1):
            ax = fig.add_subplot(2, 3, i, projection="3d")
            ax.set_title(title, fontsize=9)
            if content is None:
                ax.scatter(all_pts[:, 0], all_pts[:, 1], all_pts[:, 2],
                           c=colors, s=1)
            else:
                for pts, color in content:
                    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=color,
                               s=1)
            ax.set_axis_off()
        path = os.path.join(out_dir, f"query_{qi:04d}.png")
        fig.savefig(path, dpi=100, bbox_inches="tight")
        plt.close(fig)
        paths.append(path)
    return paths


class VedoResultBrowser:
    """Interactive 6-pane browser (requires vedo + a display)."""

    def __init__(self, app):
        if not _have_vedo():
            raise ImportError(
                "vedo is not installed; use save_result_figures() for the "
                "headless fallback"
            )
        import vedo

        self.app = app
        self.vedo = vedo
        self.idx = 0
        nx, ny, dx, dy = 3, 2, 0.01, 0.01
        ux = (1 - (nx + 1) * dx) / nx
        uy = (1 - (ny + 1) * dy) / ny
        xs = np.linspace(dx, 1, nx, endpoint=False)
        ys = np.linspace(dy, 1, ny, endpoint=False)[::-1]
        shape = [dict(bottomleft=(0, 0), topright=(1, 1), bg="k1")]
        for j in range(ny):
            for i in range(nx):
                shape.append(dict(
                    bottomleft=(xs[i], ys[j]),
                    topright=(xs[i] + ux, ys[j] + uy), bg="w",
                ))
        self.plotter = vedo.Plotter(shape=shape, sharecam=False,
                                    size=(1800, 1000))
        self.plotter.add_callback("KeyPress", self._on_key)

    def _on_key(self, event):
        if event.keypress == "Right":
            self.idx = min(self.idx + 1, len(self.app.base_outputs) - 1)
        elif event.keypress == "Left":
            self.idx = max(self.idx - 1, 0)
        elif event.keypress == "q":
            self.plotter.close()
            return
        self._render()

    def _render(self):
        vedo = self.vedo
        app, qi = self.app, self.idx
        pcd = app.base_origins[qi]
        T_q = app.base_Ts[qi]
        q_pts = vedo.Points(
            apply_transform(pcd, np.linalg.inv(T_q))
        ).color("red")
        dists = np.linalg.norm(
            app.base_feats[qi][None] - app.lib_feats, axis=1
        )
        pos = vedo.Points(
            app.lib_origins[int(np.argmin(dists))]
        ).color("green")
        neg = vedo.Points(
            app.lib_origins[int(np.argmax(dists))]
        ).color("blue")
        for pane in range(1, 7):
            self.plotter.at(pane).clear()
        self.plotter.at(1).add(q_pts)
        self.plotter.at(2).add(q_pts, pos)
        self.plotter.at(3).add(q_pts, neg)
        if hasattr(app, "results") and app.results is not None:
            tgt = app.stat[
                "top1_predict" if app.config.register_top1 else "gt"
            ][qi]
            cad = vedo.Points(app.lib_origins[tgt]).color("green")
            self.plotter.at(5).add(
                vedo.Points(apply_transform(
                    pcd, app.results.Ts_est_ransac[qi]
                )).color("red"), cad,
            )
            self.plotter.at(6).add(
                vedo.Points(apply_transform(
                    pcd, app.results.Ts_est_best[qi]
                )).color("red"), cad,
            )
        self.plotter.render()

    def show(self):
        self._render()
        self.plotter.at(0).show(interactive=True)
