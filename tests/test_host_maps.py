"""Host (C++) coordinate-manager parity vs the device sort-merge builder."""

import jax
import numpy as np
import pytest

from corsair_tpu import runtime
from corsair_tpu.core.coordmap import (
    CoordinateManager,
    build_unet_maps_host,
)
from corsair_tpu.core.voxelize import collate_to_grid, voxelize_np
from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor

pytestmark = pytest.mark.skipif(
    not runtime.available(), reason="native runtime unavailable"
)


def _clouds(rng, n_clouds=2, n_pts=300):
    out = []
    for _ in range(n_clouds):
        pts = rng.randn(n_pts, 3).astype(np.float32)
        _, g, _ = voxelize_np(pts, 0.15)
        out.append(g)
    return out


class TestHostMaps:
    def test_forward_parity(self, rng):
        coords_list = _clouds(rng)
        ex = FeatureExtractor(ExtractorConfig())
        params = ex.init_params(jax.random.PRNGKey(0))
        f_dev, d_dev = ex.extract_batch_np(
            params, coords_list, host_maps=False
        )
        f_host, d_host = ex.extract_batch_np(
            params, coords_list, host_maps=True
        )
        for a, b in zip(f_dev, f_host):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(d_dev, d_host, rtol=1e-4, atol=1e-5)

    def test_table_contents_match(self, rng):
        coords_list = _clouds(rng, n_clouds=1, n_pts=200)
        n = len(coords_list[0])
        cap = n + 11
        grid = collate_to_grid(
            coords_list, [np.ones((n, 1), np.float32)], cap
        )
        dev = CoordinateManager(num_levels=4).build(grid)
        host = build_unet_maps_host(
            coords_list[0].astype(np.int32), np.zeros(n, np.int32), cap,
        )
        for lvl in range(4):
            dl, hl = dev.levels[lvl], host.levels[lvl]
            assert int(np.asarray(dl.valid).sum()) == int(
                np.asarray(hl.valid).sum()
            )
            # same coordinate sets (order may differ between builders)
            dv = np.asarray(dl.coords)[np.asarray(dl.valid)]
            hv = np.asarray(hl.coords)[np.asarray(hl.valid)]
            assert set(map(tuple, dv)) == set(map(tuple, hv))
            # self-table edge sets match modulo the level's row ordering
            d_order = {tuple(c): i for i, c in enumerate(dv)}
            h_to_d = np.asarray([
                d_order[tuple(c)] for c in hv
            ])
            dt = np.asarray(dl.self_table)
            ht = np.asarray(hl.self_table)
            n_d = len(dv)
            edges_d = {
                (k, int(dt[k, i]), i)
                for k in range(27) for i in range(n_d)
                if dt[k, i] < dl.capacity
            }
            edges_h = {
                (k, int(h_to_d[ht[k, j]]), int(h_to_d[j]))
                for k in range(27) for j in range(len(hv))
                if ht[k, j] < hl.capacity
            }
            assert edges_d == edges_h, f"level {lvl}"
