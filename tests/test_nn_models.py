"""Model-level tests: ResUNet forward, heads, registry, converter, pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corsair_tpu.core.coordmap import CoordinateManager
from corsair_tpu.core.voxelize import collate_to_grid, voxelize_np
from corsair_tpu.nn import heads, resunet, simpleunet
from corsair_tpu.nn.registry import MODELS, load_model
from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor


def _make_grid(rng, n_clouds=2, n_pts=400, cap=1024):
    coords_list, feats_list = [], []
    for _ in range(n_clouds):
        pts = rng.randn(n_pts, 3).astype(np.float32)
        _, grid, _ = voxelize_np(pts, 0.15)
        coords_list.append(grid)
        feats_list.append(np.ones((len(grid), 1), np.float32))
    return collate_to_grid(coords_list, feats_list, cap), coords_list


class TestResUNetForward:
    def test_shapes_and_finite(self, rng):
        grid, coords_list = _make_grid(rng)
        cfg = resunet.make_config("ResUNetBN2C", in_channels=1,
                                  out_channels=16, normalize_feature=True)
        params = resunet.init_params(jax.random.PRNGKey(0), cfg)
        maps = CoordinateManager(num_levels=4).build(grid)
        feats, bottleneck = resunet.forward(params, grid, maps, cfg)
        assert feats.shape == (grid.capacity, 16)
        assert bottleneck.shape[1] == 256
        feats = np.asarray(feats)
        valid = np.asarray(grid.valid)
        assert np.isfinite(feats).all()
        # normalized rows for valid voxels
        norms = np.linalg.norm(feats[valid], axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)
        # padding rows zero
        np.testing.assert_allclose(feats[~valid], 0, atol=1e-6)

    def test_padding_invariance(self, rng):
        """Extra padding rows must not change valid outputs."""
        pts = rng.randn(300, 3).astype(np.float32)
        _, gridc, _ = voxelize_np(pts, 0.15)
        n = len(gridc)
        feats = [np.ones((n, 1), np.float32)]
        cfg = resunet.make_config("ResUNetBN2C", in_channels=1,
                                  out_channels=16, normalize_feature=True)
        params = resunet.init_params(jax.random.PRNGKey(1), cfg)

        outs = []
        for cap in (n + 7, 2 * n):
            grid = collate_to_grid([gridc], feats, cap)
            maps = CoordinateManager(num_levels=4).build(grid)
            out, _ = resunet.forward(params, grid, maps, cfg)
            outs.append(np.asarray(out)[:n])
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-4, atol=1e-5)

    def test_batch_invariance(self, rng):
        """A cloud's features must not depend on its batch neighbors
        (eval-mode BN uses running stats)."""
        grid2, coords_list = _make_grid(rng, n_clouds=2, cap=1024)
        cfg = resunet.make_config("ResUNetBN2C", in_channels=1,
                                  out_channels=16, normalize_feature=True)
        params = resunet.init_params(jax.random.PRNGKey(2), cfg)
        maps2 = CoordinateManager(num_levels=4).build(grid2)
        out2, _ = resunet.forward(params, grid2, maps2, cfg)
        out2 = np.asarray(out2)
        b = np.asarray(grid2.batch)
        v = np.asarray(grid2.valid)

        n0 = len(coords_list[0])
        grid1 = collate_to_grid(
            [coords_list[0]], [np.ones((n0, 1), np.float32)], 512
        )
        maps1 = CoordinateManager(num_levels=4).build(grid1)
        out1, _ = resunet.forward(params, grid1, maps1, cfg)
        out1 = np.asarray(out1)[:n0]

        np.testing.assert_allclose(out2[(b == 0) & v], out1, rtol=1e-3,
                                   atol=1e-4)


class TestHeads:
    def test_conv1_max_embedding(self, rng):
        n, B = 64, 2
        feats = rng.randn(n, 256).astype(np.float32)
        batch = np.repeat(np.arange(B), n // B).astype(np.int32)
        valid = np.ones(n, bool)
        valid[-5:] = False
        params = heads.conv1_max_embedding_init(jax.random.PRNGKey(0))
        out = heads.conv1_max_embedding_apply(
            params, jnp.asarray(feats), jnp.asarray(batch),
            jnp.asarray(valid), B,
        )
        assert out.shape == (B, 256)
        assert np.isfinite(np.asarray(out)).all()

    def test_max_pool_excludes_padding(self, rng):
        from corsair_tpu.nn.layers import segment_max_pool
        feats = np.full((10, 4), -1.0, np.float32)
        feats[5:] = 100.0  # padding rows have huge values
        batch = np.zeros(10, np.int32)
        valid = np.zeros(10, bool)
        valid[:5] = True
        out = np.asarray(
            segment_max_pool(jnp.asarray(feats), jnp.asarray(batch),
                             jnp.asarray(valid), 1)
        )
        np.testing.assert_allclose(out, -1.0)

    def test_netvlad_shapes(self, rng):
        n, B = 50, 2
        feats = rng.randn(n, 256).astype(np.float32)
        batch = np.repeat(np.arange(B), 25).astype(np.int32)
        valid = np.ones(n, bool)
        params = heads.netvlad_init(jax.random.PRNGKey(0), num_clusters=8)
        out = heads.netvlad_apply(
            params, jnp.asarray(feats), jnp.asarray(batch),
            jnp.asarray(valid), B,
        )
        assert out.shape == (B, 1024)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-5
        )

    def test_netvlad_loupe_shapes(self, rng):
        n, B = 40, 2
        feats = rng.randn(n, 256).astype(np.float32)
        batch = np.repeat(np.arange(B), 20).astype(np.int32)
        valid = np.ones(n, bool)
        params = heads.netvlad_loupe_init(
            jax.random.PRNGKey(0), cluster_size=16, gating=True
        )
        out = heads.netvlad_loupe_apply(
            params, jnp.asarray(feats), jnp.asarray(batch),
            jnp.asarray(valid), B,
        )
        assert out.shape == (B, 1024)


class TestRegistry:
    def test_contains_expected(self):
        for name in ("ResUNetBN2C", "ResUNetBN2", "ResUNetIN2E",
                     "SimpleNetBN2", "SimpleNetBN3"):
            assert name in MODELS

    def test_load_model_raises(self):
        with pytest.raises(KeyError):
            load_model("NoSuchNet")

    @pytest.mark.parametrize("name", ["ResNet14", "ResNet50"])
    def test_resnet_forward(self, rng, name):
        """Registry smoke for the sparse ResNet classifier family
        (``model/resnet.py:25-157``; unused by the eval protocol but
        registry-visible — VERDICT r3 #8: zero suite coverage before).
        ResNet50 exercises the deeper layer plan + strided projections."""
        grid, _ = _make_grid(rng, n_clouds=2, n_pts=200, cap=512)
        d = load_model(name)
        cfg = d.make_config(in_channels=1, out_channels=40)
        params = d.init(jax.random.PRNGKey(0), cfg)
        logits = d.forward(params, grid, cfg)
        logits = np.asarray(logits)
        assert logits.shape == (grid.num_batches, 40)
        assert np.isfinite(logits).all()
        # per-sample global pool: two different clouds -> different rows
        assert not np.allclose(logits[0], logits[1])

    def test_simpleunet_forward(self, rng):
        grid, _ = _make_grid(rng, n_clouds=1, n_pts=200, cap=512)
        d = load_model("SimpleNetBN")
        cfg = d.make_config(in_channels=1, out_channels=8,
                            normalize_feature=True)
        params = d.init(jax.random.PRNGKey(0), cfg)
        maps = CoordinateManager(
            num_levels=cfg.num_levels,
            level_cap_ratios=(1.0, 0.5, 0.25),
        ).build(grid)
        out = d.forward(params, grid, maps, cfg)
        assert out.shape == (512, 8)
        assert np.isfinite(np.asarray(out)).all()


class TestTorchConvert:
    def test_roundtrip_resunet(self, rng):
        torch = pytest.importorskip("torch")
        from corsair_tpu.nn.torch_convert import (
            convert_conv1_max_embedding,
            convert_resunet,
        )

        ch = [32, 64, 128, 256]
        tr = [64, 64, 64, 128]
        sd = {}

        def add_conv(name, k, cin, cout, bias=False):
            if k == 1:
                sd[f"{name}.kernel"] = torch.randn(cin, cout)
            else:
                sd[f"{name}.kernel"] = torch.randn(k**3, cin, cout)
            if bias:
                sd[f"{name}.bias"] = torch.randn(1, cout)

        def add_bn(name, c):
            sd[f"{name}.bn.weight"] = torch.randn(c)
            sd[f"{name}.bn.bias"] = torch.randn(c)
            sd[f"{name}.bn.running_mean"] = torch.randn(c)
            sd[f"{name}.bn.running_var"] = torch.rand(c) + 0.5
            sd[f"{name}.bn.num_batches_tracked"] = torch.tensor(0)

        def add_block(name, c):
            add_conv(f"{name}.conv1", 3, c, c)
            add_bn(f"{name}.norm1", c)
            add_conv(f"{name}.conv2", 3, c, c)
            add_bn(f"{name}.norm2", c)

        add_conv("conv1", 3, 1, ch[0]); add_bn("norm1", ch[0])
        add_block("block1", ch[0])
        prev = ch[0]
        for i, c in enumerate(ch[1:], start=2):
            add_conv(f"conv{i}", 3, prev, c); add_bn(f"norm{i}", c)
            add_block(f"block{i}", c)
            prev = c
        add_conv("conv4_tr", 3, ch[3], tr[3]); add_bn("norm4_tr", tr[3])
        add_block("block4_tr", tr[3])
        add_conv("conv3_tr", 3, ch[2] + tr[3], tr[2]); add_bn("norm3_tr", tr[2])
        add_block("block3_tr", tr[2])
        add_conv("conv2_tr", 3, ch[1] + tr[2], tr[1]); add_bn("norm2_tr", tr[1])
        add_block("block2_tr", tr[1])
        add_conv("conv1_tr", 1, ch[0] + tr[1], tr[0])
        add_conv("final", 1, tr[0], 16, bias=True)

        params = convert_resunet(sd)
        # shapes line up with our init
        cfg = resunet.make_config("ResUNetBN2C", in_channels=1,
                                  out_channels=16)
        ref = resunet.init_params(jax.random.PRNGKey(0), cfg)
        flat_p = jax.tree_util.tree_leaves_with_path(params)
        ref_map = {
            jax.tree_util.keystr(k): v.shape
            for k, v in jax.tree_util.tree_leaves_with_path(ref)
        }
        for k, v in flat_p:
            ks = jax.tree_util.keystr(k)
            assert ks in ref_map, ks
            assert v.shape == ref_map[ks], f"{ks}: {v.shape} vs {ref_map[ks]}"

        # value check: conv kernel carried over
        np.testing.assert_allclose(
            np.asarray(params["conv2"]["kernel"]),
            sd["conv2.kernel"].numpy(), rtol=1e-6,
        )

        # embedding
        esd = {
            "final.final.kernel": torch.randn(256, 1024),
            "final.final.bias": torch.randn(1, 1024),
            "fc1.weight": torch.randn(512, 1024),
            "fc1.bias": torch.randn(512),
            "bn1.weight": torch.randn(512),
            "bn1.bias": torch.randn(512),
            "bn1.running_mean": torch.randn(512),
            "bn1.running_var": torch.rand(512) + 0.5,
            "bn1.num_batches_tracked": torch.tensor(0),
            "fc2.weight": torch.randn(256, 512),
            "fc2.bias": torch.randn(256),
        }
        emb = convert_conv1_max_embedding(esd)
        eref = heads.conv1_max_embedding_init(jax.random.PRNGKey(0))
        eref_map = {
            jax.tree_util.keystr(k): v.shape
            for k, v in jax.tree_util.tree_leaves_with_path(eref)
        }
        for k, v in jax.tree_util.tree_leaves_with_path(emb):
            ks = jax.tree_util.keystr(k)
            assert ks in eref_map and v.shape == eref_map[ks], ks
        np.testing.assert_allclose(
            np.asarray(emb["fc1"]["weight"]),
            esd["fc1.weight"].numpy().T, rtol=1e-6,
        )


class TestPipeline:
    def test_extract_batch(self, rng):
        ex = FeatureExtractor(ExtractorConfig())
        params = ex.init_params(jax.random.PRNGKey(0))
        coords_list = []
        for _ in range(3):
            pts = rng.randn(300, 3).astype(np.float32)
            _, g, _ = voxelize_np(pts, 0.15)
            coords_list.append(g)
        per_cloud, desc = ex.extract_batch_np(params, coords_list)
        assert len(per_cloud) == 3
        assert desc.shape == (3, 256)
        for g, f in zip(coords_list, per_cloud):
            assert f.shape == (len(g), 16)
        np.testing.assert_allclose(
            np.linalg.norm(desc, axis=1), 1.0, atol=1e-4
        )


class TestBf16Inference:
    def test_bf16_descriptors_close_to_f32(self, rng):
        """compute_dtype='bfloat16' (half conv bandwidth, f32 accum)
        changes L2-normalized descriptors by <1e-2."""
        import jax

        from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor

        def cloud(n=1500):
            pts = rng.randn(n, 3).astype(np.float32) * 0.5
            g = np.floor(pts / 0.03).astype(np.int32)
            _, first = np.unique(g, axis=0, return_index=True)
            return g[np.sort(first)]

        clouds = [cloud() for _ in range(2)]
        ex32 = FeatureExtractor(ExtractorConfig())
        params = ex32.init_params(jax.random.PRNGKey(0))
        ex16 = FeatureExtractor(ExtractorConfig(compute_dtype="bfloat16"))
        _, d32 = ex32.extract_batch_np(params, clouds)
        f16, d16 = ex16.extract_batch_np(params, clouds)
        assert d16.dtype == np.float32  # accumulation/output stay f32
        assert f16[0].dtype == np.float32
        assert np.abs(d16 - d32).max() < 1e-2
