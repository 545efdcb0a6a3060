"""Banded one-hot MXU conv vs the gather conv (interpret mode on CPU).

The banded kernel replaces per-row XLA gathers with per-tile band DMAs
+ one-hot MXU selection (core/kernels/banded_conv.py). Its contract:
bit-meaningful parity with ``sparse_conv`` whenever ``banded_plan``
reports full coverage, and a detectable ``ok=False`` whenever any
(group, tile) window exceeds the band — callers then fall back.
Reference semantics: MinkowskiEngine's gather-GEMM-scatter consumed by
model/resunet.py:207-256.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from corsair_tpu.core.kernels.banded_conv import (
    banded_conv_pallas,
    banded_plan,
)
from corsair_tpu.nn.layers import sparse_conv


def _grouped_table(rng, n_in, n_out, k=27, jump=400, jitter=40,
                   miss_frac=0.3):
    """Monotone rows; dim-0-fastest grouped jumps like real layouts."""
    base = np.sort(rng.randint(0, n_in, size=n_out)).astype(np.int64)
    big = np.array([-jump, 0, jump])[np.arange(k) % 3]
    small = rng.randint(-jitter, jitter, k)
    t = np.stack([np.clip(base + b + s, 0, n_in)
                  for b, s in zip(big, small)])
    t[rng.rand(k, n_out) < miss_frac] = n_in
    return t.astype(np.int32)


@pytest.mark.parametrize("cin,cout", [(32, 32), (32, 64)])
def test_banded_matches_gather(cin, cout):
    rng = np.random.RandomState(3)
    n_in, n_out, k = 1500, 1024, 27
    table = jnp.asarray(_grouped_table(rng, n_in, n_out, k))
    feats = jnp.asarray(rng.randn(n_in, cin).astype(np.float32))
    kernel = jnp.asarray(
        (rng.randn(k, cin, cout) * 0.1).astype(np.float32)
    )
    starts, anyv, ok = banded_plan(table, n_in, 640)
    assert bool(ok)
    out_g = sparse_conv({"kernel": kernel}, feats, table)
    out_b = banded_conv_pallas(feats, table, kernel, starts, anyv,
                               band=640, interpret=True)
    # both approximate the same f64 conv; interpret-mode CPU matmuls
    # are f32-accurate so the banded result is the tighter one
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_g),
                               atol=5e-4)


def test_banded_exact_vs_f64_oracle():
    rng = np.random.RandomState(4)
    n_in, n_out, k, cin, cout = 1200, 512, 27, 32, 32
    table_np = _grouped_table(rng, n_in, n_out, k)
    feats = rng.randn(n_in, cin).astype(np.float32)
    kernel = (rng.randn(k, cin, cout) * 0.1).astype(np.float32)
    xp = np.concatenate(
        [feats.astype(np.float64), np.zeros((1, cin))], 0
    )
    oracle = np.einsum("knc,kcd->nd", xp[table_np],
                       kernel.astype(np.float64))
    table = jnp.asarray(table_np)
    starts, anyv, ok = banded_plan(table, n_in, 640)
    assert bool(ok)
    out = np.asarray(banded_conv_pallas(
        jnp.asarray(feats), table, jnp.asarray(kernel), starts, anyv,
        band=640, exact=True, interpret=True,
    ))
    scale = np.abs(oracle).max()
    assert np.abs(out - oracle).max() / scale < 1e-6


def test_plan_rejects_wide_windows():
    rng = np.random.RandomState(5)
    n_in, n_out = 4000, 512
    # un-grouped random jumps blow past any 512-band after alignment
    base = np.sort(rng.randint(0, n_in, size=n_out)).astype(np.int64)
    t = np.stack([
        np.clip(base + d, 0, n_in)
        for d in rng.randint(-1800, 1800, 27)
    ]).astype(np.int32)
    _, _, ok = banded_plan(jnp.asarray(t), n_in, 512)
    assert not bool(ok)


def test_plan_and_kernel_handle_all_miss_tiles():
    rng = np.random.RandomState(6)
    n_in, n_out, k, cin, cout = 800, 512, 27, 32, 32
    table_np = _grouped_table(rng, n_in, n_out, k, jump=150, jitter=20)
    table_np[:, :256] = n_in          # first two tiles fully miss
    table = jnp.asarray(table_np)
    feats = jnp.asarray(rng.randn(n_in, cin).astype(np.float32))
    kernel = jnp.asarray(
        (rng.randn(k, cin, cout) * 0.1).astype(np.float32)
    )
    starts, anyv, ok = banded_plan(table, n_in, 640)
    assert bool(ok)
    assert np.asarray(anyv)[:, :2].max() == 0
    out_g = sparse_conv({"kernel": kernel}, feats, table)
    out_b = banded_conv_pallas(feats, table, kernel, starts, anyv,
                               band=640, interpret=True)
    assert np.abs(np.asarray(out_b[:256])).max() == 0
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_g),
                               atol=5e-4)


def _xyz_table(rng, n_in, n_out, k=27, jump_x=400, jump_y=60,
               jump_z=5, miss_frac=0.2):
    """Monotone rows with the REAL enumeration structure: offsets are
    dim-0 fastest (k = dx + 3*dy + 9*dz), so index jumps decompose as
    x-slice (~jump_x), y-row (~jump_y) and z-step (~jump_z) moves."""
    base = np.sort(rng.randint(0, n_in, size=n_out)).astype(np.int64)
    dx = np.array([-jump_x, 0, jump_x])[np.arange(k) % 3]
    dy = np.array([-jump_y, 0, jump_y])[(np.arange(k) // 3) % 3]
    dz = np.array([-jump_z, 0, jump_z])[(np.arange(k) // 9) % 3]
    t = np.stack([np.clip(base + a + b + c, 0, n_in)
                  for a, b, c in zip(dx, dy, dz)])
    t[rng.rand(k, n_out) < miss_frac] = n_in
    return t.astype(np.int32)


def test_nine_group_plan_covers_tighter_band():
    """Grouping by (x, y) — ngroups=9 — must cover with a band the
    3-group plan cannot: within a 9-group only z-steps (~jump_z) move
    the window, while a 3-group still absorbs the +-jump_y spread."""
    rng = np.random.RandomState(7)
    n_in, n_out, k, cin, cout = 1500, 1024, 27, 32, 32
    table_np = _xyz_table(rng, n_in, n_out, k, jump_y=150)
    table = jnp.asarray(table_np)
    band = 384
    _, _, ok3 = banded_plan(table, n_in, band, ngroups=3)
    starts9, anyv9, ok9 = banded_plan(table, n_in, band, ngroups=9)
    assert not bool(ok3)   # y-spread (2*150) + tile span exceeds 384
    assert bool(ok9)
    feats = jnp.asarray(rng.randn(n_in, cin).astype(np.float32))
    kernel = jnp.asarray(
        (rng.randn(k, cin, cout) * 0.1).astype(np.float32)
    )
    out_g = sparse_conv({"kernel": kernel}, feats, table)
    out_b = banded_conv_pallas(feats, table, kernel, starts9, anyv9,
                               band=band, interpret=True)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_g),
                               atol=5e-4)


def test_make_banded_plans_groups_env(rng, monkeypatch):
    """CORSAIR_BANDED_GROUPS=9 routes the deployed pipeline through
    9-group plans with unchanged outputs (interpret mode). The knob is
    read once at module import (advisor r3: trace-time env reads get
    baked into the jit cache), so the test patches the module constant
    — the import-time binding it feeds."""
    import jax

    from corsair_tpu.nn import resunet
    from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor

    pts = rng.randn(400, 3).astype(np.float32)
    pts /= np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-9)
    g = np.floor(pts / 0.06).astype(np.int32)
    _, first = np.unique(g, axis=0, return_index=True)
    cloud = g[np.sort(first)]

    ex_g = FeatureExtractor(ExtractorConfig(banded_band=0))
    params = ex_g.init_params(jax.random.PRNGKey(0))
    fg, dg = ex_g.extract_batch_np(params, [cloud], capacity=1024)
    monkeypatch.setattr(resunet, "_BANDED_GROUPS_ENV", 9)
    ex_b = FeatureExtractor(ExtractorConfig(banded_band=256))
    fb, db = ex_b.extract_batch_np(params, [cloud], capacity=1024)
    np.testing.assert_allclose(db, dg, atol=2e-5)
    np.testing.assert_allclose(fb[0], fg[0], atol=2e-5)


class TestBandedPipeline:
    """The deployed banded path end-to-end on CPU (interpret mode):
    input sorting, per-batch plans, lax.cond fallback, output unsort."""

    def _clouds(self, rng, n=2, pts=400):
        out = []
        for _ in range(n):
            p = rng.randn(pts, 3).astype(np.float32)
            p /= np.maximum(
                np.linalg.norm(p, axis=1, keepdims=True), 1e-9
            )
            g = np.floor(p / 0.06).astype(np.int32)
            _, first = np.unique(g, axis=0, return_index=True)
            g = g[np.sort(first)]
            out.append(g[rng.permutation(len(g))])  # scrambled order
        return out

    def test_extract_batch_np_banded_matches_gather(self, rng):
        from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor
        import jax

        clouds = self._clouds(rng)
        ex_g = FeatureExtractor(ExtractorConfig(banded_band=0))
        ex_b = FeatureExtractor(ExtractorConfig(banded_band=512))
        params = ex_g.init_params(jax.random.PRNGKey(0))
        fg, dg = ex_g.extract_batch_np(params, clouds, capacity=1024)
        fb, db = ex_b.extract_batch_np(params, clouds, capacity=1024)
        np.testing.assert_allclose(db, dg, atol=2e-5)
        for a, b in zip(fb, fg):
            np.testing.assert_allclose(a, b, atol=2e-5)

    def test_banded_nocond_matches_cond(self, rng):
        """CORSAIR_BANDED_NOCOND=1 (A/B experiment knob: unconditional
        banded dispatch, no lax.cond wrapper) matches the deployed
        cond path exactly when coverage holds, with no NaN poison.
        Knob is import-time (advisor r3), so the test patches the
        module constant it binds to."""
        import jax

        from corsair_tpu.nn import layers
        from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor

        clouds = self._clouds(rng)
        ex_c = FeatureExtractor(ExtractorConfig(banded_band=512))
        params = ex_c.init_params(jax.random.PRNGKey(1))
        fc, dc = ex_c.extract_batch_np(params, clouds, capacity=1024)
        monkeypatch_val = layers._BANDED_NOCOND
        layers._BANDED_NOCOND = True
        try:
            ex_n = FeatureExtractor(ExtractorConfig(banded_band=512))
            fn, dn = ex_n.extract_batch_np(params, clouds, capacity=1024)
        finally:
            layers._BANDED_NOCOND = monkeypatch_val
        assert np.isfinite(dn).all()
        np.testing.assert_allclose(dn, dc, atol=2e-5)
        for a, b in zip(fn, fc):
            assert np.isfinite(a).all()
            np.testing.assert_allclose(a, b, atol=2e-5)

    def test_banded_bf16_mode_close_to_f32(self, rng):
        """CORSAIR_BANDED_BF16=1 + compute_dtype=bfloat16 routes the
        banded selection to its single-plane bf16 mode
        (layers.sparse_conv): descriptors must stay in the bf16 gather
        path's error class vs exact f32. (Opt-in: the mode is gated off
        pending a TPU-compiler-crash diagnosis — see layers.py.)"""
        import os

        from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor
        import jax

        clouds = self._clouds(rng)
        ex_f = FeatureExtractor(ExtractorConfig(banded_band=512))
        params = ex_f.init_params(jax.random.PRNGKey(3))
        _, df = ex_f.extract_batch_np(params, clouds, capacity=1024)
        # The knob is resolved ONCE at FeatureExtractor construction
        # (advisor r3: no trace-time env reads), so it must be set
        # before the extractor is built.
        os.environ["CORSAIR_BANDED_BF16"] = "1"
        try:
            ex_b = FeatureExtractor(ExtractorConfig(
                banded_band=512, compute_dtype="bfloat16"
            ))
            assert not ex_b.model_cfg.banded_exact
            _, db = ex_b.extract_batch_np(params, clouds, capacity=1024)
        finally:
            del os.environ["CORSAIR_BANDED_BF16"]
        # descriptors are L2-normalized; bf16 conv class error ~1e-3
        cos = np.sum(df * db, axis=1)
        assert cos.min() > 0.999, cos.min()

    def test_banded_grads_match_gather(self, rng):
        """Training through the banded path (custom VJP): grads of a
        banded-enabled forward match the gather path's."""
        from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor
        import jax
        import jax.numpy as jnp

        clouds = self._clouds(rng, n=2, pts=300)
        ex_g = FeatureExtractor(ExtractorConfig(banded_band=0))
        ex_b = FeatureExtractor(ExtractorConfig(banded_band=512))
        params = ex_g.init_params(jax.random.PRNGKey(2))
        coords, valid = ex_g.pad_clouds(clouds, 512)
        coords, valid = jnp.asarray(coords), jnp.asarray(valid)

        def loss(ex):
            def f(p):
                feats, desc, _ = ex.extract_padded(p, coords, valid)
                return jnp.sum(feats**2) + jnp.sum(desc**2)
            return f

        from jax.flatten_util import ravel_pytree

        gg = jax.grad(loss(ex_g))(params)
        gb = jax.grad(loss(ex_b))(params)
        flat_g, _ = ravel_pytree(gg)
        flat_b, _ = ravel_pytree(gb)
        np.testing.assert_allclose(
            np.asarray(flat_b), np.asarray(flat_g),
            rtol=1e-3, atol=1e-4,
        )

    def test_extract_padded_banded_matches_gather(self, rng):
        from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor
        import jax
        import jax.numpy as jnp

        clouds = self._clouds(rng)
        ex_g = FeatureExtractor(ExtractorConfig(banded_band=0))
        ex_b = FeatureExtractor(ExtractorConfig(banded_band=512))
        params = ex_g.init_params(jax.random.PRNGKey(1))
        coords, valid = ex_g.pad_clouds(clouds, 512)
        coords, valid = jnp.asarray(coords), jnp.asarray(valid)
        fg, dg, og = ex_g.extract_padded(params, coords, valid)
        fb, db, ob = ex_b.extract_padded(params, coords, valid)
        assert not np.asarray(ob).any()
        np.testing.assert_allclose(
            np.asarray(db), np.asarray(dg), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(fb), np.asarray(fg), atol=2e-5
        )


@pytest.mark.parametrize("exact", [True, False])
def test_banded_cin1_sublane_pad(exact):
    """conv1-shaped Cin=1 exercises the sublane-pad guard (a [1, W] /
    [3, W] bf16 selection operand is padded to a full 16-row tile —
    the suspected trigger of the recorded TPU-compiler SIGABRT)."""
    rng = np.random.RandomState(7)
    n_in, n_out, k, cin, cout = 1500, 1024, 27, 1, 32
    table_np = _grouped_table(rng, n_in, n_out, k)
    feats = rng.randn(n_in, cin).astype(np.float32)
    kernel = (rng.randn(k, cin, cout) * 0.1).astype(np.float32)
    table = jnp.asarray(table_np)
    starts, anyv, ok = banded_plan(table, n_in, 640)
    assert bool(ok)
    out = np.asarray(banded_conv_pallas(
        jnp.asarray(feats), table, jnp.asarray(kernel), starts, anyv,
        band=640, exact=exact, interpret=True,
    ))
    src = feats if exact else np.asarray(
        jnp.asarray(feats).astype(jnp.bfloat16).astype(jnp.float32)
    )
    xp = np.concatenate([src, np.zeros((1, cin), np.float32)], 0)
    oracle = np.einsum("knc,kcd->nd", xp[table_np], kernel)
    tol = 1e-6 if exact else 1e-5
    assert np.abs(out - oracle).max() <= tol * max(
        1.0, np.abs(oracle).max()
    )


def test_banded_single_plane_matches_bf16_gather_class():
    """Single-plane mode == select(bf16(x)) followed by the recombine
    matmul: on the interpret backend (full-precision matmuls) it must
    equal the gather formulation applied to bf16-rounded features."""
    rng = np.random.RandomState(8)
    n_in, n_out, k, cin, cout = 1500, 1024, 27, 32, 48
    table_np = _grouped_table(rng, n_in, n_out, k)
    feats = rng.randn(n_in, cin).astype(np.float32)
    kernel = (rng.randn(k, cin, cout) * 0.1).astype(np.float32)
    table = jnp.asarray(table_np)
    starts, anyv, ok = banded_plan(table, n_in, 640)
    assert bool(ok)
    out = np.asarray(banded_conv_pallas(
        jnp.asarray(feats), table, jnp.asarray(kernel), starts, anyv,
        band=640, exact=False, interpret=True,
    ))
    rounded = np.asarray(
        jnp.asarray(feats).astype(jnp.bfloat16).astype(jnp.float32)
    )
    xp = np.concatenate([rounded, np.zeros((1, cin), np.float32)], 0)
    oracle = np.einsum("knc,kcd->nd", xp[table_np], kernel)
    scale = max(1.0, np.abs(oracle).max())
    assert np.abs(out - oracle).max() / scale < 1e-6


@pytest.mark.parametrize("exact", [True, False])
def test_banded_concat_selection_matches_split(exact):
    """concat=True (one fused [rows, W] @ [W, kg*T] selection dot per
    group, tile-major table layout) must be bit-meaningfully identical
    to the default per-offset selection dots — same one-hot operands,
    only the dot grouping changes."""
    rng = np.random.RandomState(11)
    n_in, n_out, k, cin, cout = 1500, 1024, 27, 32, 48
    table_np = _grouped_table(rng, n_in, n_out, k)
    # fully-missing tiles exercise the anyv skip under the new layout
    table_np[:, 128:256] = n_in
    feats = rng.randn(n_in, cin).astype(np.float32)
    kernel = (rng.randn(k, cin, cout) * 0.1).astype(np.float32)
    table = jnp.asarray(table_np)
    starts, anyv, ok = banded_plan(table, n_in, 640)
    assert bool(ok)
    args = (jnp.asarray(feats), table, jnp.asarray(kernel), starts,
            anyv)
    out_split = np.asarray(banded_conv_pallas(
        *args, band=640, exact=exact, interpret=True, concat=False,
    ))
    out_concat = np.asarray(banded_conv_pallas(
        *args, band=640, exact=exact, interpret=True, concat=True,
    ))
    np.testing.assert_array_equal(out_concat, out_split)
    src = feats if exact else np.asarray(
        jnp.asarray(feats).astype(jnp.bfloat16).astype(jnp.float32)
    )
    xp = np.concatenate([src, np.zeros((1, cin), np.float32)], 0)
    oracle = np.einsum("knc,kcd->nd", xp[table_np], kernel)
    scale = max(1.0, np.abs(oracle).max())
    assert np.abs(out_concat - oracle).max() / scale < 1e-6


def test_banded_fast_env_pipeline_close_to_f32(monkeypatch):
    """CORSAIR_BANDED_FAST=1 routes f32 extraction through single-plane
    selection (gather-path default precision class on TPU): descriptors
    must stay within the bf16 conv error class of the exact path."""
    import jax

    from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor

    rng = np.random.RandomState(9)
    clouds = []
    for _ in range(2):
        p = rng.randn(400, 3).astype(np.float32)
        p /= np.maximum(np.linalg.norm(p, axis=1, keepdims=True), 1e-9)
        g = np.floor(p / 0.06).astype(np.int32)
        _, first = np.unique(g, axis=0, return_index=True)
        clouds.append(g[np.sort(first)])
    ex = FeatureExtractor(ExtractorConfig(banded_band=512))
    params = ex.init_params(jax.random.PRNGKey(5))
    _, d_exact = ex.extract_batch_np(params, clouds, capacity=1024)
    monkeypatch.setenv("CORSAIR_BANDED_FAST", "1")
    ex2 = FeatureExtractor(ExtractorConfig(banded_band=512))
    _, d_fast = ex2.extract_batch_np(params, clouds, capacity=1024)
    cos = np.sum(d_exact * d_fast, axis=1)
    assert cos.min() > 0.999, cos.min()
