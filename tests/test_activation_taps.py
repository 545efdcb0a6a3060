"""Per-layer activation taps + ME-dump row alignment.

The checkpoint verifier's decisive phase compares every intermediate of
the reference forward (``model/resunet.py:207-256``) against a
MinkowskiEngine activation dump. These tests pin the machinery that
phase relies on, using our own forward as the "dump":

* ``extract_taps_np`` emits every reference tensor with its level
  coordinates;
* the stride-1 ``final`` tap equals the deployed extraction output;
* ``pre_normalize``, L2-normalized, reproduces ``final``;
* row alignment by coordinates recovers a shuffled "ME-ordered" dump at
  every level, including stride 8 where orderings genuinely differ.
"""

import numpy as np
import jax

from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor


def _cloud(rng, n=3000):
    pts = rng.randn(n, 3).astype(np.float32) * 0.4
    grid = np.floor(pts / 0.05).astype(np.int32)
    _, first = np.unique(grid, axis=0, return_index=True)
    return grid[np.sort(first)]


def test_taps_cover_reference_forward(rng):
    extractor = FeatureExtractor(ExtractorConfig())
    params = extractor.init_params(jax.random.PRNGKey(0))
    grid = _cloud(rng)
    taps = extractor.extract_taps_np(params, grid)

    for name in FeatureExtractor.TAP_LEVELS:
        assert name in taps and name + "_coords" in taps
        assert len(taps[name]) == len(taps[name + "_coords"])
    # channel widths of the deployed ResUNetBN2C
    assert taps["out_s1"].shape[1] == 32
    assert taps["out_s2"].shape[1] == 64
    assert taps["out_s4"].shape[1] == 128
    assert taps["out_s8"].shape[1] == 256
    assert taps["final"].shape[1] == 16
    assert taps["descriptor"].shape == (1, 256)
    # stride-l coords are multiples of the stride (ME convention)
    assert (taps["out_s8_coords"] % 8 == 0).all()
    assert (taps["out_s4_tr_coords"] % 4 == 0).all()

    # the final tap IS the deployed extraction output
    per_cloud, desc = extractor.extract_batch_np(params, [grid])
    np.testing.assert_allclose(taps["final"], per_cloud[0], atol=1e-5)
    np.testing.assert_allclose(
        taps["descriptor"], np.asarray(desc), atol=1e-5
    )

    # pre_normalize -> L2 normalize == final
    pn = taps["pre_normalize"]
    norm = np.linalg.norm(pn, axis=1, keepdims=True)
    np.testing.assert_allclose(
        pn / np.maximum(norm, 1e-12), taps["final"], atol=1e-5
    )


def test_align_rows_recovers_shuffled_dump(rng):
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "verify_checkpoint",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "verify_checkpoint.py"),
    )
    vc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vc)

    extractor = FeatureExtractor(ExtractorConfig())
    params = extractor.init_params(jax.random.PRNGKey(1))
    taps = extractor.extract_taps_np(params, _cloud(rng))

    for name in ["out_s1", "out_s8", "out_s4_tr", "final"]:
        a, coords = taps[name], taps[name + "_coords"]
        order = rng.permutation(len(a))
        # fake ME dump: shuffled rows, coords with leading batch column
        ref_arr = a[order]
        ref_coords = np.concatenate(
            [np.zeros((len(a), 1), np.int32), coords[order]], axis=1
        )
        aligned, okm, miss = vc._align_rows(ref_coords, a, coords)
        assert miss == 0 and okm.all()
        np.testing.assert_array_equal(aligned, ref_arr)

    # unmatched reference rows are reported, not silently compared
    coords = taps["out_s1_coords"]
    bad = np.concatenate([coords[:10] + 999, coords[10:]])
    aligned, okm, miss = vc._align_rows(bad, taps["out_s1"], coords)
    assert miss == 10
    assert not okm[:10].any() and okm[10:].all()
