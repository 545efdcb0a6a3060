"""Minimal reproducer for the banded-conv bf16 single-plane TPU crash.

The first bench run with CORSAIR_BANDED_BF16=1 (single-plane bf16
selection, ``banded_conv_pallas(exact=False)``) killed the axon TPU
backend mid-compile (tpu_compile_helper SIGABRT pattern — NOTES.md
crash record). Hypothesis: the ``conv1`` layer's Cin=1 makes the
bf16 band a [1, W] operand, a sublane shape the A/B script
(``bench_banded_conv.py``) never compiled — it only ever ran Cin>=32.

This script compiles exact=False at Cin = 1, 2, 4, 8, 16, 32 one at a
time, smallest first, printing progress BEFORE each compile so the
crashing shape is identified even if the backend dies. Run it only
when losing the TPU tunnel for a while is acceptable.

UPDATE (round-3 session 3): the kernel now pads any selection operand
narrower than 16 sublanes to a full bf16 tile (banded_conv.py sublane
guard), so a clean pass here green-lights flipping single-plane on via
CORSAIR_BANDED_FAST=1 (bench step in scripts/on_chip_sequence.sh).
"""

import os
import sys

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/corsair_jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    if os.environ.get("CORSAIR_DIAG_CPU") == "1":  # logic sanity check
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from corsair_tpu.core.kernels.banded_conv import (
        banded_conv_pallas,
        banded_plan,
    )

    rng = np.random.RandomState(0)
    n, k, band = 4096, 27, 384
    # monotone-per-offset table: row k maps output i to input i (all
    # rows identical keeps every tile's window trivially in band)
    table = jnp.asarray(
        np.broadcast_to(np.arange(n, dtype=np.int32), (k, n)).copy()
    )

    for cin in (1, 2, 4, 8, 16, 32):
        feats = jnp.asarray(rng.randn(n, cin).astype(np.float32))
        kern = jnp.asarray(
            rng.randn(k, cin, 32).astype(np.float32) * 0.1
        )
        starts, anyv, ok = banded_plan(table, n, band)
        assert bool(ok), cin
        for exact in (True, False):
            print(f"compiling cin={cin} exact={exact} ...", flush=True)
            out = banded_conv_pallas(
                feats, table, kern, starts, anyv, band=band,
                exact=exact,
            )
            print(f"  ok: {float(jnp.sum(out)):.4f}", flush=True)
    print("ALL SHAPES COMPILED", flush=True)


if __name__ == "__main__":
    main()
