"""Banded-gather sparse conv: monotone neighbor windows + one-hot MXU
selection instead of per-row XLA gathers.

The extraction phase is gather-LATENCY-bound (~6 ns per gathered row,
ARCHITECTURE.md roofline note): a 27-offset conv over N launched rows
pays 27*N row gathers regardless of locality. This kernel removes the
gathers entirely by exploiting a structural property of the coordinate
manager's tables: level layouts are (batch, x, y, z)-sorted, and adding
a fixed kernel offset to a sorted coordinate set preserves order, so
each table row ``table[k, :]`` is MONOTONE over the valid entries. A
tile of 128 consecutive output rows therefore reads source rows from a
narrow index window that fits in VMEM.

The window width is dominated by the dim-0 (x) component of the kernel
offset: under the (batch, x, y, z) lexsort a +-1 x-step jumps by the
x-slice row count (~300-800 rows at bench scale) while y/z-steps jump
by <~60. Offsets are therefore grouped by their dim-0 component
(enumeration is dim-0-fastest, ``kernel_offsets``: rows k % 3 == g),
and each group gets its OWN per-tile band start — measured max spreads
drop from <=1165 (single band) to <=812 (grouped), most tables <=372
(see scripts/bench_banded_conv.py). Selection-matmul work scales with
the band width, so grouping is a direct FLOP cut.

Everything runs in TRANSPOSED orientation so no operand needs an
in-kernel relayout and the band DMA slices the (128-aligned) lane dim:

1. ``x`` arrives as ``[Cin, N]``; per (tile, group) one dynamic DMA
   pulls the band ``x[:, start*128 : start*128+W]`` into VMEM (starts
   are stored as 128-block indices so Mosaic can prove lane alignment);
2. optionally the f32 band is split 3-way into bf16 significance
   planes (hi+mid+lo == x exactly: 3 x 8 mantissa bits = f32's 24),
   stacked to ``band3T [3*Cin, W]``; in non-exact mode the band is a
   single bf16 plane (same precision class as the XLA gather path's
   default-precision einsum);
3. per kernel offset, selection is a one-hot matmul on the MXU:
   ``zT = band3T @ (iota_W == table[k] - start)`` — misses (sentinel
   ``n_in``) and out-of-band indices give all-zero one-hot columns,
   reproducing the gather path's zero-row semantics exactly;
4. per group, recombined ``z_g [Kg*Cin, T]`` hits one
   HIGHEST-precision matmul against the folded kernel block and
   accumulates into the output tile.

Tiles whose window would exceed ``W`` (or an unsorted layout) are
detected by ``banded_plan`` at map-build time; callers fall back to the
gather path when ``ok`` is False. Reference semantics match
MinkowskiEngine's gather-GEMM-scatter kernel maps
(model/resunet.py:207-256 consumes them via MinkowskiConvolution).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
ALIGN = 128      # band starts lane-aligned for the HBM slice
NGROUPS = 3      # offsets grouped by dim-0 component (dim-0-fastest)

# Concatenated selection A/B knob, read ONCE at import (a trace-time
# env read would be baked into the jit cache; advisor r3): fuse a
# group's kg one-hot selections into ONE [rows, W] @ [W, kg*T] matmul
# instead of kg separate [rows, W] @ [W, T] dots. Same FLOPs — the
# hypothesis is better MXU weight-load pipelining across the kg N-tiles
# of one dot. The table is pre-laid-out host-side in tile-major
# [G, n_tiles * kg * T] order so the kernel slices it lane-aligned with
# no in-kernel relayout.
import os as _os

_CONCAT = _os.environ.get("CORSAIR_BANDED_CONCAT", "0") == "1"


def group_rows(k_real: int, ngroups: int = NGROUPS) -> np.ndarray:
    """Row permutation putting same-dim-0-offset rows contiguous.

    ``kernel_offsets`` enumerates dim-0 fastest, so rows with the same
    x-offset are ``k % ngroups == g``. Returns ``[k_real]`` int array;
    group ``g`` owns the slice ``perm[g * k_real // ngroups : ...]``.
    Falls back to identity (one group) when k_real isn't divisible.
    """
    if k_real % ngroups:
        return np.arange(k_real)
    return np.concatenate(
        [np.arange(k_real)[np.arange(k_real) % ngroups == g]
         for g in range(ngroups)]
    )


def banded_plan(table, n_in: int, band: int, tile: int = TILE,
                ngroups: int = NGROUPS):
    """Per-(group, tile) band starts + coverage for the banded conv.

    Returns ``(starts [G, n_tiles] i32, any_valid [G, n_tiles] i32,
    ok bool)``. ``starts`` are ALIGN-sized block indices (element start
    = start * ALIGN) so Mosaic can prove the HBM lane-slice is
    128-aligned; ``ok`` is True iff every (group, tile) valid
    source-index window fits in ``band`` rows after alignment. Runs
    once per (level, table) at map build.
    """
    k, n_out = table.shape
    if k % ngroups:
        ngroups = 1
    perm = group_rows(k, ngroups)
    n_tiles = n_out // tile
    t = table[perm, : n_tiles * tile].reshape(
        ngroups, k // ngroups, n_tiles, tile
    )
    is_valid = t < n_in
    big = jnp.where(is_valid, t, jnp.int32(2**30))
    small = jnp.where(is_valid, t, jnp.int32(-1))
    lo = jnp.min(big, axis=(1, 3))                      # [G, n_tiles]
    hi = jnp.max(small, axis=(1, 3))
    has = jnp.any(is_valid, axis=(1, 3))
    starts = jnp.where(
        has, jnp.maximum(lo, 0) // ALIGN, 0
    ).astype(jnp.int32)
    spread = jnp.where(has, hi - starts * ALIGN + 1, 0)
    ok = jnp.all(spread <= band)
    return starts, has.astype(jnp.int32), ok


def _kernel(ngroups, kg, cin, band, tile, exact, concat,
            starts_ref, anyv_ref, table_ref, wfoldT_ref, xT_hbm,
            outT_ref, band_ref, sems):
    i = pl.program_id(0)

    for g in range(ngroups):
        @pl.when(anyv_ref[g, i] > 0)
        def _(g=g):
            s = starts_ref[g, i] * ALIGN   # mult keeps alignment provable
            pltpu.make_async_copy(
                xT_hbm.at[:, pl.ds(s, band)], band_ref.at[g], sems.at[g]
            ).start()

    outT_ref[:] = jnp.zeros_like(outT_ref)
    for g in range(ngroups):
        @pl.when(anyv_ref[g, i] > 0)
        def _(g=g):
            s = starts_ref[g, i] * ALIGN
            pltpu.make_async_copy(
                xT_hbm.at[:, pl.ds(s, band)], band_ref.at[g], sems.at[g]
            ).wait()
            xb = band_ref[g]                            # [Cin, W] f32
            if exact:
                hi = xb.astype(jnp.bfloat16)
                r = xb - hi.astype(jnp.float32)
                mid = r.astype(jnp.bfloat16)
                lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
                band3 = jnp.concatenate(
                    [hi, mid, lo], axis=0
                )                                       # [3Cin, W] bf16
            else:
                band3 = xb.astype(jnp.bfloat16)
            # Sublane guard: a bf16 operand narrower than its native
            # (16, 128) tile (conv1's Cin=1 gives [1, W] single-plane /
            # [3, W] exact) is the prime suspect for the TPU-compiler
            # SIGABRT recorded in NOTES.md. Pad to a full sublane tile;
            # zero rows select zeros and are sliced back off below.
            rows = band3.shape[0]
            pad = max(16 - rows, 0)
            if pad:
                band3 = jnp.concatenate(
                    [band3, jnp.zeros((pad, band), jnp.bfloat16)], axis=0
                )
            if concat:
                # one fused selection dot across the group's kg offsets
                rel = table_ref[g, :][None, :] - s       # [1, kg*T]
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (band, kg * tile), 0
                )
                onehot = (iota == rel).astype(jnp.bfloat16)  # [W, kg*T]
                z3 = jnp.dot(band3, onehot,
                             preferred_element_type=jnp.float32)
                zs = []
                for k in range(kg):
                    zk = z3[:, k * tile:(k + 1) * tile]
                    if exact:
                        zs.append(
                            zk[:cin] + zk[cin:2 * cin]
                            + zk[2 * cin:3 * cin]
                        )
                    else:
                        zs.append(zk[:cin])
            else:
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (band, tile), 0
                )
                zs = []
                for k in range(kg):
                    rel = table_ref[g * kg + k, :][None, :] - s  # [1, T]
                    onehot = (iota == rel).astype(jnp.bfloat16)  # [W, T]
                    z3 = jnp.dot(band3, onehot,
                                 preferred_element_type=jnp.float32)
                    if exact:
                        zs.append(
                            z3[:cin] + z3[cin:2 * cin]
                            + z3[2 * cin:3 * cin]
                        )
                    else:
                        zs.append(z3[:cin])
            z_g = jnp.concatenate(zs, axis=0)           # [Kg*Cin, T]
            # exact mode reproduces the f32 gather formulation, so the
            # recombine matmul runs HIGHEST (6 bf16 passes ~ f32). In
            # single-plane mode the selected rows are already
            # bf16-valued, and bf16(select(x)) == select(bf16(x)) —
            # DEFAULT precision here lands in exactly the precision
            # class of the TPU gather path's default einsum, at 1/6 the
            # recombine passes of HIGHEST.
            outT_ref[:] += jnp.dot(
                wfoldT_ref[:, g * kg * cin:(g + 1) * kg * cin], z_g,
                preferred_element_type=jnp.float32,
                precision=(jax.lax.Precision.HIGHEST if exact
                           else jax.lax.Precision.DEFAULT),
            )


def banded_conv_pallas(feats, table, kernel, starts, any_valid,
                       band: int = 512, tile: int = TILE,
                       exact: bool = True,
                       interpret: bool | None = None,
                       concat: bool | None = None):
    """``out[i] = sum_k W[k] @ x[table[k, i]]`` via grouped banded
    one-hot MXU selection. Same contract as ``nn.layers.sparse_conv``
    (miss value == ``feats.shape[0]`` gathers a zero row); callers must
    only invoke it when ``banded_plan(...).ok`` — out-of-band VALID
    entries would be silently dropped otherwise.

    ``feats``: [N_in, Cin] f32. ``table``: [K, N_out] i32.
    ``kernel``: [K, Cin, Cout]. ``starts``/``any_valid``:
    [G, N_out//tile] from ``banded_plan``. ``exact=True`` reproduces
    f32 selection bit-exactly via 3-plane bf16 splitting; False keeps
    a single bf16 plane (gather-path default-precision class, 3x
    cheaper). ``interpret=None`` auto-selects Pallas interpret mode on
    the CPU backend (no Mosaic there) so the deployed code path stays
    testable off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if concat is None:
        concat = _CONCAT
    return _banded_conv_diff(feats, table, kernel, starts, any_valid,
                             band, tile, exact, interpret, concat)


# Training support: pallas_call has no automatic derivative, so the
# banded conv carries a custom VJP whose backward pass differentiates
# the mathematically-identical gather formulation (XLA turns its
# gather into the scatter-add transpose conv). exact=True makes the
# primal bit-compatible with that formulation, so the gradients are
# the true gradients of the deployed forward.
@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _banded_conv_diff(feats, table, kernel, starts, any_valid,
                      band, tile, exact, interpret, concat):
    return _banded_conv_jit(feats, table, kernel, starts, any_valid,
                            band, tile, exact, interpret, concat)


def _banded_conv_fwd(feats, table, kernel, starts, any_valid,
                     band, tile, exact, interpret, concat):
    out = _banded_conv_jit(feats, table, kernel, starts, any_valid,
                           band, tile, exact, interpret, concat)
    return out, (feats, table, kernel, starts, any_valid)


def _banded_conv_bwd(band, tile, exact, interpret, concat, res, g):
    feats, table, kernel, starts, any_valid = res

    def gather_form(f, w):
        x_pad = jnp.concatenate(
            [f, jnp.zeros((1, f.shape[1]), f.dtype)], axis=0
        )
        return jnp.einsum("knc,kcd->nd", x_pad[table], w,
                          preferred_element_type=jnp.float32)

    _, vjp = jax.vjp(gather_form, feats, kernel)
    d_feats, d_kernel = vjp(g)
    f0 = jax.dtypes.float0
    return (d_feats, np.zeros(table.shape, f0), d_kernel,
            np.zeros(starts.shape, f0), np.zeros(any_valid.shape, f0))


_banded_conv_diff.defvjp(_banded_conv_fwd, _banded_conv_bwd)


@partial(jax.jit,
         static_argnames=("band", "tile", "exact", "interpret",
                          "concat"))
def _banded_conv_jit(feats, table, kernel, starts, any_valid,
                     band, tile, exact, interpret, concat):
    n_in, cin = feats.shape
    k_real, n_out = table.shape
    cout = kernel.shape[2]
    assert n_out % tile == 0, (n_out, tile)
    n_tiles = n_out // tile
    ngroups = starts.shape[0]
    assert k_real % ngroups == 0, (k_real, ngroups)
    kg = k_real // ngroups
    perm = group_rows(k_real, ngroups)

    # band DMA source [Cin, N + band]: zero tail keeps the slice in
    # bounds and makes miss-sentinel hits select zeros
    xT = jnp.concatenate(
        [feats.astype(jnp.float32).T,
         jnp.zeros((cin, band), jnp.float32)], axis=1
    )
    table_p = table[perm]
    if concat:
        # tile-major concat layout: row g holds, for each output tile
        # i, the group's kg target-index vectors back to back —
        # tableC[g, (i*kg + k)*tile + t] = table_p[g*kg + k, i*tile+t]
        # — so the kernel's per-(g, tile) block slice is already the
        # lane-major [1, kg*T] operand of the fused selection dot.
        table_p = jnp.transpose(
            table_p.reshape(ngroups, kg, n_tiles, tile), (0, 2, 1, 3)
        ).reshape(ngroups, n_tiles * kg * tile)
        k_pad = -(-ngroups // 8) * 8
        if k_pad != ngroups:
            table_p = jnp.concatenate(
                [table_p, jnp.full((k_pad - ngroups, table_p.shape[1]),
                                   n_in, jnp.int32)], axis=0
            )
        table_block = pl.BlockSpec((k_pad, kg * tile),
                                   lambda i, *_: (0, i),
                                   memory_space=pltpu.VMEM)
    else:
        k_pad = -(-k_real // 8) * 8     # sublane-pad the table block
        if k_pad != k_real:
            table_p = jnp.concatenate(
                [table_p, jnp.full((k_pad - k_real, n_out), n_in,
                                   jnp.int32)], axis=0
            )
        table_block = pl.BlockSpec((k_pad, tile), lambda i, *_: (0, i),
                                   memory_space=pltpu.VMEM)
    wfoldT = kernel.astype(jnp.float32)[perm].reshape(
        k_real * cin, cout
    ).T                                                  # [Cout, K*Cin]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,       # starts, any_valid
        grid=(n_tiles,),
        in_specs=[
            table_block,
            pl.BlockSpec((cout, k_real * cin), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((cout, tile), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ngroups, cin, band), jnp.float32),
            pltpu.SemaphoreType.DMA((ngroups,)),
        ],
    )
    outT = pl.pallas_call(
        partial(_kernel, ngroups, kg, cin, band, tile, exact, concat),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cout, n_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(starts, any_valid, table_p, wfoldT, xT)
    return outT.T
