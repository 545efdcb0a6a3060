"""Force the registration Pallas kernels onto the CPU backend.

The deployed registration kernels (merged-global sector-kNN, min-dist,
ransac-score) gate OFF on CPU by default — Mosaic kernels don't compile
there. That left the multichip CPU dryrun certifying jnp fallbacks
instead of the shipped program (VERDICT r4 missing #2). This module is
the switch the dryrun flips so those gates stay ON and every Pallas call
site passes ``interpret=True``, the same treatment the banded conv and
merge-join already get via ``ExtractorConfig``.

Contract (advisor r3: trace-time flags must not toggle mid-process —
already-traced shapes silently keep the old variant): set the
``CORSAIR_PALLAS_INTERPRET=1`` env var before process start, or call
:func:`enable` before the FIRST registration trace of the process.
``enable`` is one-way.
"""

from __future__ import annotations

import os

_FORCE = os.environ.get("CORSAIR_PALLAS_INTERPRET", "0") == "1"


def forced() -> bool:
    """True when CPU-backend gates must keep the Pallas kernels on."""
    return _FORCE


def enable() -> None:
    """Keep Pallas kernel gates ON even on the CPU backend (interpret
    mode). One-way; must run before the first registration trace."""
    global _FORCE
    _FORCE = True


def interpret_flag() -> bool:
    """The ``interpret=`` value for a Pallas call site whose backend
    gate passed: True only on the CPU backend (where the gate can only
    have passed because :func:`forced`), False on accelerators."""
    import jax

    try:
        return jax.default_backend() == "cpu"
    except RuntimeError:
        return True
