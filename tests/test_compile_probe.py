"""Compile-containment probe tests (VERDICT r3 next-round #3).

The key property: a SIGABRT (the round-3 tpu_compile_helper crash
class) or a hang inside a probe subprocess leaves the PARENT process —
and its jax backend handle — untouched. The crash test simulates the
exact signal class with ``os.abort()``.
"""

import os

from corsair_tpu.utils import compile_probe as cp


class TestRunProbe:
    def test_pass(self, tmp_path):
        ledger = str(tmp_path / "ledger.jsonl")
        res = cp.run_probe(cp.wrap_probe("x = 1 + 1\nassert x == 2"),
                           name="trivial", timeout_s=60, ledger=ledger)
        assert res.verdict == cp.PASS and res.ok
        assert cp.ledger_passed("trivial", ledger)

    def test_sigabrt_contained(self, tmp_path):
        """os.abort() in the probe == the round-3 compiler SIGABRT
        class; the parent must get a 'crash' verdict and keep running
        (this test finishing at all is the demonstration)."""
        ledger = str(tmp_path / "ledger.jsonl")
        res = cp.run_probe("import os; os.abort()", name="aborter",
                           timeout_s=60, ledger=ledger)
        assert res.verdict == cp.CRASH
        assert res.signal_name == "SIGABRT"
        assert not cp.ledger_passed("aborter", ledger)

    def test_failure(self, tmp_path):
        res = cp.run_probe(cp.wrap_probe("raise RuntimeError('no')"),
                           name="failer", timeout_s=60,
                           ledger=str(tmp_path / "l.jsonl"))
        assert res.verdict == cp.FAIL
        assert res.returncode not in (0, None)

    def test_timeout_contained(self, tmp_path):
        res = cp.run_probe("import time; time.sleep(60)", name="hanger",
                           timeout_s=2, ledger=str(tmp_path / "l.jsonl"))
        assert res.verdict == cp.TIMEOUT
        assert res.returncode is None

    def test_marker_required(self, tmp_path):
        # exit 0 without the marker must not count as pass (a probe
        # body that silently skipped the compile would otherwise
        # green-light a config it never built)
        res = cp.run_probe("print('done')", name="nomarker",
                           timeout_s=60, ledger=str(tmp_path / "l.jsonl"))
        assert res.verdict == cp.FAIL


class TestBandedProbeBody:
    def test_compiles_on_cpu(self, tmp_path):
        """The banded-conv probe body itself must be valid — run it on
        the CPU backend (interpret mode) end to end."""
        body = cp.banded_probe_body(cin=4, exact=True, band=128, n=256)
        res = cp.run_probe(
            cp.wrap_probe(body, platform="cpu"),
            name="banded_cpu_smoke", timeout_s=600,
            ledger=str(tmp_path / "l.jsonl"),
        )
        assert res.verdict == cp.PASS, res.tail


class TestImportSideEffects:
    def test_package_import_initializes_no_backend(self, tmp_path):
        """Importing corsair_tpu must not create device arrays (module-
        level jnp constants initialize the default backend at import —
        on a dead axon tunnel that HANGS every python process that
        imports the package, which is how the round-4 contained-probe
        parent deadlocked). np scalars at module level keep imports
        backend-free."""
        code = (
            "import sys; sys.path.insert(0, '/root/repo')\n"
            "import corsair_tpu\n"
            "import corsair_tpu.ops.symmetry, corsair_tpu.ops.kmeans\n"
            "import corsair_tpu.ops.chamfer, corsair_tpu.ops.knn\n"
            "import corsair_tpu.ops.correspond, corsair_tpu.core.sparse\n"
            "import corsair_tpu.utils.compile_probe\n"
            "from jax._src import xla_bridge\n"
            "assert not xla_bridge._backends, xla_bridge._backends\n"
            "print('PROBE-OK')\n"
        )
        res = cp.run_probe(code, name="import_sideeffects",
                           timeout_s=120,
                           ledger=str(tmp_path / "l.jsonl"))
        assert res.verdict == cp.PASS, res.tail
