"""Sacrificial-subprocess compile probes (compile-containment discipline).

Round-3 lesson (NOTES.md crash record, VERDICT r3 "what's weak" #2): one
risky TPU compile — the first bf16 single-plane banded-conv config —
SIGABRT'd ``tpu_compile_helper`` IN-PROCESS and left the axon backend
unresponsive for the rest of the round (36+ hours of hardware time,
``jax.devices()`` hanging forever). The blast radius of a bad compile is
the whole process *and* potentially the backend; the blast radius of a
bad compile in a subprocess with a hard timeout is one subprocess.

The rule this module encodes: **any new (kernel, dtype, shape-class)
combination compiles first in a sacrificial subprocess with a hard
timeout; only configs that pass the probe may compile in-process**
(bench, CLI, long-running sessions). Probes are compile-only where
possible (``jax.jit(f).lower(*args).compile()``) — compilation is the
risky step, not execution.

Verdicts:

* ``pass``    — subprocess exited 0 and printed the ``PROBE-OK`` marker.
* ``fail``    — nonzero exit (Python exception, compiler error, ...).
* ``crash``   — killed by a signal (SIGABRT/SIGSEGV — the round-3 class).
* ``timeout`` — hard timeout hit; subprocess killed. On a tunneled TPU
  this usually means the backend is already dead (device init hangs).

Passed configs are recorded in a ledger (one JSON line per probe) so a
sequence script can skip re-probing and the round log shows exactly
which configs were cleared before any in-process compile ran.
"""

from __future__ import annotations

import dataclasses
import json
import os
import signal
import subprocess
import sys
import time

PASS = "pass"
FAIL = "fail"
CRASH = "crash"
TIMEOUT = "timeout"

_MARKER = "PROBE-OK"
DEFAULT_LEDGER = os.path.join("logs", "probe_ledger.jsonl")


@dataclasses.dataclass(frozen=True)
class ProbeResult:
    verdict: str            # pass | fail | crash | timeout
    name: str               # probe label (goes to the ledger)
    elapsed_s: float
    returncode: int | None  # None on timeout
    signal_name: str | None  # e.g. "SIGABRT" when verdict == crash
    tail: str               # last lines of combined output

    @property
    def ok(self) -> bool:
        return self.verdict == PASS


def run_probe(code: str, name: str = "probe", timeout_s: int = 900,
              env: dict | None = None,
              ledger: str | None = DEFAULT_LEDGER) -> ProbeResult:
    """Run ``code`` in a fresh Python subprocess with a hard timeout.

    ``code`` must print ``PROBE-OK`` on success (use :func:`wrap_probe`
    to add the marker + repo path setup automatically). The parent
    process never imports jax on this path, so a SIGABRT or hang in the
    probe cannot take the caller down.
    """
    import tempfile

    e = dict(os.environ)
    e.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/corsair_jax_cache")
    if env:
        e.update(env)
    t0 = time.perf_counter()
    # Child output goes to a temp FILE, not a pipe: jax backend init on
    # this image spawns helper processes (axon tunnel) that outlive the
    # child and would hold a pipe's write end open forever — a
    # pipe-based communicate() then hangs even after the child exits
    # (observed: trivial probe child finished in seconds, parent's
    # subprocess.run never returned). A file fd held by a grandchild
    # blocks nothing.
    with tempfile.TemporaryFile(mode="w+") as outf:
        try:
            p = subprocess.run(
                [sys.executable, "-c", code], timeout=timeout_s,
                stdout=outf, stderr=outf, env=e,
            )
            elapsed = time.perf_counter() - t0
            outf.seek(0)
            out = outf.read()
            if p.returncode == 0 and _MARKER in out:
                verdict = PASS
            elif p.returncode < 0:
                verdict = CRASH
            else:
                verdict = FAIL
            sig = (signal.Signals(-p.returncode).name
                   if p.returncode is not None and p.returncode < 0
                   else None)
            res = ProbeResult(verdict, name, elapsed, p.returncode, sig,
                              "\n".join(out.strip().splitlines()[-8:]))
        except subprocess.TimeoutExpired:
            elapsed = time.perf_counter() - t0
            try:
                outf.seek(0)
                out = outf.read()
            except OSError:
                out = ""
            res = ProbeResult(TIMEOUT, name, elapsed, None, None,
                              "\n".join(out.strip().splitlines()[-8:]))
    _record(res, ledger)
    return res


def wrap_probe(body: str, repo_root: str | None = None,
               platform: str | None = None) -> str:
    """Wrap a probe body with repo-path setup and the success marker.

    ``body`` runs with ``jax`` importable and the repo on ``sys.path``;
    it should raise on failure. ``platform`` forces a jax platform via
    ``jax.config`` (the env var alone is overridden by sitecustomize —
    see .claude/skills/verify/SKILL.md).
    """
    root = repo_root or os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    plat = ""
    if platform:
        plat = (f"import jax; "
                f"jax.config.update('jax_platforms', {platform!r})\n")
    return (
        f"import sys; sys.path.insert(0, {root!r})\n"
        f"{plat}"
        f"{body}\n"
        f"print({_MARKER!r}, flush=True)\n"
    )


def _record(res: ProbeResult, ledger: str | None) -> None:
    if not ledger:
        return
    try:
        os.makedirs(os.path.dirname(ledger) or ".", exist_ok=True)
        with open(ledger, "a") as f:
            f.write(json.dumps({
                "t": time.strftime("%Y-%m-%dT%H:%M:%S"),
                "name": res.name, "verdict": res.verdict,
                "elapsed_s": round(res.elapsed_s, 1),
                "signal": res.signal_name,
            }) + "\n")
    except OSError:
        pass


def ledger_passed(name: str, ledger: str = DEFAULT_LEDGER) -> bool:
    """True if the ledger records a prior ``pass`` for this probe name."""
    try:
        with open(ledger) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("name") == name and rec.get("verdict") == PASS:
                    return True
    except OSError:
        pass
    return False


# ---------------------------------------------------------------------
# Named probes for the kernels that have shown (or risk) compile crashes
# ---------------------------------------------------------------------

def banded_probe_body(cin: int, exact: bool, band: int = 384,
                      n: int = 4096, cout: int = 32) -> str:
    """Compile-only probe for one banded-conv (Cin, exact) config — the
    exact class that produced the round-3 SIGABRT (bf16 single-plane
    selection at conv1's Cin=1)."""
    return f"""
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from corsair_tpu.core.kernels.banded_conv import banded_conv_pallas, banded_plan
n, k, band, cin, cout = {n}, 27, {band}, {cin}, {cout}
table = jnp.asarray(np.broadcast_to(np.arange(n, dtype=np.int32), (k, n)).copy())
feats = jnp.asarray(np.random.RandomState(0).randn(n, cin).astype(np.float32))
kern = jnp.asarray(np.random.RandomState(1).randn(k, cin, cout).astype(np.float32) * 0.1)
starts, anyv, ok = banded_plan(table, n, band)
assert bool(ok)
fn = jax.jit(partial(banded_conv_pallas, band=band, exact={exact!r}))
fn.lower(feats, table, kern, starts, anyv).compile()
print("compiled cin={cin} exact={exact}", flush=True)
"""


def probe_banded(cin: int, exact: bool, band: int = 384,
                 timeout_s: int = 900, env: dict | None = None,
                 ledger: str | None = DEFAULT_LEDGER) -> ProbeResult:
    name = f"banded_cin{cin}_exact{int(exact)}_band{band}"
    return run_probe(wrap_probe(banded_probe_body(cin, exact, band)),
                     name=name, timeout_s=timeout_s, env=env,
                     ledger=ledger)


def main(argv=None) -> int:
    """CLI: ``python -m corsair_tpu.utils.compile_probe --body-file f.py``
    or ``--banded CIN,EXACT[,BAND]``. Exit code 0 only on ``pass``."""
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--body-file", help="probe body script to wrap+run")
    p.add_argument("--banded", help="CIN,EXACT[,BAND] banded-conv probe")
    p.add_argument("--name", default="probe")
    p.add_argument("--timeout", type=int, default=900)
    p.add_argument("--platform", default=None)
    p.add_argument("--ledger", default=DEFAULT_LEDGER)
    args = p.parse_args(argv)

    if args.banded:
        parts = args.banded.split(",")
        cin, exact = int(parts[0]), parts[1] in ("1", "True", "true")
        band = int(parts[2]) if len(parts) > 2 else 384
        res = probe_banded(cin, exact, band, timeout_s=args.timeout,
                           ledger=args.ledger)
    elif args.body_file:
        with open(args.body_file) as f:
            body = f.read()
        res = run_probe(wrap_probe(body, platform=args.platform),
                        name=args.name, timeout_s=args.timeout,
                        ledger=args.ledger)
    else:
        p.error("one of --body-file / --banded required")
        return 2
    print(f"[probe {res.name}] {res.verdict} in {res.elapsed_s:.1f}s "
          f"(rc={res.returncode}, sig={res.signal_name})")
    if res.tail:
        print(res.tail)
    return 0 if res.ok else 1


if __name__ == "__main__":
    sys.exit(main())
