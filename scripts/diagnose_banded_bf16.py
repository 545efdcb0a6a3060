"""Banded-conv single-plane compile sweep — CONTAINED in subprocesses.

The first bench run with single-plane bf16 selection killed the axon
TPU backend mid-compile (tpu_compile_helper SIGABRT — NOTES.md crash
record) and cost the rest of round 3's hardware time. This script is
the round-4 replacement: every (Cin, exact) config is compiled in a
SACRIFICIAL SUBPROCESS with a hard timeout (corsair_tpu/utils/
compile_probe.py), smallest Cin first. The parent process never
touches jax, so a SIGABRT or a hang in any config cannot take this
script — or the session that launched it — down with it; the verdict
table below identifies the crashing shape either way.

A clean sweep (all `pass`) green-lights flipping single-plane on via
CORSAIR_BANDED_FAST=1 (bench A/B in scripts/on_chip_sequence.sh step
7, which now requires this sweep's ledger to show the passes first).

Hypothesis being tested: conv1's Cin=1 makes the bf16 selection band a
[1, W] operand, a sublane shape the original A/B script never compiled
(it only ran Cin>=32); the kernel now pads any selection operand
narrower than 16 sublanes to a full bf16 tile (banded_conv.py sublane
guard).

CORSAIR_DIAG_CPU=1 runs the same sweep on the CPU backend (interpret
mode) as a logic sanity check.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from corsair_tpu.utils import compile_probe as cp  # noqa: E402


def main():
    on_cpu = os.environ.get("CORSAIR_DIAG_CPU") == "1"
    band = int(os.environ.get("CORSAIR_DIAG_BAND", "384"))
    timeout_s = 300 if on_cpu else 900
    results = []
    for cin in (1, 2, 4, 8, 16, 32):
        for exact in (True, False):
            name = f"banded_cin{cin}_exact{int(exact)}_band{band}"
            if on_cpu:
                name += "_cpu"
            body = cp.banded_probe_body(cin, exact, band)
            print(f"probing {name} ...", flush=True)
            res = cp.run_probe(
                cp.wrap_probe(body, platform="cpu" if on_cpu else None),
                name=name, timeout_s=timeout_s,
            )
            print(f"  -> {res.verdict} ({res.elapsed_s:.1f}s, "
                  f"rc={res.returncode}, sig={res.signal_name})",
                  flush=True)
            if not res.ok and res.tail:
                print("  " + res.tail.replace("\n", "\n  "), flush=True)
            results.append((name, res))
            if res.verdict in (cp.CRASH, cp.TIMEOUT) and not on_cpu:
                # A crash very likely killed the tunneled backend for
                # every later probe too; stop and report rather than
                # burn the timeout budget x remaining configs.
                print("stopping sweep: backend likely down after "
                      f"{name}", flush=True)
                break
        else:
            continue
        break

    print("\nsweep verdicts:")
    for name, res in results:
        print(f"  {name:40s} {res.verdict}")
    n_pass = sum(r.ok for _, r in results)
    print(f"{n_pass}/{len(results)} passed")
    if n_pass == len(results) and len(results) == 12:
        print("ALL SHAPES COMPILED — CORSAIR_BANDED_FAST=1 cleared")
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
