"""Exclusive self-time attribution in scripts/extraction_roofline.

The xplane "XLA Ops" trace line nests events: a conditional/fusion span
CONTAINS the sub-ops executed inside it, so summing raw durations
double-counts (the r5s3 artifact's stage table summed to 135 ms against
a 93.3 ms device module and mis-credited 41.7 ms to the lax.cond
wrappers). ``parse_xplane`` subtracts directly-nested children via an
interval stack; this test pins that on a hand-built XSpace proto.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts"))

tf_protos = pytest.importorskip(
    "tensorflow.tsl.profiler.protobuf.xplane_pb2")


def _build_xplane(tmp_path):
    xs = tf_protos.XSpace()
    plane = xs.planes.add()
    plane.name = "/device:TPU:0"

    names = {
        1: "%cond.1 = (f32[8]) conditional(s32[] %p)",
        2: "%_banded_conv_jit.1 = f32[8] custom-call(f32[8] %x)",
        3: "%fusion.1 = f32[8] fusion(f32[8] %y)",
        4: "%copy.1 = f32[8] copy(f32[8] %z)",
    }
    for mid, name in names.items():
        plane.event_metadata[mid].id = mid
        plane.event_metadata[mid].name = name

    ops = plane.lines.add()
    ops.name = "XLA Ops"
    # One step: cond spans [0, 100); inside it a banded custom-call
    # [10, 60) and a fusion [60, 90); a sibling copy [100, 120).
    # Exclusive: cond = 100 - 50 - 30 = 20, banded 50, fusion 30,
    # copy 20; total 120 == the module span.
    for mid, off, dur in ((1, 0, 100), (2, 10, 50), (3, 60, 30),
                          (4, 100, 20)):
        ev = ops.events.add()
        ev.metadata_id = mid
        ev.offset_ps = off * 10**9
        ev.duration_ps = dur * 10**9

    mods = plane.lines.add()
    mods.name = "XLA Modules"
    ev = mods.events.add()
    ev.metadata_id = 1
    ev.offset_ps = 0
    ev.duration_ps = 120 * 10**9

    path = os.path.join(tmp_path, "t.xplane.pb")
    with open(path, "wb") as f:
        f.write(xs.SerializeToString())
    return path


def test_exclusive_self_times(tmp_path):
    from extraction_roofline import parse_xplane

    path = _build_xplane(str(tmp_path))
    out = parse_xplane(path, {}, steps=1)

    stages = {e["stage"]: e["ms"] for e in out["stage_ms_per_step"]}
    assert stages["banded-conv kernel (Pallas)"] == pytest.approx(50.0)
    assert stages["XLA fusion"] == pytest.approx(30.0)
    # the wrapper's self-time excludes its nested children
    assert stages["conv banded/gather lax.cond wrapper"] == \
        pytest.approx(20.0)
    assert stages["copy"] == pytest.approx(20.0)
    # stage table sums to the module time exactly (the r5s3 bug check)
    assert sum(stages.values()) == pytest.approx(
        out["device_module_ms_per_step"], abs=0.2)
