#!/usr/bin/env python
"""Post-single-plane extraction roofline (VERDICT r4 #4).

Profiles ONE warm deployed-extraction step (extract_padded, 16 clouds x
cap 16384 — bench.py's Phase B batch) on chip via jax.profiler, parses
the captured xplane with tensorboard_plugin_profile, and writes the
device-time attribution (top self-time op groups) to
logs/extraction_roofline.json. The point: a grounded statement of what
binds extraction NOW (selection matmuls? band DMAs? join? head?) so the
next extraction lever is chosen from data, not guesswork.
"""
import glob
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/corsair_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
B, CAP, N_RAW = 16, 16384, 15000
TRACE_DIR = "/tmp/extract_trace"


def synth_cloud(rng, voxel=0.03):
    # bench.py's make_cloud (surface-like shell, ~12.4k voxels from 15k
    # raw points) — the profile must cover the exact deployed workload,
    # including bench's measured per-level ratio caps below.
    pts = rng.randn(N_RAW, 3).astype(np.float32)
    pts /= np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-9)
    pts *= 0.9 * (1.0 + rng.randn(N_RAW, 1).astype(np.float32) * 0.03)
    grid = np.floor(pts / voxel).astype(np.int32)
    _, first = np.unique(grid, axis=0, return_index=True)
    return grid[np.sort(first)]


def measured_ratios(coords_list, cap):
    # bench.py::measured_ratios
    ratios = [1.0]
    for lvl in range(1, 4):
        step = 2 ** lvl
        cnt = max(len(np.unique(g // step, axis=0)) for g in coords_list)
        ratios.append(max(0.125,
                          min(1.0, float(np.ceil(cnt * 1.25 / cap * 8)
                                         / 8))))
    return tuple(ratios)


def classify(hlo: str) -> str:
    """Map an HLO op line to a pipeline stage."""
    if "banded_conv" in hlo:
        return "banded-conv kernel (Pallas)"
    if "merge_join" in hlo:
        return "merge-join kernel (Pallas)"
    if " sort(" in hlo:
        return "map-build sort"
    if "conditional(" in hlo:
        return "conv banded/gather lax.cond wrapper"
    if "copy-start" in hlo or "slice-start" in hlo:
        return "async copy/slice (overlapped)"
    if " fusion(" in hlo:
        return "XLA fusion"
    if " convolution(" in hlo or " dot(" in hlo:
        return "dot/conv"
    return hlo.split(" = ")[0].lstrip("%").rstrip("0123456789.")


def parse_xplane(xplane: str, out: dict, steps: int = 3) -> dict:
    """Device-time attribution from a captured xplane, with EXCLUSIVE
    self-times (see the inline comment — trace events nest)."""
    import collections

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplane, "rb") as f:
        xs.ParseFromString(f.read())

    for p in xs.planes:
        if "TPU" not in p.name:
            continue
        md = p.event_metadata
        for line in p.lines:
            if line.name not in ("XLA Ops", "XLA Modules"):
                continue
            if line.name == "XLA Modules":
                total = sum(ev.duration_ps for ev in line.events)
                out["device_module_ms_per_step"] = round(
                    total / 1e12 * 1000 / max(len(line.events), 1), 1)
                continue
            # EXCLUSIVE self-times: an op trace event can CONTAIN its
            # sub-ops on the same line (conditional/while/fusion spans
            # cover the custom-calls and fusions executed inside them),
            # so summing raw durations double-counts — the r5s3
            # artifact's stage table summed to 135 ms against a 93.3 ms
            # module for this reason. Subtract each event's directly-
            # nested children via an interval stack (sort by start asc,
            # end desc so parents precede their children).
            evs = []
            for ev in line.events:
                hlo = (md[ev.metadata_id].name
                       if ev.metadata_id in md else "?")
                evs.append((ev.offset_ps,
                            ev.offset_ps + ev.duration_ps,
                            ev.duration_ps, hlo))
            evs.sort(key=lambda e: (e[0], -e[1]))
            tot = collections.Counter()
            ops = collections.Counter()
            total = 0
            stack = []
            self_ps = []
            meta = []
            for start, end, dur, hlo in evs:
                while stack and evs[stack[-1]][1] <= start:
                    stack.pop()
                idx = len(self_ps)
                self_ps.append(dur)
                meta.append(hlo)
                if stack:
                    self_ps[stack[-1]] -= dur
                stack.append(idx)
            for dur, hlo in zip(self_ps, meta):
                dur = max(dur, 0)
                tot[classify(hlo)] += dur
                ops[hlo[:140]] += dur
                total += dur
            out["stage_ms_per_step"] = [
                {"stage": k, "ms": round(v / 1e12 * 1000 / steps, 2),
                 "pct": round(100 * v / total, 1)}
                for k, v in tot.most_common(12)]
            out["top_ops_ms_per_step"] = [
                {"op": k, "ms": round(v / 1e12 * 1000 / steps, 2)}
                for k, v in ops.most_common(25)]
    return out


def main():
    import jax

    from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor

    extractor = FeatureExtractor(ExtractorConfig())
    params = extractor.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    clouds = [synth_cloud(rng) for _ in range(B)]
    coords, valid = extractor.pad_clouds(clouds, CAP)
    manager = extractor._manager_for(measured_ratios(clouds, CAP))
    import jax.numpy as jnp
    coords, valid = jnp.asarray(coords), jnp.asarray(valid)

    def step():
        f, d, o = extractor.extract_padded(params, coords, valid,
                                           manager)
        jax.block_until_ready(d)
        assert not np.asarray(o).any()

    t0 = time.perf_counter()
    step()
    cold = time.perf_counter() - t0
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    warm = sorted(times)[2]
    print(f"extract_padded [{B} x {CAP}]: cold {cold:.1f}s, "
          f"warm {warm*1000:.1f} ms/batch "
          f"({B/warm:.1f} pclouds/sec extraction-only)", flush=True)

    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            step()

    xplanes = glob.glob(
        os.path.join(TRACE_DIR, "**", "*.xplane.pb"), recursive=True)
    assert xplanes, f"no xplane captured under {TRACE_DIR}"
    xplane = max(xplanes, key=os.path.getmtime)
    print(f"xplane: {xplane}", flush=True)

    # Parse the XSpace proto directly (this env's tensorboard_plugin_
    # profile converter is version-mismatched with its tensorflow);
    # needs PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python, set by the
    # re-exec guard at module bottom.
    out = {"batch": B, "cap": CAP, "cold_s": round(cold, 2),
           "warm_ms_per_batch": round(warm * 1000, 1),
           "pclouds_per_sec_extraction_only": round(B / warm, 1)}
    parse_xplane(xplane, out, steps=3)

    path = os.path.join(REPO, "logs", "extraction_roofline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)
    for e in out.get("stage_ms_per_step", []):
        print(f"  {e['pct']:5.1f}%  {e['ms']:8.2f} ms  {e['stage']}",
              flush=True)


if __name__ == "__main__":
    # The pure-python protobuf backend must be set before ANY protobuf
    # import (tensorflow's binary descriptors for the tbp protos are
    # stale in this env); re-exec once with it if unset.
    if os.environ.get("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION") != \
            "python":
        os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
        os.execv(sys.executable, [sys.executable] + sys.argv)
    main()
