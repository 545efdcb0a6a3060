"""Compile-containment probe body: the deployed extraction program with
CORSAIR_BANDED_NOCOND=1 (unconditional banded dispatch, no lax.cond
wrapper). No new (kernel, dtype, shape-class) combos — the banded
custom-calls are unchanged — but the surrounding HLO differs, so the
program compiles once in a sacrificial subprocess per the discipline in
.claude/skills/verify/SKILL.md before the in-process bench A/B.

Run via: CORSAIR_BANDED_NOCOND=1 python -m corsair_tpu.utils.compile_probe
         --body-file scripts/probe_nocond.py --name nocond_extract_16x16384
"""
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
assert os.environ.get("CORSAIR_BANDED_NOCOND") == "1", "set the knob"

import numpy as np
import jax
import jax.numpy as jnp

from extraction_roofline import synth_cloud, measured_ratios, B, CAP
from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor

extractor = FeatureExtractor(ExtractorConfig())
params = extractor.init_params(jax.random.PRNGKey(0))
rng = np.random.RandomState(0)
clouds = [synth_cloud(rng) for _ in range(B)]
coords, valid = extractor.pad_clouds(clouds, CAP)
manager = extractor._manager_for(measured_ratios(clouds, CAP))
fn = jax.jit(lambda p, c, v: extractor.extract_padded(p, c, v, manager))
fn.lower(params, jnp.asarray(coords), jnp.asarray(valid)).compile()
