"""The serving-tier tables in the perf tools stay aligned.

tools/latency_probe.py (the p50/p99 latency instrument) and
tools/make_model_set.py (the 4-model OBS data-dir layout, reference
obs_plugin/src/filter.cc:133-152) both enumerate the shipped serving
tiers; this pins that every referenced YAML exists and that the
latency probe covers all four OBS model tiers.
"""

import os
import sys

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_latency_probe_tiers_cover_the_model_set():
    from tools.latency_probe import TIER_CONFIGS
    from tools.make_model_set import MODEL_CONFIGS

    # Every tier the latency probe offers parses as a models config.
    for tier, rel in TIER_CONFIGS.items():
        path = os.path.join(REPO, rel)
        assert os.path.exists(path), (tier, rel)
        with open(path) as f:
            doc = yaml.safe_load(f)
        assert "inference" in doc.get("models", doc), (tier, rel)

    # The probe covers the same four configs the OBS model set ships
    # ("quality" is the probe's inline flagship arch = model_psp's
    # config), so every shipped tier has a latency instrument.
    probe_files = {os.path.join(REPO, rel)
                   for rel in TIER_CONFIGS.values()}
    probe_files.add(os.path.join(REPO, "configs/inference_quality.yaml"))
    set_files = {os.path.join(REPO, rel)
                 for rel in MODEL_CONFIGS.values()}
    assert set_files <= probe_files
