"""Test configuration: force an 8-device virtual CPU mesh.

Distributed tests follow SURVEY.md §4.4: multi-device simulation on CPU. The
axon sitecustomize registers the TPU backend at interpreter startup, so we
override the platform via jax.config (env vars are too late by now).
"""

import os

os.environ.setdefault("JAX_NUM_CPU_DEVICES", "8")

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # backend already initialized (e.g. re-entrant run)
    pass
jax.config.update("jax_enable_x64", False)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
