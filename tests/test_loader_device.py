"""The on-device random_params generation path (jax.random + lax.map,
loader.py) only executes on accelerators in production — lock its pytree
structure, shapes, and dtypes against the numpy host path on CPU
(ADVICE.md r2: the branch had zero test coverage)."""

import dataclasses

import jax.numpy as jnp
import pytest

from deft_tpu.models import PRESETS
from deft_tpu.models.loader import random_params


@pytest.mark.parametrize("wdt", ["inherit", "int8", "int8-pallas"])
@pytest.mark.parametrize("fuse", [False, True])
@pytest.mark.parametrize("moe", [False, True])
def test_on_device_random_params_matches_host_structure(wdt, fuse, moe):
    cfg = PRESETS["tiny"]
    if moe:
        cfg = dataclasses.replace(cfg, num_experts=4, experts_per_tok=2)
    host = random_params(cfg, seed=0, dtype=jnp.bfloat16, weight_dtype=wdt,
                         on_device=False, fuse=fuse)
    dev = random_params(cfg, seed=0, dtype=jnp.bfloat16, weight_dtype=wdt,
                        on_device=True, fuse=fuse)
    assert set(dev) == set(host)
    for k in host:
        assert dev[k].shape == host[k].shape, k
        assert dev[k].dtype == host[k].dtype, k
