"""Structural weight migration tests (reference copy_model_variables)."""

import numpy as np
import jax
import jax.numpy as jnp

from joshupscale_tpu.models import create_models
from joshupscale_tpu.utils.migrate import copy_model_variables, lcs


def test_lcs_basic():
    assert lcs(list("abcde"), list("ace")) == [(0, 0), (2, 1), (4, 2)]
    assert lcs([], list("ab")) == []


def test_migrate_deeper_generator():
    """Growing 2 -> 4 res blocks keeps shared blocks' weights."""
    small = create_models({
        "g": {"name": "generator-resnet", "num_filters": 8,
              "num_res_blocks": 2},
    }, seed=1)["g"].params
    big_cfg = {
        "g": {"name": "generator-resnet", "num_filters": 8,
              "num_res_blocks": 4},
    }
    big = create_models(big_cfg, seed=2)["g"].params

    migrated = copy_model_variables(big, small)
    # Head conv + first two blocks copied from small.
    np.testing.assert_array_equal(
        np.asarray(migrated["conv_1"]["kernel"]),
        np.asarray(small["conv_1"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(migrated["block_2"]["conv_1"]["kernel"]),
        np.asarray(small["block_2"]["conv_1"]["kernel"]))
    # Blocks beyond the source depth keep their init.
    np.testing.assert_array_equal(
        np.asarray(migrated["block_4"]["conv_1"]["kernel"]),
        np.asarray(big["block_4"]["conv_1"]["kernel"]))
    # Tail deconvs still migrated (same name+shape after the block gap).
    np.testing.assert_array_equal(
        np.asarray(migrated["conv_trans_2"]["kernel"]),
        np.asarray(small["conv_trans_2"]["kernel"]))


def test_copy_variables_config_key():
    models = create_models({
        "small": {"name": "flow-resnet", "num_inputs": 4,
                  "num_filters": 8, "num_res_blocks": 1},
        "big": {"name": "flow-resnet", "num_inputs": 4,
                "num_filters": 8, "num_res_blocks": 3,
                "copy_variables": "small"},
    }, seed=0)
    np.testing.assert_array_equal(
        np.asarray(models["big"].params["conv_1"]["kernel"]),
        np.asarray(models["small"].params["conv_1"]["kernel"]))
