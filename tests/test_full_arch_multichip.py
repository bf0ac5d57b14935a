"""Full-ARCHITECTURE multichip check: the flagship GAN training step
(flow 64f/10rb + generator 64f/24rb -- the reference's default sizes,
reference scripts/training/models.py:259-260, 485-486) at crop 32,
sharded over a 2-device data-parallel mesh, must produce finite losses
AND match the single-device step on the same total batch.

The smoke-scale mesh tests (test_training.py) prove the sharding
plumbing; this proves the REAL model shards within memory/layout
constraints -- the class of problem (fusion-emitter hazards, layout
blowups) that in round 2 only appeared at full size.

Cost note: ~4-5 min of XLA compile per configuration on CPU (the
19-frame ping-pong graph); execution itself is <1 s.  This is the
single most expensive test in the suite, by design.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from joshupscale_tpu.models import create_models
from joshupscale_tpu.training import build_gan_step, init_gan_state

CROP = 32


def _full_config():
    return {
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": 64, "num_res_blocks": 10},
        "generator": {"name": "generator-resnet", "num_filters": 64,
                      "num_res_blocks": 24},
        "discriminator": {"name": "discriminator", "alpha": 0.25},
        "vgg": {"name": "vgg"},
        "gan": {"name": "gan", "flow": {"model": "flow"},
                "generator": {"model": "generator"},
                "discriminator": {"model": "discriminator"},
                "vgg": {"model": "vgg"}},
    }


@pytest.mark.slow
def test_full_arch_gan_dp_matches_single(rng):
    models = create_models(_full_config(), seed=0)
    built = models["gan"]
    trainer = built.obj
    init_gen = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float64), built.params["gen"])
    # SGD keeps updates proportional to gradients (reduction-order
    # noise is not amplified the way Adam's g/rsqrt(v) is).
    gopt, dopt = optax.sgd(1e-4), optax.sgd(1e-4)

    batch = {
        "input": jnp.asarray(
            rng.random((2, 10, CROP, CROP, 3)).astype(np.float32) - 0.5),
        "target": jnp.asarray(
            rng.random((2, 10, CROP * 4, CROP * 4, 3)).astype(np.float32)
            - 0.5),
    }
    key = jax.random.PRNGKey(7)

    # --- single device (reference semantics) --------------------------
    ref_step = build_gan_step(trainer, gopt, dopt, built.params["vgg"])
    ref_state = init_gan_state(
        trainer, built.params["gen"], built.params["discr"], gopt, dopt)
    ref_state, ref_metrics = ref_step(ref_state, batch, key)
    for k, v in ref_metrics.items():
        assert np.isfinite(float(v)), (k, float(v))

    # --- 2-device data-parallel mesh ----------------------------------
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("data",))
    dp_step = build_gan_step(
        trainer, gopt, dopt, built.params["vgg"], mesh=mesh)
    dp_state = init_gan_state(
        trainer, built.params["gen"], built.params["discr"], gopt, dopt)
    repl = NamedSharding(mesh, P())
    dp_state = type(dp_state)(
        *(jax.device_put(getattr(dp_state, f.name), repl)
          for f in dataclasses.fields(dp_state)))
    dp_batch = jax.device_put(batch, NamedSharding(mesh, P("data")))
    dp_state, dp_metrics = dp_step(dp_state, dp_batch, key)

    # Finite losses at full size on the mesh.
    for k, v in dp_metrics.items():
        assert np.isfinite(float(v)), (k, float(v))

    # DP == single-device (cross-replica reductions only reorder fp32
    # summation).  Observed reorder noise on gen_loss at full
    # architecture: ~1e-4 with the pixel-space training warp, ~8e-4
    # with the (default) s2d-routed warp -- its per-device gather
    # tables split differently under the batch shard, reordering the
    # feature-matching sqrt-of-sum chains inside gen_loss.  Bound 2e-3.
    np.testing.assert_allclose(
        float(ref_metrics["gen_loss"]), float(dp_metrics["gen_loss"]),
        rtol=2e-3)
    # The discriminator loss chains feature-matching norms
    # (sqrt-of-sum per layer) whose summation order the batch split
    # changes; at full architecture the observed reorder noise is
    # ~2.4e-3 relative (vs ~1e-4 for gen_loss).  Bound it at 1e-2.
    np.testing.assert_allclose(
        float(ref_metrics["discr_loss"]),
        float(dp_metrics["discr_loss"]), rtol=1e-2)
    # Parameter-space comparison is deliberately NOT asserted at full
    # architecture: the gradient direction through the 19-frame
    # recurrence x 68 conv layers is fp-chaotic at random init --
    # measured (see this file's git history probes): a 1e-7 input
    # perturbation on a SINGLE device already flips the FRVSR update
    # vector to cos 0.036 / rel 1.38, the same signature as the DP-vs-
    # single difference.  "DP == single" is unfalsifiable in parameter
    # space at fp32 at this depth; the semantic equivalence is pinned
    # exactly at smoke scale (test_training.py DP tests) and the jit
    # uses GSPMD global-program semantics (one program, sharded), so
    # there is no per-replica math to diverge.  What full size adds is
    # above: the real model compiles, shards, runs, and the forward
    # losses agree.  Sanity: the DP step moved the params finitely.
    moved = 0.0
    for b, p0 in zip(jax.tree_util.tree_leaves(dp_state.gen_params),
                     jax.tree_util.tree_leaves(init_gen)):
        ub = np.asarray(b, np.float64) - p0
        assert np.all(np.isfinite(ub))
        moved += float((ub ** 2).sum())
    assert moved > 0.0
