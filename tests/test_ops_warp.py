"""dense_image_warp vs a NumPy oracle implementing the documented tfa
semantics (floor clamped to [0, size-2], alpha clamped to [0, 1], gather of
the 4 surrounding corners)."""

import numpy as np
import pytest
import jax.numpy as jnp

from joshupscale_tpu.ops import dense_image_warp


def numpy_dense_image_warp(image, flow):
    """Straightforward NumPy oracle for the tfa warp semantics."""
    n, h, w, c = image.shape
    gy, gx = np.meshgrid(
        np.arange(h, dtype=flow.dtype),
        np.arange(w, dtype=flow.dtype),
        indexing="ij",
    )
    qy = gy[None] - flow[..., 0]
    qx = gx[None] - flow[..., 1]

    fy = np.clip(np.floor(qy), 0, h - 2)
    fx = np.clip(np.floor(qx), 0, w - 2)
    ay = np.clip(qy - fy, 0.0, 1.0)[..., None]
    ax = np.clip(qx - fx, 0.0, 1.0)[..., None]
    iy = fy.astype(np.int64)
    ix = fx.astype(np.int64)

    out = np.zeros_like(image)
    for b in range(n):
        tl = image[b][iy[b], ix[b]]
        tr = image[b][iy[b], ix[b] + 1]
        bl = image[b][iy[b] + 1, ix[b]]
        br = image[b][iy[b] + 1, ix[b] + 1]
        top = tl + (tr - tl) * ax[b]
        bot = bl + (br - bl) * ax[b]
        out[b] = top + (bot - top) * ay[b]
    return out


@pytest.mark.parametrize("shape", [(1, 8, 8, 3), (2, 12, 20, 3)])
def test_warp_matches_numpy_oracle(rng, shape):
    image = rng.standard_normal(shape).astype(np.float32)
    flow = (rng.standard_normal(shape[:3] + (2,)) * 3).astype(np.float32)
    ours = np.asarray(dense_image_warp(jnp.asarray(image), jnp.asarray(flow)))
    ref = numpy_dense_image_warp(image, flow)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_warp_zero_flow_is_identity(rng):
    image = rng.standard_normal((1, 9, 7, 3)).astype(np.float32)
    flow = np.zeros((1, 9, 7, 2), dtype=np.float32)
    out = np.asarray(dense_image_warp(jnp.asarray(image), jnp.asarray(flow)))
    np.testing.assert_allclose(out, image, atol=1e-6)


def test_warp_edge_clamp(rng):
    """Large out-of-range flows must clamp to the nearest edge pixel."""
    image = rng.standard_normal((1, 6, 6, 2)).astype(np.float32)
    flow = np.full((1, 6, 6, 2), 100.0, dtype=np.float32)  # query << 0
    out = np.asarray(dense_image_warp(jnp.asarray(image), jnp.asarray(flow)))
    # Query points are all far above-left of the image -> top-left pixel.
    expected = np.broadcast_to(image[:, :1, :1, :], out.shape)
    np.testing.assert_allclose(out, expected, atol=1e-6)

    flow = np.full((1, 6, 6, 2), -100.0, dtype=np.float32)  # query >> size
    out = np.asarray(dense_image_warp(jnp.asarray(image), jnp.asarray(flow)))
    expected = np.broadcast_to(image[:, -1:, -1:, :], out.shape)
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_warp_matches_tf_reference_impl(rng):
    """Cross-check against a TF implementation of the same formula built
    from public TF ops (the same construction tfa uses)."""
    tf = pytest.importorskip("tensorflow")
    image = rng.standard_normal((2, 10, 14, 3)).astype(np.float32)
    flow = (rng.standard_normal((2, 10, 14, 2)) * 4).astype(np.float32)

    # TF oracle: grid - flow queries, bilinear gather with clamping.
    b, h, w, c = image.shape
    gx, gy = tf.meshgrid(tf.range(w), tf.range(h))
    grid = tf.cast(tf.stack([gy, gx], axis=2), tf.float32)[None]
    q = grid - tf.constant(flow)
    qy, qx = q[..., 0], q[..., 1]
    fy = tf.clip_by_value(tf.floor(qy), 0.0, float(h - 2))
    fx = tf.clip_by_value(tf.floor(qx), 0.0, float(w - 2))
    ay = tf.clip_by_value(qy - fy, 0.0, 1.0)[..., None]
    ax = tf.clip_by_value(qx - fx, 0.0, 1.0)[..., None]
    iy = tf.cast(fy, tf.int32)
    ix = tf.cast(fx, tf.int32)

    def gather(dy, dx):
        idx = tf.stack([iy + dy, ix + dx], axis=-1)
        return tf.gather_nd(tf.constant(image), idx, batch_dims=1)

    tl, tr = gather(0, 0), gather(0, 1)
    bl, br = gather(1, 0), gather(1, 1)
    top = tl + (tr - tl) * ax
    bot = bl + (br - bl) * ax
    ref = (top + (bot - top) * ay).numpy()

    ours = np.asarray(dense_image_warp(jnp.asarray(image), jnp.asarray(flow)))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_space_depth_roundtrip_and_tf(rng):
    from joshupscale_tpu.ops import space_to_depth, depth_to_space

    x = rng.standard_normal((2, 8, 12, 3)).astype(np.float32)
    s2d = np.asarray(space_to_depth(jnp.asarray(x), 4))
    back = np.asarray(depth_to_space(jnp.asarray(s2d), 4))
    np.testing.assert_array_equal(back, x)

    tf = pytest.importorskip("tensorflow")
    ref = tf.nn.space_to_depth(tf.constant(x), 4).numpy()
    np.testing.assert_array_equal(s2d, ref)

    y = rng.standard_normal((1, 4, 6, 32)).astype(np.float32)
    d2s = np.asarray(depth_to_space(jnp.asarray(y), 4))
    ref = tf.nn.depth_to_space(tf.constant(y), 4).numpy()
    np.testing.assert_array_equal(d2s, ref)


def test_s2d_warp_per_stream_gather_branch(rng, monkeypatch):
    """Large batches gather per-stream (lax.map) instead of one flat
    big-table gather (the >500K-row gather cliff); both branches must
    be numerically identical."""
    import joshupscale_tpu.ops.warp as warp_mod
    from joshupscale_tpu.ops.warp import dense_image_warp_s2d

    n, hb, wb = 3, 6, 8
    img = jnp.asarray(rng.random((n, hb, wb, 48), np.float32) - 0.5)
    flow = jnp.asarray(
        (rng.random((n, hb, wb, 32), np.float32) - 0.5) * 10.0)

    flat = dense_image_warp_s2d(img, flow)
    monkeypatch.setattr(warp_mod, "FLAT_GATHER_MAX_ROWS", 1)
    mapped = dense_image_warp_s2d(img, flow)
    np.testing.assert_array_equal(np.asarray(flat), np.asarray(mapped))


def test_via_s2d_matches_pixel_value_and_grad(rng):
    """The s2d-routed TRAINING warp (dense_image_warp_via_s2d) is the
    pixel warp: identical values AND identical gradients w.r.t. both
    the image (gather vjp = scatter-add) and the flow (through the
    bilinear alphas), including out-of-range edge-clamped queries."""
    import jax

    from joshupscale_tpu.ops.warp import (
        dense_image_warp,
        dense_image_warp_via_s2d,
    )

    img = jnp.asarray(rng.standard_normal((3, 16, 24, 3)).astype(np.float32))
    flow = jnp.asarray(
        (rng.standard_normal((3, 16, 24, 2)) * 6).astype(np.float32))

    a = dense_image_warp(img, flow)
    b = dense_image_warp_via_s2d(img, flow)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-6, rtol=0)

    # A nonlinear scalarization so wrong corner weights can't cancel.
    def loss(warp_fn, i, f):
        return jnp.sum(jnp.sin(warp_fn(i, f) * 3.0))

    ga_i, ga_f = jax.grad(lambda i, f: loss(dense_image_warp, i, f),
                          argnums=(0, 1))(img, flow)
    gb_i, gb_f = jax.grad(
        lambda i, f: loss(dense_image_warp_via_s2d, i, f),
        argnums=(0, 1))(img, flow)
    np.testing.assert_allclose(np.asarray(ga_i), np.asarray(gb_i),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ga_f), np.asarray(gb_f),
                               atol=1e-4, rtol=1e-4)


def test_via_s2d_falls_back_on_unaligned_shapes(rng):
    """H/W not divisible by the block route to the pixel warp."""
    from joshupscale_tpu.ops.warp import (
        dense_image_warp,
        dense_image_warp_via_s2d,
    )

    img = jnp.asarray(rng.standard_normal((1, 10, 9, 3)).astype(np.float32))
    flow = jnp.asarray(
        (rng.standard_normal((1, 10, 9, 2)) * 2).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(dense_image_warp_via_s2d(img, flow)),
        np.asarray(dense_image_warp(img, flow)))


def test_s2d_warp_fill_mode_matches_promise(rng):
    """gather_mode="fill" (the training-graph-safe gather) is value-
    identical to the serving promise-mode gather, in both the flat and
    the per-stream lax.map branches."""
    import joshupscale_tpu.ops.warp as warp_mod
    from joshupscale_tpu.ops.warp import dense_image_warp_s2d

    n, hb, wb = 3, 6, 8
    img = jnp.asarray(rng.random((n, hb, wb, 48), np.float32) - 0.5)
    flow = jnp.asarray(
        (rng.random((n, hb, wb, 32), np.float32) - 0.5) * 10.0)

    promise = dense_image_warp_s2d(img, flow)
    fill = dense_image_warp_s2d(img, flow, gather_mode="fill")
    np.testing.assert_array_equal(np.asarray(promise), np.asarray(fill))

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(warp_mod, "FLAT_GATHER_MAX_ROWS", 1)
        mapped = dense_image_warp_s2d(img, flow, gather_mode="fill")
    np.testing.assert_array_equal(np.asarray(promise), np.asarray(mapped))

    with pytest.raises(ValueError):
        dense_image_warp_s2d(img, flow, gather_mode="bogus")


def test_via_s2d_grads_in_mapped_and_chunked_branches(rng, monkeypatch):
    """The segment-sum warp backward (ops.warp._segsum_gather) must
    keep gradient equality with the pixel warp in its two rarer
    configurations: the per-stream lax.map gather branch (frames=1 per
    gather) and the frame-chunked one-hot backward (one-hot transient
    over SEGSUM_ONEHOT_BUDGET_BYTES)."""
    import jax

    import joshupscale_tpu.ops.warp as warp_mod
    from joshupscale_tpu.ops.warp import (
        dense_image_warp,
        dense_image_warp_via_s2d,
    )

    img = jnp.asarray(rng.standard_normal((4, 16, 24, 3)).astype(np.float32))
    flow = jnp.asarray(
        (rng.standard_normal((4, 16, 24, 2)) * 6).astype(np.float32))

    def loss(warp_fn, i, f):
        return jnp.sum(jnp.sin(warp_fn(i, f) * 3.0))

    ga_i, ga_f = jax.grad(lambda i, f: loss(dense_image_warp, i, f),
                          argnums=(0, 1))(img, flow)

    for name, patch in [
        ("mapped", ("FLAT_GATHER_MAX_ROWS", 1)),
        ("chunked", ("SEGSUM_ONEHOT_BUDGET_BYTES", 1)),
    ]:
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(warp_mod, *patch)
            gb_i, gb_f = jax.grad(
                lambda i, f: loss(dense_image_warp_via_s2d, i, f),
                argnums=(0, 1))(img, flow)
        np.testing.assert_allclose(np.asarray(ga_i), np.asarray(gb_i),
                                   atol=1e-4, rtol=1e-4, err_msg=name)
        np.testing.assert_allclose(np.asarray(ga_f), np.asarray(gb_f),
                                   atol=1e-4, rtol=1e-4, err_msg=name)
