"""Reactive toolkit tests: latent interpolation, perlin noise, bends, rewrites."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maua_tpu.reactive import (
    add_noise_bend,
    bends_for_batch,
    chroma_weight_latents,
    looping_perlin,
    perlin_noise,
    reactive_noise,
    rewrites_for_batch,
    Rewrite,
    rotate_bend,
    slerp,
    slerp_loops,
    spline_loops,
    translate_bend,
    wrapping_slice,
    zoom_bend,
)


def test_chroma_weight_latents_shapes_and_mixing():
    T, N, L, D = 10, 12, 18, 512
    chroma = jnp.zeros((T, N)).at[:, 3].set(1.0)  # only note 3 active
    lats = jnp.asarray(np.random.RandomState(0).randn(N, L, D).astype(np.float32))
    out = chroma_weight_latents(chroma, lats)
    assert out.shape == (T, L, D)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(lats[3]), rtol=1e-5)


def test_slerp_endpoints_and_norm():
    rng = np.random.RandomState(0)
    a, b = rng.randn(8), rng.randn(8)
    np.testing.assert_allclose(slerp(0.0, a, b), a, atol=1e-9)
    np.testing.assert_allclose(slerp(1.0, a, b), b, atol=1e-9)


def test_slerp_loops_shape_and_looping():
    sel = np.random.RandomState(0).randn(4, 18, 32).astype(np.float32)
    out = np.asarray(slerp_loops(sel, 120, 2, smoothing=1, n_latent=18))
    assert out.shape == (120, 18, 32)
    # looped: second half should equal first half
    np.testing.assert_allclose(out[:60], out[60:], atol=1e-4)


def test_spline_loops_shape_passes_through_keyframes_loosely():
    sel = np.random.RandomState(1).randn(4, 6, 16).astype(np.float32)
    out = np.asarray(spline_loops(sel, 100, 1))
    assert out.shape == (100, 6, 16)
    np.testing.assert_allclose(out[0], sel[0], atol=1e-3)


def test_wrapping_slice():
    t = jnp.arange(10)
    s = np.asarray(wrapping_slice(t, 8, 5))
    np.testing.assert_array_equal(s, [8, 9, 0, 1, 2])
    idx = np.asarray(wrapping_slice(t, 8, 5, return_indices=True))
    np.testing.assert_array_equal(idx, [8, 9, 0, 1, 2])


def test_perlin_noise_range_and_tileability():
    p = np.asarray(perlin_noise(jax.random.PRNGKey(0), (8, 16, 16), (2, 2, 2), (True, False, False)))
    assert p.shape == (8, 16, 16)
    # reference applies *2-1 to the signed dot-grid values (latent.py:246), so
    # the range is roughly [-2.4, 0.4]
    assert p.min() >= -3.0 and p.max() <= 1.0 + 1e-5
    # time-tileable: value at frame 0 == continuation after frame 8 would wrap;
    # check first-lattice-row gradients were made equal by comparing the
    # boundary smoothness: |p[0]-p[-1]| should be comparable to |p[0]-p[1]|
    wrap_d = np.abs(p[0] - p[-1]).mean()
    step_d = np.abs(p[1] - p[0]).mean()
    assert wrap_d < 4 * step_d + 1e-3


def test_looping_perlin_and_reactive_noise_shapes():
    lp = looping_perlin(jax.random.PRNGKey(0), 10, 8, 8)
    assert lp.shape == (10, 1, 8, 8)
    env = jnp.linspace(0, 1, 12)
    rn = reactive_noise(jax.random.PRNGKey(1), env, 8, 8)
    assert rn.shape == (12, 1, 8, 8)
    assert np.isfinite(np.asarray(rn)).all()


def test_translate_bend_scrolls():
    """The reference's asymmetric 5×-pad + center-crop means t=0 is mid-phase
    (not identity); the invariant is translation-equivariance: scrolling by
    mod·w pixels shifts the t=0 output (reference: bend.py:51-70)."""
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 8, 8).astype(np.float32))
    pairs0 = bends_for_batch([translate_bend(1, modulation=jnp.asarray([0.0, 0.0]))], 0, 2)
    assert pairs0[0][0] == 1
    out0 = np.asarray(pairs0[0][1](x))
    assert out0.shape == x.shape

    # 2px at w=8: content moves right by 2
    out2 = np.asarray(bends_for_batch([translate_bend(1, modulation=jnp.asarray([0.25, 0.25]))], 0, 2)[0][1](x))
    np.testing.assert_allclose(out2[:, :, :, 2:], out0[:, :, :, :6], atol=1e-3)

    # full period (mod=1 -> w pixels) inside the reflection pad stays finite
    outw = np.asarray(bends_for_batch([translate_bend(1, modulation=jnp.asarray([1.0, 1.0]))], 0, 2)[0][1](x))
    assert np.isfinite(outw).all()


def test_zoom_and_rotate_bend_identity():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 9, 9).astype(np.float32))
    z = zoom_bend(0, modulation=jnp.asarray([1.0]))
    out = bends_for_batch([z], 0, 1)[0][1](x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)
    r = rotate_bend(0, modulation=jnp.asarray([0.0]))
    out_r = bends_for_batch([r], 0, 1)[0][1](x)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(x), atol=1e-4)
    # 360° rotation is also identity (interior — corners touch padding)
    r360 = rotate_bend(0, modulation=jnp.asarray([360.0]))
    out_r3 = bends_for_batch([r360], 0, 1)[0][1](x)
    np.testing.assert_allclose(
        np.asarray(out_r3[:, :, 2:-2, 2:-2]), np.asarray(x[:, :, 2:-2, 2:-2]), atol=1e-3
    )


def test_add_noise_bend_modulated():
    x = jnp.zeros((2, 1, 4, 4))
    noise = jnp.ones((1, 1, 4, 4))
    b = add_noise_bend(0, noise, modulation=jnp.asarray([0.5, 2.0]))
    out = bends_for_batch([b], 0, 2)[0][1](x)
    np.testing.assert_allclose(np.asarray(out[0]), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), 2.0, atol=1e-6)


def test_rewrites_produce_new_pytree():
    params = {"convs_0": {"conv": {"weight": jnp.ones((4, 4))}}, "other": {"w": jnp.zeros(2)}}
    rw = Rewrite(
        "convs_0/conv/weight",
        lambda w, mod: w * (1.0 + jnp.mean(mod)),
        modulation=jnp.asarray([1.0, 1.0, 3.0]),
    )
    out = rewrites_for_batch(params, [rw], 0, 2)
    np.testing.assert_allclose(np.asarray(out["convs_0"]["conv"]["weight"]), 2.0)
    # original untouched; unrelated subtree shared
    np.testing.assert_allclose(np.asarray(params["convs_0"]["conv"]["weight"]), 1.0)
    assert out["other"] is params["other"]
