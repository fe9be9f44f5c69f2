"""Contrastive-regularizer and telemetry (spectral-norm) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maua_tpu.train.contrastive import (
    contrastive_loss,
    contrastive_regularizer,
    init_projection_head,
    nt_xent_loss,
    project,
)
from maua_tpu.telemetry import init_spectral_state, spectral_norms
from maua_tpu.telemetry.spectral import summarize


def test_contrastive_loss_prefers_aligned_pairs():
    q = jnp.eye(4)
    aligned = contrastive_loss(q, q)
    shuffled = contrastive_loss(q, q[::-1])
    assert float(aligned) < float(shuffled)


def test_nt_xent_loss_finite_and_ordered():
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (6, 16))
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    same = nt_xent_loss(q, q)
    other = nt_xent_loss(q, jnp.roll(q, 1, axis=0))
    assert np.isfinite(float(same)) and float(same) < float(other)


def test_projection_head_and_regularizer():
    feat_dim = 2 * 4 * 4
    head = init_projection_head(jax.random.PRNGKey(0), feat_dim)

    def d_hidden(x):
        return x  # identity "features"

    orig = [jax.random.normal(jax.random.PRNGKey(1), (3, 2, 4, 4))]
    aug = [orig[0] + 0.01 * jax.random.normal(jax.random.PRNGKey(2), (3, 2, 4, 4))]
    loss = contrastive_regularizer(d_hidden, head, orig, aug)
    assert np.isfinite(float(loss))
    # projections are unit-norm
    p = project(head, orig[0])
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(p, axis=1)), 1.0, rtol=1e-5)


def test_discriminator_return_hidden():
    from maua_tpu.models import Discriminator

    d = Discriminator(size=16, channel_max=32)
    x = jnp.zeros((2, 3, 16, 16))
    variables = d.init(jax.random.PRNGKey(0), x)
    out, hidden = d.apply(variables, x, return_hidden=True)
    assert out.shape == (2, 1)
    assert hidden.shape[0] == 2 and hidden.ndim == 4


def test_spectral_norm_power_iteration_converges():
    # known singular value: diag matrix
    w = jnp.diag(jnp.asarray([3.0, 1.0, 0.5]))
    params = {"layer": {"weight": w}}
    state = init_spectral_state(params)
    for _ in range(30):
        sigmas, state = spectral_norms(params, state)
    assert float(sigmas["layer/weight"]) == pytest.approx(3.0, rel=1e-3)
    s = summarize(sigmas)
    assert s["spectral_max"] == pytest.approx(3.0, rel=1e-3)


def test_memory_tracing_helpers():
    from maua_tpu.telemetry import log_memory_deltas, memory_snapshot

    snap = memory_snapshot()
    assert isinstance(snap, dict)
    logs = []
    with log_memory_deltas("region", threshold_mb=0.0, sink=logs.append):
        _ = jnp.zeros((64, 64)) + 1
    # CPU backend may not expose stats; the context must not raise either way
    assert isinstance(logs, list)


def test_compile_stats_accumulate():
    import jax
    import jax.numpy as jnp

    from maua_tpu.telemetry import install_compile_metrics, log_compile_stats

    assert install_compile_metrics()
    assert install_compile_metrics()  # idempotent

    @jax.jit
    def _fresh(x):
        return jnp.tanh(x) * 3.14159  # unique body -> guaranteed fresh compile

    _fresh(jnp.ones((4, 4))).block_until_ready()
    stats = log_compile_stats()
    assert stats, "no events recorded by jax monitoring"
    assert any(k.endswith("/count") for k in stats)
    assert all(v >= 0 for v in stats.values())
