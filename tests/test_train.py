"""Training-stack tests: losses, lookahead, EMA, ADA, and the full train step
on an 8-device virtual CPU mesh (SURVEY.md §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maua_tpu.parallel import get_mesh, shard_batch
from maua_tpu.train import (
    ada_adjust_p,
    augment,
    d_logistic_loss,
    ema_update,
    g_nonsaturating_loss,
    init_train_state,
    lookahead_minimax_init,
    lookahead_minimax_step,
    make_train_config,
    make_train_step,
)
from maua_tpu.train.augment import sample_affine, sample_color, apply_color, apply_affine


def test_d_logistic_loss_matches_softplus():
    real = jnp.array([1.0, -2.0])
    fake = jnp.array([0.5, 3.0])
    expect = np.mean(np.log1p(np.exp(-np.asarray(real)))) + np.mean(
        np.log1p(np.exp(np.asarray(fake)))
    )
    np.testing.assert_allclose(d_logistic_loss(real, fake), expect, rtol=1e-6)
    np.testing.assert_allclose(
        g_nonsaturating_loss(fake), np.mean(np.log1p(np.exp(-np.asarray(fake)))), rtol=1e-6
    )


def test_ema_update():
    ema = {"w": jnp.ones(3)}
    p = {"w": jnp.zeros(3)}
    out = ema_update(ema, p, decay=0.9)
    np.testing.assert_allclose(out["w"], 0.9 * np.ones(3), rtol=1e-6)


def test_lookahead_minimax_sync_every_k():
    g = {"w": jnp.zeros(2)}
    d = {"w": jnp.zeros(2)}
    state = lookahead_minimax_init(g, d)
    # drift fast weights to 1.0; after k=3 steps they pull back halfway
    fast_g = {"w": jnp.ones(2)}
    fast_d = {"w": 2 * jnp.ones(2)}
    for i in range(3):
        state, out_g, out_d = lookahead_minimax_step(state, fast_g, fast_d, k=3, alpha=0.5)
    np.testing.assert_allclose(out_g["w"], 0.5 * np.ones(2))
    np.testing.assert_allclose(out_d["w"], 1.0 * np.ones(2))
    # slow cache refreshed to the interpolated point
    np.testing.assert_allclose(state.slow_g["w"], 0.5 * np.ones(2))


def test_ada_adjust_p_moves_toward_target():
    p = jnp.asarray(0.1)
    # overfit signal: all real preds positive -> r_t = 1 > 0.6 -> p up
    new_p, signs, n, r_t = ada_adjust_p(p, jnp.asarray(300.0), jnp.asarray(300.0))
    assert float(new_p) > 0.1
    assert float(signs) == 0.0 and float(n) == 0.0
    assert float(r_t) == pytest.approx(1.0)
    # under threshold: no change
    new_p2, signs2, n2, _ = ada_adjust_p(p, jnp.asarray(10.0), jnp.asarray(100.0))
    assert float(new_p2) == pytest.approx(0.1)
    assert float(n2) == pytest.approx(100.0)


def test_sample_affine_p0_identity():
    G = sample_affine(jax.random.PRNGKey(0), 0.0, 4, 32, 32)
    np.testing.assert_allclose(G, np.tile(np.eye(3), (4, 1, 1)), atol=1e-6)
    C = sample_color(jax.random.PRNGKey(1), 0.0, 4)
    np.testing.assert_allclose(C, np.tile(np.eye(4), (4, 1, 1)), atol=1e-6)


def test_apply_color_identity_and_brightness():
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8))
    C = jnp.tile(jnp.eye(4)[None], (2, 1, 1))
    np.testing.assert_allclose(apply_color(img, C), img, atol=1e-6)
    Cb = C.at[:, :3, 3].set(0.5)
    np.testing.assert_allclose(apply_color(img, Cb), img + 0.5, atol=1e-6)


def test_apply_affine_identity_roundtrip():
    """Identity affine through the oversample/resample path must approximately
    preserve the image interior (the SYM6 up/down cascade is near-unitary)."""
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 32, 32))
    G = jnp.tile(jnp.eye(3)[None], (1, 1, 1))
    out = apply_affine(img, G)
    assert out.shape == img.shape
    err = np.abs(np.asarray(out - img))[:, :, 4:-4, 4:-4]
    assert err.mean() < 0.05, err.mean()


def test_augment_grad_flows():
    """D augmentation must be differentiable for the G pass
    (reference: train.py:231-236)."""
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16, 16))

    def f(x):
        out, _ = augment(x, 0.5, rng=jax.random.PRNGKey(1))
        return jnp.sum(out**2)

    g = jax.grad(f)(img)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


@pytest.mark.slow
def test_train_step_end_to_end_mesh():
    """One full train step (D + R1 + ADA + G + path + lookahead + EMA) at 16²
    on the 8-device CPU mesh. Asserts REAL data parallelism: the batch axis is
    split 1/8 per device (the round-1 bug was silent PartitionSpec()
    replication), and the sharded step's metrics & updated params match a
    single-device run on the same global batch (the DDP-equivalence property —
    reference train.py:555-579's gradient all-reduce falls out of GSPMD)."""
    cfg = make_train_config(
        size=16,
        channel_max=32,
        batch_size=8,
        num_accumulate=1,
        augment=False,  # augment autodiff is covered by test_augment_grad_flows
        lookahead=True,
        la_steps=2,
        d_reg_every=1,
        g_reg_every=1,
    )
    state, gen, disc = init_train_state(jax.random.PRNGKey(0), cfg)
    step = jax.jit(make_train_step(gen, disc, cfg))

    mesh = get_mesh()
    n_dev = mesh.devices.size
    assert n_dev == 8
    real_host = jax.random.normal(
        jax.random.PRNGKey(1), (cfg.num_accumulate, cfg.batch_size, 3, 16, 16)
    )
    real = shard_batch(real_host, mesh, batch_dim=1)

    # the batch axis MUST be split — a replicated placement is the bug
    shard_shapes = {s.data.shape for s in real.addressable_shards}
    assert shard_shapes == {(1, cfg.batch_size // n_dev, 3, 16, 16)}, shard_shapes
    assert len({s.device for s in real.addressable_shards}) == n_dev

    g0 = jax.tree_util.tree_leaves(state.g_params)[0].copy()
    state_sharded, metrics_sharded = step(state, real, jax.random.PRNGKey(2))
    # same step, same global batch, single device: results must agree
    real_1dev = jax.device_put(real_host, jax.devices()[0])
    state_single, metrics_single = step(state, real_1dev, jax.random.PRNGKey(2))

    for k in metrics_sharded:
        a, b = float(metrics_sharded[k]), float(metrics_single[k])
        assert np.isfinite(a), (k, a)
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4, err_msg=k)
    gs = jax.tree_util.tree_leaves(state_sharded.g_params)[0]
    g1 = jax.tree_util.tree_leaves(state_single.g_params)[0]
    np.testing.assert_allclose(np.asarray(gs), np.asarray(g1), rtol=2e-3, atol=2e-4)

    # second sharded step: state advances and params keep moving
    state_sharded, metrics2 = step(state_sharded, real, jax.random.PRNGKey(3))
    for k, v in metrics2.items():
        assert np.isfinite(float(v)), (k, v)
    assert int(state_sharded.step) == 2
    assert not np.allclose(np.asarray(g0), np.asarray(gs))


def test_train_step_uint8_input_matches_f32():
    """The uint8 NHWC input path (device-side transpose + x/127.5 - 1,
    train/step.py) must reproduce the fp32 CHW path exactly: same batch fed
    both ways through the SAME jitted step gives identical metrics."""
    cfg = make_train_config(
        size=16,
        channel_max=32,
        batch_size=2,
        num_accumulate=1,
        augment=False,
        d_reg_every=1,
        g_reg_every=1,
    )
    state, gen, disc = init_train_state(jax.random.PRNGKey(0), cfg)
    step = jax.jit(make_train_step(gen, disc, cfg))

    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, (1, 2, 16, 16, 3), dtype=np.uint8)
    f32 = u8.transpose(0, 1, 4, 2, 3).astype(np.float32) * (1.0 / 127.5) - 1.0

    _, m_u8 = step(state, jnp.asarray(u8), jax.random.PRNGKey(2))
    _, m_f32 = step(state, jnp.asarray(f32), jax.random.PRNGKey(2))
    for k in m_f32:
        np.testing.assert_allclose(
            float(m_u8[k]), float(m_f32[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )


def test_loader_indices_disjoint_across_processes():
    """DistributedSampler semantics (reference train.py:31-37,592): two
    simulated processes must cover disjoint, exhaustive strided slices of the
    identically-shuffled epoch."""
    import itertools

    from maua_tpu.data.records import MultiResolutionRecordDataset

    class _FakeDS:
        def __len__(self):
            return 13

        iter_indices = MultiResolutionRecordDataset.iter_indices

    ds = _FakeDS()
    epoch = 13
    r0 = list(itertools.islice(ds.iter_indices(seed=5, process_index=0, process_count=2), 7))
    r1 = list(itertools.islice(ds.iter_indices(seed=5, process_index=1, process_count=2), 6))
    assert not (set(r0) & set(r1)), (r0, r1)
    assert sorted(r0 + r1) == list(range(epoch))
    # deterministic across hosts: same shuffle, complementary strides
    full = list(itertools.islice(ds.iter_indices(seed=5, process_index=0, process_count=1), epoch))
    assert r0 == full[0::2] and r1 == full[1::2]


@pytest.mark.slow
def test_train_step_with_contrastive_and_bcr():
    """Contrastive + bCR regularizers active: one step, finite metrics, the
    projection head moves with D's optimizer (reference: train.py:177-189)."""
    cfg = make_train_config(
        size=16,
        channel_max=32,
        batch_size=4,
        num_accumulate=1,
        augment=False,  # forced back on by the derived-arg rule below
        bcr_weight=1.0,
        contrastive_weight=0.5,
        lookahead=False,
        d_reg_every=1000,  # keep this test to the D/G phases
        g_reg_every=1000,
        path_regularize=0.0,
        r1=0.0,
    )
    assert cfg.augment  # bCR/contrastive force augmentation (train.py:427-428)
    state, gen, disc = init_train_state(jax.random.PRNGKey(0), cfg)
    assert state.cl_head is not None
    step = jax.jit(make_train_step(gen, disc, cfg))

    real = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.batch_size, 3, 16, 16))
    h0 = np.asarray(state.cl_head["w1"]).copy()
    state, metrics = step(state, real, jax.random.PRNGKey(2))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    assert not np.allclose(h0, np.asarray(state.cl_head["w1"]))


def test_contrastive_queue_mechanics():
    """MoCo queue unit semantics (reference contrastive_learner.py:230-253):
    unfilled slots are masked (loss with an empty queue == plain InfoNCE),
    enqueue wraps as a ring buffer, and queued keys change the loss."""
    import jax
    import jax.numpy as jnp

    from maua_tpu.train.contrastive import (
        ContrastiveState,
        contrastive_loss,
        contrastive_loss_with_queue,
        enqueue_keys,
        init_contrastive_state,
    )

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (4, 8))
    kk = jax.random.normal(k2, (4, 8))

    st = init_contrastive_state(None, use_momentum=False, queue_size=8, out_dim=8)
    assert st is not None and st.key_d_params is None and st.queue.shape == (8, 8)

    # empty queue: masked slots contribute nothing
    empty = contrastive_loss_with_queue(q, kk, st.queue, st.queue_filled)
    plain = contrastive_loss(q, kk)
    assert np.allclose(float(empty), float(plain), atol=1e-6)

    # enqueue two batches -> full; pointer wraps to 0
    st = enqueue_keys(st, kk)
    assert int(st.queue_ptr) == 4 and int(st.queue_filled) == 4
    st = enqueue_keys(st, jax.random.normal(k3, (4, 8)))
    assert int(st.queue_ptr) == 0 and int(st.queue_filled) == 8
    # a third enqueue overwrites the oldest slots (ring semantics)
    st2 = enqueue_keys(st, q)
    assert np.allclose(np.asarray(st2.queue[:4]), np.asarray(q))

    # extra negatives raise the loss when they resemble the positives
    with_negs = contrastive_loss_with_queue(q, kk, st.queue, st.queue_filled)
    assert float(with_negs) > float(plain)


@pytest.mark.slow
def test_train_step_with_moco_contrastive():
    """Momentum key encoder + key queue through two full jitted steps
    (reference contrastive_learner.py:155-253): metrics stay finite, the
    queue fills by 2*batch keys per step, and the key encoder EMA-tracks D
    (moved from init, but not equal to D)."""
    cfg = make_train_config(
        size=16,
        channel_max=32,
        batch_size=4,
        num_accumulate=1,
        contrastive_weight=0.5,
        contrastive_momentum=0.9,
        contrastive_queue=16,  # multiple of 2*batch
        contrastive_bilinear=True,
        lookahead=False,
        d_reg_every=1000,
        g_reg_every=1000,
        path_regularize=0.0,
        r1=0.0,
    )
    state, gen, disc = init_train_state(jax.random.PRNGKey(0), cfg)
    assert state.cl_state is not None and state.cl_state.queue.shape == (16, 128)
    key0 = jax.tree_util.tree_leaves(state.cl_state.key_d_params)[0]
    step = jax.jit(make_train_step(gen, disc, cfg))

    real = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.batch_size, 3, 16, 16))
    state, metrics = step(state, real, jax.random.PRNGKey(2))
    state, metrics = step(state, real, jax.random.PRNGKey(3))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    assert int(state.cl_state.queue_filled) == 16  # 2 steps x 2*batch keys
    assert int(state.cl_state.queue_ptr) == 0
    # key encoder moved (EMA toward D) but is not D
    key1 = jax.tree_util.tree_leaves(state.cl_state.key_d_params)[0]
    d1 = jax.tree_util.tree_leaves(state.d_params)[0]
    assert not np.allclose(np.asarray(key0), np.asarray(key1))
    assert not np.allclose(np.asarray(key1), np.asarray(d1))
    # the bilinear key transform trains with D's optimizer away from identity
    bw = np.asarray(state.cl_head["bw"])
    assert bw.shape == (128, 128) and not np.allclose(bw, np.eye(128))


def test_bilinear_sample_packed_matches_plain():
    """The TPU packed single-gather warp sampler is bit-equivalent to the
    plain 4-gather form (compared directly, not via the platform dispatch,
    which would be vacuous on non-CPU backends), including out-of-range zeros
    — and its custom VJP
    (2-D [C*4,HW] scatter backward) matches autodiff of the plain form for
    both image and coordinate gradients (C>1 guards the channel-major update
    ordering)."""
    import jax
    import jax.numpy as jnp

    from maua_tpu.train.augment import _bilinear_sample_packed, _bilinear_sample_plain

    img = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 20, 24))
    coords = (
        jax.random.uniform(jax.random.PRNGKey(1), (2, 2, 16, 16), minval=-4.0, maxval=28.0)
        + 0.3
    )  # spans in-band, edge, and far-out-of-range; offset avoids integer-coord grad kinks
    a = np.asarray(_bilinear_sample_plain(img, coords))
    b = np.asarray(_bilinear_sample_packed(img, coords))
    np.testing.assert_allclose(a, b, atol=1e-6)

    cot = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 16, 16))
    gi_p, gc_p = jax.vjp(_bilinear_sample_packed, img, coords)[1](cot)
    gi_n, gc_n = jax.vjp(_bilinear_sample_plain, img, coords)[1](cot)
    np.testing.assert_allclose(np.asarray(gi_p), np.asarray(gi_n), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc_p), np.asarray(gc_n), atol=1e-5)


def test_apply_affine_matmul_matches_conv():
    """The high-res TPU warp path (banded-matrix matmul resampling on
    [B*C, H, W] + folded windowed gather with its custom VJP) is numerically
    identical to the conv path — values, image grads, and affine-matrix grads
    (the folded custom VJP's coordinate backward). The matmul path exists
    because a grouped conv over a C=3 image at 1024^2 puts channels in the
    128-lane dim (42x tile padding -> 19.6 GiB OOM, measured on-chip)."""
    import jax
    import jax.numpy as jnp

    from maua_tpu.train.augment import (
        _bilinear_sample_folded,
        _bilinear_sample_folded_plain,
        apply_affine,
        sample_affine,
    )

    img = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 24, 20))
    G = sample_affine(jax.random.PRNGKey(1), jnp.asarray(0.7), 2, 24, 20)

    a = apply_affine(img, G, method="conv")
    m = apply_affine(img, G, method="matmul")
    np.testing.assert_allclose(np.asarray(a), np.asarray(m), atol=2e-6)

    ga = jax.grad(lambda x: jnp.sum(apply_affine(x, G, method="conv") ** 2))(img)
    gm = jax.grad(lambda x: jnp.sum(apply_affine(x, G, method="matmul") ** 2))(img)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gm), atol=1e-5)

    gGa = jax.grad(lambda g: jnp.sum(apply_affine(img, g, method="conv") ** 2))(G)
    gGm = jax.grad(lambda g: jnp.sum(apply_affine(img, g, method="matmul") ** 2))(G)
    np.testing.assert_allclose(np.asarray(gGa), np.asarray(gGm), rtol=3e-5, atol=1e-4)

    # folded sampler vs its plain oracle, incl. out-of-range zeros
    img3 = img.reshape(6, 24, 20)
    coords = (
        jax.random.uniform(jax.random.PRNGKey(2), (2, 2, 16, 16), minval=-4.0, maxval=28.0)
        + 0.3
    )
    o1 = _bilinear_sample_folded(img3, coords, 3)
    o2 = _bilinear_sample_folded_plain(img3, coords, 3)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_apply_affine_fast_warp_mode():
    """oversample_grid=False (the 1x-output-grid training mode for >=512^2):
    correct gain (identity transform reproduces the image) and close to the
    exact dual-side-oversampled result on smooth content."""
    import jax
    import jax.numpy as jnp

    from maua_tpu.train.augment import apply_affine

    # smooth image: low-frequency content where skipping the output-side
    # post-filter is nearly lossless
    ys, xs = jnp.meshgrid(jnp.linspace(0, 3, 32), jnp.linspace(0, 2, 32), indexing="ij")
    img = jnp.stack([jnp.sin(ys + c) * jnp.cos(xs - c) for c in range(3)])[None]
    img = jnp.concatenate([img, img * 0.5], axis=0)  # [2,3,32,32]

    eye = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
    out_id = apply_affine(img, eye, method="matmul", oversample_grid=False)
    # the SYM6 cascade is not perfect-reconstruction at the borders (same as
    # the reference, PARITY.md §2.5) — pin the interior
    np.testing.assert_allclose(
        np.asarray(out_id)[:, :, 4:-4, 4:-4], np.asarray(img)[:, :, 4:-4, 4:-4], atol=0.05
    )

    from maua_tpu.train.augment import sample_affine

    G = sample_affine(jax.random.PRNGKey(1), jnp.asarray(0.5), 2, 32, 32)
    exact = apply_affine(img, G, method="matmul", oversample_grid=True)
    fast = apply_affine(img, G, method="matmul", oversample_grid=False)
    # same geometry, slightly different filtering: interiors agree closely
    err = np.abs(np.asarray(exact - fast))[:, :, 4:-4, 4:-4]
    assert err.max() < 0.05, err.max()

    with pytest.raises(NotImplementedError):
        apply_affine(img, eye, method="conv", oversample_grid=False)


def test_affine_warp_fft_exact_cases():
    """The gather-free FFT-shear warp (train/fft_warp.py) is EXACT (not just
    close) for the lattice-preserving transforms ADA samples — identity,
    x-flip, 90-degree rotation, integer translation — because integer-rounded
    band centering leaves only integer FFT shifts (exact circular rolls) and
    unit-scale band matrices (exact taps). taper off to test the raw warp."""
    import jax
    import jax.numpy as jnp

    from maua_tpu.train.fft_warp import affine_warp_fft

    h = 32
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 3, h, h))

    eye = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
    out = affine_warp_fft(img, eye, taper_from=None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)

    # x-flip: pixel x' reads w-1-x' (pixel-center symmetric grid)
    flip = jnp.broadcast_to(jnp.diag(jnp.array([-1.0, 1.0, 1.0])), (2, 3, 3))
    out = affine_warp_fft(img, flip, taper_from=None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img[..., ::-1]), atol=1e-4)

    # 90-degree rotation = transpose + flip on the pixel lattice
    c, s = 0.0, 1.0
    rot = jnp.broadcast_to(
        jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]]), (2, 3, 3)
    )
    out = affine_warp_fft(img, rot, taper_from=None)
    ref = jnp.rot90(img, k=-1, axes=(-2, -1))
    # direction-agnostic check: one of the two 90-degree turns must match
    ref2 = jnp.rot90(img, k=1, axes=(-2, -1))
    err1 = float(jnp.max(jnp.abs(out - ref)))
    err2 = float(jnp.max(jnp.abs(out - ref2)))
    assert min(err1, err2) < 1e-4, (err1, err2)

    # integer translation by k pixels reads the reflect-padded source exactly
    k = 3
    tr = jnp.broadcast_to(
        jnp.array([[1.0, 0.0, 2.0 * k / h], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]), (2, 3, 3)
    )
    out = affine_warp_fft(img, tr, taper_from=None)
    padded = jnp.pad(img, ((0, 0), (0, 0), (0, 0), (k, 0)), mode="reflect")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(padded[..., :h]), atol=1e-4
    )


def test_affine_warp_fft_matches_gather_on_smooth():
    """On smooth content the FFT-shear warp agrees with the gather fast-warp
    path for random ADA affines (different interpolants — periodic sinc +
    widened tri vs 2x-oversampled bilinear — so interior tolerance, same
    spirit as test_apply_affine_fast_warp_mode), and gradients flow."""
    import jax
    import jax.numpy as jnp

    from maua_tpu.train.augment import apply_affine, augment, sample_affine
    from maua_tpu.train.fft_warp import affine_warp_fft

    ys, xs = jnp.meshgrid(jnp.linspace(0, 3, 32), jnp.linspace(0, 2, 32), indexing="ij")
    img = jnp.stack([jnp.sin(ys + c) * jnp.cos(xs - c) for c in range(3)])[None]
    img = jnp.concatenate([img, img * 0.5], axis=0)  # [2,3,32,32]

    G = sample_affine(jax.random.PRNGKey(1), jnp.asarray(0.5), 2, 32, 32)
    gather = apply_affine(img, G, method="matmul", oversample_grid=False)
    fft = affine_warp_fft(img, G, taper_from=None)
    np.testing.assert_allclose(
        np.asarray(fft)[:, :, 6:-6, 6:-6], np.asarray(gather)[:, :, 6:-6, 6:-6], atol=0.06
    )

    # default taper on: finite, close to untapered on smooth content
    fft_t = affine_warp_fft(img, G)
    assert np.isfinite(np.asarray(fft_t)).all()
    np.testing.assert_allclose(
        np.asarray(fft_t)[:, :, 6:-6, 6:-6], np.asarray(fft)[:, :, 6:-6, 6:-6], atol=0.05
    )

    g = jax.grad(lambda x: jnp.sum(affine_warp_fft(x, G) ** 2))(img)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0

    # augment() integration: warp_method="fft" end to end (affine + color)
    out, _ = augment(img, jnp.asarray(0.8), rng=jax.random.PRNGKey(3), warp_method="fft")
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()

    # non-square guard
    import pytest as _pytest

    with _pytest.raises(ValueError, match="square"):
        affine_warp_fft(jnp.zeros((1, 3, 16, 32)), jnp.broadcast_to(jnp.eye(3), (1, 3, 3)))


def test_affine_warp_fft_on_mesh():
    """The FFT-shear warp is batch-shardable (every op — FFT, phase multiply,
    band matmul — is per-sample): sharded output equals the single-device
    run. This is the warp the multichip dryrun trains with."""
    import jax
    import jax.numpy as jnp

    from maua_tpu.parallel import get_mesh, shard_batch
    from maua_tpu.train.augment import sample_affine
    from maua_tpu.train.fft_warp import affine_warp_fft

    mesh = get_mesh()
    n = mesh.devices.size
    img = jax.random.normal(jax.random.PRNGKey(0), (n, 3, 16, 16))
    G = sample_affine(jax.random.PRNGKey(1), jnp.asarray(0.8), n, 16, 16)

    ref = jax.jit(affine_warp_fft)(img, G)
    img_s = shard_batch(img, mesh, batch_dim=0)
    G_s = shard_batch(G, mesh, batch_dim=0)
    out = jax.jit(affine_warp_fft)(img_s, G_s)
    assert len({s.device for s in out.addressable_shards}) == n
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_affine_warp_fft_conditional_taper_exact_on_lattice():
    """With the DEFAULT taper ON, lattice-preserving transforms stay exact:
    the taper is per-row conditional on a fractional shift (fft_warp.py),
    so identity / flips / 90-degree turns / integer translations — in
    particular every identity-transformed image during the ADA warm-up —
    are pure sample relabelings (round-3 VERDICT weak #2: the always-on
    taper low-passed ALL images even at identity)."""
    import jax
    import jax.numpy as jnp

    from maua_tpu.train.fft_warp import affine_warp_fft

    h = 32
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 3, h, h))

    eye = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
    out = affine_warp_fft(img, eye)  # taper_from=0.85 default, conditional
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)

    flip = jnp.broadcast_to(jnp.diag(jnp.array([-1.0, 1.0, 1.0])), (2, 3, 3))
    out = affine_warp_fft(img, flip)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img[..., ::-1]), atol=1e-4)

    k = 5
    tr = jnp.broadcast_to(
        jnp.array([[1.0, 0.0, 2.0 * k / h], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]), (2, 3, 3)
    )
    out = affine_warp_fft(img, tr)
    padded = jnp.pad(img, ((0, 0), (0, 0), (0, 0), (k, 0)), mode="reflect")
    np.testing.assert_allclose(np.asarray(out), np.asarray(padded[..., :h]), atol=1e-4)

    # a genuinely fractional transform must still BE tapered: always-mode and
    # conditional-mode agree (all rows fractional), and both differ from
    # untapered output at the top of the band
    frac_tr = jnp.broadcast_to(
        jnp.array([[1.0, 0.0, 2.0 * 2.5 / h], [0.0, 1.0, 2.0 * 1.5 / h], [0.0, 0.0, 1.0]]),
        (2, 3, 3),
    )
    cond = affine_warp_fft(img, frac_tr)
    always = affine_warp_fft(img, frac_tr, taper_conditional=False)
    none = affine_warp_fft(img, frac_tr, taper_from=None)
    np.testing.assert_allclose(np.asarray(cond), np.asarray(always), atol=1e-5)
    assert float(jnp.max(jnp.abs(cond - none))) > 1e-3


def test_affine_warp_fft_dftmm_impl_matches():
    """The "dftmm" shear impl (shared DFT matmuls on the MXU — the TPU bf16
    fast path, fft_warp._shift_rows_dftmm) computes the SAME transform as the
    jnp.fft impl: fp32 agrees to fp32 rounding; bf16 agrees to bf16
    coefficient-rounding noise (~2e-2 on full-spectrum random images — the
    worst case; bf16 itself quantizes ±1 values at ~8e-3). Gradients flow
    (it is plain matmuls, no custom VJP needed)."""
    import jax
    import jax.numpy as jnp

    from maua_tpu.train.fft_warp import _fft_shift_rows, affine_warp_fft

    h = 36
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 3, h, h).astype(np.float32)) * 2 - 1
    c, s = np.cos(0.3), np.sin(0.3)
    G = np.stack([
        np.array([[1.0, 0.1, 0.08], [0.0, 1.0, -0.05], [0, 0, 1]], np.float32),
        np.array([[c, -s, 0.0], [s, c, 0.0], [0, 0, 1]], np.float32),
    ])
    G = jnp.asarray(G)

    wf = affine_warp_fft(img, G, shear_impl="fft")
    wd = affine_warp_fft(img, G, shear_impl="dftmm")
    np.testing.assert_allclose(np.asarray(wd), np.asarray(wf), atol=1e-5)

    wdb = affine_warp_fft(img.astype(jnp.bfloat16), G, shear_impl="dftmm")
    assert float(jnp.abs(wdb.astype(jnp.float32) - wf).max()) < 5e-2

    # raw shear: integer and fractional shifts agree across impls
    shift = jnp.asarray(rng.uniform(-5, 5, (2, 1, h)).astype(np.float32))
    a = _fft_shift_rows(img, shift, 0.85, True, "fft")
    b = _fft_shift_rows(img, shift, 0.85, True, "dftmm")
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)

    # gradient flows through the dftmm warp (the G-phase path)
    g = jax.grad(lambda x: jnp.sum(affine_warp_fft(x, G, shear_impl="dftmm") ** 2))(img)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0
