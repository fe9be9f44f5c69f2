"""Eval metric tests: Fréchet distance math, PRDC sanity, PPL pipeline, and
feature-net architecture/ingestion shape checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maua_tpu.eval import (
    LPIPS,
    compute_stats,
    fid,
    fid_from_features,
    frechet_distance,
    ppl,
    prdc,
)


def test_frechet_distance_identical_is_zero():
    rng = np.random.RandomState(0)
    f = rng.randn(500, 16)
    mu, sigma = compute_stats(f)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-6)


def test_frechet_distance_mean_shift():
    """For identical covariance, FID = ||mu1-mu2||²."""
    rng = np.random.RandomState(0)
    f = rng.randn(2000, 8)
    mu, sigma = compute_stats(f)
    shift = np.full(8, 0.5)
    d = frechet_distance(mu, sigma, mu + shift, sigma)
    assert d == pytest.approx(float(shift @ shift), rel=1e-6)


def test_fid_from_features_monotone_in_shift():
    rng = np.random.RandomState(0)
    real = rng.randn(1000, 8)
    stats = compute_stats(real)
    near = rng.randn(1000, 8) * 1.0
    far = rng.randn(1000, 8) + 3.0
    assert fid_from_features(near, *stats) < fid_from_features(far, *stats)


def test_prdc_identical_distributions():
    rng = np.random.RandomState(0)
    real = rng.randn(200, 4)
    fake = rng.randn(200, 4)
    out = prdc(real, fake, nearest_k=5)
    assert 0.8 < out["precision"] <= 1.0
    assert 0.8 < out["recall"] <= 1.0
    assert out["coverage"] > 0.8
    far = prdc(real, fake + 10.0, nearest_k=5)
    assert far["precision"] < 0.1 and far["coverage"] < 0.1


def test_fid_sampling_loop():
    """fid() end-to-end with a toy 'generator' and identity features."""
    real_feats = np.random.RandomState(0).randn(500, 6).astype(np.float32)
    stats = compute_stats(real_feats)

    def synthesize(key, batch):
        return jax.random.normal(key, (batch, 6))

    out = fid(synthesize, lambda x: x, stats, n_sample=300, batch_size=50)
    assert out["fid"] < 1.0  # same distribution -> small


def test_ppl_smooth_vs_wild_mapping():
    """A smoother image-from-w map must score lower PPL."""

    def mk(scale):
        def synthesize_from_w(w):
            return jnp.tanh(w[:, :4] * scale).reshape(-1, 1, 2, 2)

        return synthesize_from_w

    def map_latents(key, n):
        return jax.random.normal(key, (n, 8))

    def dist(a, b):
        return jnp.sum(jnp.square(a - b), axis=(1, 2, 3))

    smooth = ppl(mk(0.1), map_latents, dist, n_sample=64, batch_size=16)
    wild = ppl(mk(3.0), map_latents, dist, n_sample=64, batch_size=16)
    assert smooth < wild


def test_fid_sampler_receives_reference_truncation_protocol():
    """Protocol pin (reference validation/metrics.py:100-103): when truncation
    is unspecified, every batch synthesizes with a fresh truncation drawn
    U(0.9, 1.5); a fixed --truncation passes through verbatim."""
    real_feats = np.random.RandomState(0).randn(200, 6).astype(np.float32)
    stats = compute_stats(real_feats)
    seen = []

    def synthesize(key, batch, trunc):
        seen.append(float(trunc))
        return jax.random.normal(key, (batch, 6))

    fid(synthesize, lambda x: x, stats, n_sample=150, batch_size=50)
    assert len(seen) == 3
    assert all(0.9 <= t <= 1.5 for t in seen)
    assert len(set(seen)) > 1, "truncation must be re-drawn per batch"

    seen.clear()
    fid(synthesize, lambda x: x, stats, n_sample=100, batch_size=50, truncation=0.7)
    assert seen == [0.7, 0.7]


def test_ppl_downsamples_above_256_only():
    """Protocol pin (reference validation/metrics.py:257-261): images >256 are
    bilinearly resized to 256 BEFORE the perceptual distance; 256 and below
    pass through untouched. Shapes are static under jit, so the distance_fn
    can assert them at trace time."""
    import jax.numpy as jnp

    def run(res):
        shapes = []

        def synthesize_from_w(w):
            return jnp.broadcast_to(
                jnp.tanh(w[:, :1])[:, :, None, None], (w.shape[0], 3, res, res)
            )

        def dist(a, b):
            shapes.append(a.shape)
            return jnp.mean(jnp.square(a - b), axis=(1, 2, 3))

        ppl(synthesize_from_w, lambda k, n: jax.random.normal(k, (n, 8)), dist,
            n_sample=8, batch_size=4)
        return shapes[0]

    assert run(512)[-2:] == (256, 256)
    assert run(1024)[-2:] == (256, 256)
    assert run(256)[-2:] == (256, 256)
    assert run(64)[-2:] == (64, 64)


def test_ppl_golden_vs_reference_math():
    """Golden comparison of the full ppl() pipeline against an independent
    re-implementation of the reference's math (validation/metrics.py:221-274):
    identical RNG draws, numpy lerp, torch F.interpolate(bilinear,
    align_corners=False) as the downsample oracle, and the reference's
    lower/higher percentile filter."""
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    D, B, N, RES, EPS = 8, 4, 16, 512, 1e-4

    def synthesize_from_w(w):
        # deterministic toy generator: [N,D] -> [N,3,RES,RES] (traceable)
        base = jnp.linspace(-1, 1, RES, dtype=jnp.float32)
        grid = jnp.tanh(base[:, None] * base[None, :])[None, None]
        return jnp.tanh(w[:, :3, None, None] * grid + w[:, 3:6, None, None] * 0.3)

    def synth_np(w):
        return np.asarray(synthesize_from_w(jnp.asarray(np.asarray(w, np.float32))))

    def map_latents(key, n):
        return jax.random.normal(key, (n, D))

    def dist(a, b):
        return jnp.mean(jnp.square(a - b), axis=(1, 2, 3))

    rng0 = jax.random.PRNGKey(11)
    got = ppl(synthesize_from_w, map_latents, dist, n_sample=N, batch_size=B,
              eps=EPS, rng=rng0)

    # ---- independent reference-math pipeline, replaying the same draws ----
    dists = []
    rng = rng0
    for _ in range(-(-N // B)):
        rng, key = jax.random.split(rng)
        k1, k2 = jax.random.split(key)
        w = np.asarray(jax.random.normal(k1, (B * 2, D)))
        t = np.asarray(jax.random.uniform(k2, (B, 1)))
        w0, w1 = w[::2], w[1::2]
        wt0 = w0 + (w1 - w0) * t
        wt1 = w0 + (w1 - w0) * (t + EPS)
        img = synth_np(np.concatenate([wt0, wt1]))
        img = F.interpolate(
            torch.from_numpy(img), size=(256, 256), mode="bilinear", align_corners=False
        ).numpy()
        d = ((img[:B] - img[B:]) ** 2).mean(axis=(1, 2, 3)) / EPS**2
        dists.append(d)
    d = np.concatenate(dists)[:N]
    lo = np.percentile(d, 1, method="lower")
    hi = np.percentile(d, 99, method="higher")
    want = d[(d >= lo) & (d <= hi)].mean()

    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_lpips_architecture_zero_for_identical():
    lp = LPIPS(net="alex")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 64, 64))
    params = lp.init(jax.random.PRNGKey(1), x, x)
    d_same = lp.apply(params, x, x)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    y = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 64, 64))
    d_diff = np.asarray(lp.apply(params, x, y))
    assert (d_diff > 0).all()


@pytest.mark.slow
def test_inception_architecture_shapes():
    from maua_tpu.eval import InceptionV3

    net = InceptionV3()
    x = jnp.zeros((1, 3, 299, 299))
    params = net.init(jax.random.PRNGKey(0), x)
    feats = net.apply(params, x)
    assert feats.shape == (1, 2048)
    # resize preprocessing from generator-native size
    img = jnp.zeros((2, 3, 64, 64))
    feats2 = net.apply(params, InceptionV3.preprocess(img))
    assert feats2.shape == (2, 2048)


def test_vae_fid_reconstruction_better_than_noise():
    from maua_tpu.eval import vae_fid

    rng = np.random.RandomState(0)
    data = [rng.rand(16, 4).astype(np.float32) for _ in range(4)]

    ident = vae_fid(lambda x: x + 0.01, lambda x: x, iter(data), n_sample=64)
    noisy = vae_fid(lambda x: x * 0 + 5.0, lambda x: x, iter(data), n_sample=64)
    assert ident < noisy


def test_weights_fingerprint_provenance():
    """Metric output provenance (VERDICT r3 item 6): the fingerprint is a
    deterministic function of the weights alone — same tree hashes equal,
    any perturbed leaf or renamed key hashes different — so FID/PPL JSON
    records WHICH backbone produced the number."""
    from maua_tpu.eval import weights_fingerprint

    rng = np.random.RandomState(0)
    tree = {"a": {"w": rng.rand(4, 4).astype(np.float32)}, "b": rng.rand(3).astype(np.float32)}
    f1 = weights_fingerprint(tree)
    f2 = weights_fingerprint(jax.tree_util.tree_map(jnp.asarray, tree))  # jax leaves hash like numpy
    assert f1 == f2 and len(f1) == 16

    bumped = {"a": {"w": tree["a"]["w"] + 1e-6}, "b": tree["b"]}
    assert weights_fingerprint(bumped) != f1
    renamed = {"a": {"v": tree["a"]["w"]}, "b": tree["b"]}
    assert weights_fingerprint(renamed) != f1


def test_eval_cli_json_carries_provenance(tmp_path, capsys):
    """The ppl subcommand's JSON output must tag distance + pretrained +
    fingerprint (None for the random-proxy path)."""
    import json as _json

    import torch

    from maua_tpu.eval.cli import main as eval_main
    from maua_tpu.io.torch_export import generator_state_dict_to_torch
    from maua_tpu.models import Generator

    gen = Generator(size=16, channel_max=16)
    vs = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 512)))
    sd = generator_state_dict_to_torch(vs, gen)
    ck = str(tmp_path / "g.pt")
    torch.save({"g_ema": sd}, ck)

    rc = eval_main(["ppl", "--ckpt", ck, "--n_sample", "4", "--batch", "2"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["distance"] == "multiscale-l2-proxy"
    assert out["pretrained"] is False and out["weights_fingerprint"] is None
    assert np.isfinite(out["ppl"])


def test_swd_discriminates_and_is_deterministic():
    """eval/swd.py: zero-ish for same distribution, large for different;
    deterministic given the seed (the ablation trajectory metric — FID's
    random-init backbone collapses in this environment, measured 1e-19
    feature magnitudes)."""
    from maua_tpu.eval.swd import swd

    rng = np.random.RandomState(0)
    yy, xx = np.meshgrid(np.linspace(-1, 1, 32), np.linspace(-1, 1, 32), indexing="ij")

    def smooth_set(n, jitter):
        out = []
        for _ in range(n):
            cx, cy = rng.uniform(-0.5, 0.5, 2)
            img = np.stack([
                np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / 0.2) * rng.uniform(-1, 1)
                for _ in range(3)
            ])
            out.append(img + jitter * rng.randn(3, 32, 32))
        return np.stack(out).astype(np.float32)

    a, b, c = smooth_set(32, 0.0), smooth_set(32, 0.0), smooth_set(32, 0.6)
    d_same = swd(a, b, n_dirs=128, n_repeats=2)
    d_diff = swd(a, c, n_dirs=128, n_repeats=2)
    assert d_diff["swd_avg"] > 1.6 * d_same["swd_avg"]  # small-set baseline is high
    assert set(d_same) == {"swd_32", "swd_16", "swd_avg"}
    again = swd(a, b, n_dirs=128, n_repeats=2)
    assert again["swd_avg"] == d_same["swd_avg"]


@pytest.mark.slow
def test_eval_cli_inception_with_mounted_weights_file(tmp_path, capsys):
    """The absolute-FID on-ramp (the one capability awaiting external weights):
    given ANY mountable torchvision-layout inception_v3 state dict file,
    `eval.cli inception --inception_weights FILE` must load it, extract
    features over real shards, and stamp pretrained=True + a weights
    fingerprint into the JSON so provenance is machine-checkable
    (reference: validation/inception.py:13-15 downloads these weights)."""
    import json as _json
    import os

    import torch
    from test_reference_parity import _randomize_torch_weights, _torch_inception_v3

    from maua_tpu.data.synthetic import write_synth_shards
    from maua_tpu.eval.cli import main as eval_main

    tnet = _torch_inception_v3().eval()
    _randomize_torch_weights(tnet)
    wpath = str(tmp_path / "inception_v3_google.pth")
    torch.save(tnet.state_dict(), wpath)

    data = tmp_path / "shards"
    write_synth_shards(str(data), size=32, n=6, fmt="raw", seed=0)

    out = str(tmp_path / "stats.pkl")
    rc = eval_main([
        "inception", "--path", str(data), "--size", "32", "--batch", "3",
        "--out", out, "--inception_weights", wpath,
    ])
    assert rc == 0
    j = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert j["pretrained"] is True
    assert isinstance(j["weights_fingerprint"], str) and len(j["weights_fingerprint"]) >= 8
    assert os.path.exists(out)
