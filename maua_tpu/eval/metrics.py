"""FID / PRDC / PPL metric math (reference: validation/metrics.py:84-274).

Feature extraction runs batched+jitted on device; the O(N²)/eigen pieces
(sqrtm, kNN radii) run on host numpy/scipy exactly like the reference.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

Array = jnp.ndarray


def weights_fingerprint(tree: Any) -> str:
    """Short stable hash of a parameter pytree (or flat state dict), so metric
    output JSON records WHICH backbone weights produced the number — random-
    init vs pretrained FID backbones are indistinguishable from the value
    alone (reference risk: validation/inception.py:13-15 always downloads the
    canonical weights; here weights are optional)."""
    import hashlib

    h = hashlib.sha256()
    leaves_with_paths = sorted(
        (jax.tree_util.keystr(kp), leaf)
        for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    )
    for path, leaf in leaves_with_paths:
        arr = np.asarray(leaf)
        h.update(path.encode())
        h.update(str(arr.shape).encode())
        h.update(arr.tobytes())
    return h.hexdigest()[:16]


def compute_stats(features: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(mean, covariance) of a feature matrix [N, D]
    (reference: metrics.py:112-114)."""
    features = np.asarray(features, np.float64)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Fréchet distance between two gaussians via scipy sqrtm with the
    standard non-finite fallback (reference: metrics.py:120-141)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean, _ = scipy.linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def fid_from_features(fake_features: np.ndarray, real_mu, real_sigma) -> float:
    mu, sigma = compute_stats(fake_features)
    return frechet_distance(mu, sigma, real_mu, real_sigma)


def prdc(real_features: np.ndarray, fake_features: np.ndarray, nearest_k: int = 5) -> dict[str, float]:
    """Precision / recall / density / coverage via k-NN radii
    (reference: metrics.py:179-214, the prdc package math)."""
    real = np.asarray(real_features, np.float64)
    fake = np.asarray(fake_features, np.float64)

    def pairwise(a, b):
        return np.sqrt(np.maximum(
            (a**2).sum(1)[:, None] + (b**2).sum(1)[None, :] - 2 * a @ b.T, 0.0
        ))

    def kth_radii(x, k):
        d = pairwise(x, x)
        return np.sort(d, axis=1)[:, k]  # k-th nn (excl. self at col 0)

    real_radii = kth_radii(real, nearest_k)
    fake_radii = kth_radii(fake, nearest_k)
    d_rf = pairwise(real, fake)

    precision = (d_rf < real_radii[:, None]).any(axis=0).mean()
    recall = (d_rf < fake_radii[None, :]).any(axis=1).mean()
    density = (1.0 / float(nearest_k)) * (d_rf < real_radii[:, None]).sum(axis=0).mean()
    coverage = (d_rf.min(axis=1) < real_radii).mean()
    return {
        "precision": float(precision),
        "recall": float(recall),
        "density": float(density),
        "coverage": float(coverage),
    }


def fid(
    synthesize: Callable[..., Array],
    feature_fn: Callable[[Array], Array],
    real_stats: tuple[np.ndarray, np.ndarray],
    n_sample: int = 2500,
    batch_size: int = 6,
    rng: Optional[jax.Array] = None,
    real_features: Optional[np.ndarray] = None,
    compute_prdc: bool = False,
    truncation: Optional[float] = None,
) -> dict[str, float]:
    """Sample the generator and compute FID vs cached real stats
    (reference: metrics.py:84-152).

    synthesize(rng, batch[, truncation]) -> images [-1,1] NCHW;
    feature_fn(images) -> [N,D]. Following the reference's sampling protocol
    (metrics.py:100-103), each batch synthesizes with truncation drawn
    U(0.9, 1.5) when `truncation` is None; samplers that ignore the third
    argument (legacy) still work.
    """
    import inspect

    if rng is None:
        rng = jax.random.PRNGKey(0)
    try:
        takes_trunc = len(inspect.signature(synthesize).parameters) >= 3
    except (TypeError, ValueError):
        takes_trunc = False
    trunc_rng = np.random.default_rng(0)
    feats = []
    jit_feat = jax.jit(lambda img: feature_fn(img))
    n_batches = -(-n_sample // batch_size)
    for i in range(n_batches):
        rng, key = jax.random.split(rng)
        if takes_trunc:
            trunc = truncation if truncation is not None else float(trunc_rng.uniform(0.9, 1.5))
            imgs = synthesize(key, batch_size, trunc)
        else:
            imgs = synthesize(key, batch_size)
        feats.append(np.asarray(jit_feat(imgs)))
    fake_features = np.concatenate(feats)[:n_sample]

    out = {"fid": fid_from_features(fake_features, *real_stats)}
    if compute_prdc and real_features is not None:
        out.update(prdc(real_features[: len(fake_features)], fake_features))
    return out


def cached_dataset_stats(
    feature_fn: Callable[[Array], Array],
    data_iter,
    cache_path: str,
    max_items: Optional[int] = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Dataset inception stats with pickle caching
    (reference: metrics.py:155-176 inception_{name}_stats.pkl)."""
    if os.path.exists(cache_path):
        with open(cache_path, "rb") as f:
            return pickle.load(f)
    jit_feat = jax.jit(lambda img: feature_fn(img))
    feats = []
    n = 0
    for batch in data_iter:
        feats.append(np.asarray(jit_feat(jnp.asarray(batch))))
        n += len(batch)
        if max_items is not None and n >= max_items:
            break
    stats = compute_stats(np.concatenate(feats))
    with open(cache_path, "wb") as f:
        pickle.dump(stats, f)
    return stats


def ppl(
    synthesize_from_w: Callable[[Array], Array],
    map_latents: Callable[[jax.Array, int], Array],
    distance_fn: Callable[[Array, Array], Array],
    n_sample: int = 1250,
    batch_size: int = 8,
    eps: float = 1e-4,
    crop: bool = False,
    rng: Optional[jax.Array] = None,
) -> float:
    """Perceptual path length in W (reference: metrics.py:221-274): paired
    lerp with offset ε, perceptual distance / ε², with the reference's full
    protocol: images larger than 256 are bilinearly downsampled to 256 before
    the perceptual distance (metrics.py:257-261 — without this, PPL at
    512/1024 is a different metric), and the 1–99 percentile filter uses
    lower/higher interpolation (metrics.py:267-268).

    synthesize_from_w(w [N, D]) -> images; map_latents(rng, n) -> W [N, D];
    distance_fn(img0, img1) -> [N] perceptual distances.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def batch_distances(key):
        k1, k2 = jax.random.split(key)
        w = map_latents(k1, batch_size * 2)
        w0, w1 = w[::2], w[1::2]
        t = jax.random.uniform(k2, (batch_size, 1))
        wt0 = w0 + (w1 - w0) * t
        wt1 = w0 + (w1 - w0) * (t + eps)
        img = synthesize_from_w(jnp.concatenate([wt0, wt1]))
        if crop:
            c = img.shape[2] // 8
            img = img[:, :, c * 3 : c * 7, c * 2 : c * 6]
        # reference protocol: >256 → bilinear 256 (align_corners=False; jax
        # image resize uses the same half-pixel-center convention)
        if img.shape[2] // 256 > 1:
            img = jax.image.resize(
                img, (img.shape[0], img.shape[1], 256, 256), method="bilinear"
            )
        img0, img1 = img[:batch_size], img[batch_size:]
        return distance_fn(img0, img1) / (eps**2)

    jit_batch = jax.jit(batch_distances)
    dists = []
    for _ in range(-(-n_sample // batch_size)):
        rng, key = jax.random.split(rng)
        dists.append(np.asarray(jit_batch(key)))
    d = np.concatenate(dists)[:n_sample]

    lo = np.percentile(d, 1, method="lower")
    hi = np.percentile(d, 99, method="higher")
    return float(d[(d >= lo) & (d <= hi)].mean())


def vae_fid(
    reconstruct: Callable[[Array], Array],
    feature_fn: Callable[[Array], Array],
    data_iter,
    n_sample: int = 2500,
) -> float:
    """FID between a dataset and its VAE reconstructions (reference:
    metrics.py:17-80 vae_fid): features of real batches vs features of
    model(real) reconstructions."""
    jit_feat = jax.jit(lambda img: feature_fn(img))
    jit_rec = jax.jit(lambda img: reconstruct(img))
    real_feats, fake_feats = [], []
    n = 0
    for batch in data_iter:
        batch = jnp.asarray(batch)
        real_feats.append(np.asarray(jit_feat(batch)))
        fake_feats.append(np.asarray(jit_feat(jit_rec(batch))))
        n += len(batch)
        if n >= n_sample:
            break
    mu_r, s_r = compute_stats(np.concatenate(real_feats))
    return fid_from_features(np.concatenate(fake_feats), mu_r, s_r)
