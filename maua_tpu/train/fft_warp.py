"""Dense (gather-free) affine image warp for ADA, via FFT shears + band-matrix
scales.

Why this exists: the per-pixel bilinear gather behind `apply_affine` is the
measured top cost of the whole GAN train step on TPU — 108 ms forward at 256²
batch 8 (0.2 TFLOP/s) with a backward scatter several times that, ~78% of the
1046 ms steady-state step (see PARITY.md phase profile). TPU gathers issue a
few windows per cycle no matter how the windows are packed (micro-benched:
folded 4-strided gather 129.9 ms, contiguous pair-gather 237× worse, while the
surrounding resample matmuls cost 2.5 ms). The fix is not a better gather but
no gather: an affine warp factors into two 1-D resampling passes (Catmull &
Smith 1980; Larkin et al. 1997 for the FFT-shear form), and each pass splits
into
  * a shear — a per-row translation whose shift is linear in the row index —
    done exactly as a phase ramp on the row's rFFT (periodic-sinc
    interpolation, zero resampling loss), and
  * a per-sample uniform 1-D scale — a banded [out, in] interpolation matrix
    shared by all rows, i.e. one batched matmul on the MXU.
All ops are dense (FFT, elementwise complex multiply, matmul), so XLA's
autodiff backward is dense too — the pathological scatter-add adjoint of the
gather disappears entirely.

Semantics vs the gather path (`apply_affine(method="matmul")`): same
reflect-padded source, same zeros-outside-the-pad validity (enforced by
post-shear wrap masks and the band matrices' natural edge ramp), same 1×
output grid as the documented fast mode — but interpolation is periodic-sinc
along the shear axis and `tri` (bilinear-equivalent, minification-widened)
along the scale axis instead of plain bilinear on a 2×-oversampled source, so
values differ at interpolation level (pinned by tests on smooth inputs;
integer translations are exact). This replaces the reference's
oversample→grid_sample→decimate geometry (reference: augment.py:292-341) with
a spectrally exact decomposition rather than approximating it.

Decomposition, in padded-source pixel coordinates p = A·q' + t (q' = output
pixel, A = Ginv[:2,:2] for square images):
  pass 1 (rows v of the source):   T[v, x'] = src[v, σ1·x' + β1·v + δ1],
      σ1 = det(A)/d, β1 = b/d, δ1 = tx − (b/d)·ty
  pass 2 (columns x' of T):        out[y', x'] = T[σ2·y' + β2·x' + δ2, x'],
      σ2 = d, β2 = c, δ2 = ty
A per-sample transpose of the source (with A's rows swapped) is selected when
|b| > |d|, which bounds the pass-1 shear slope |β1| ≤ 1 and keeps |σ2| away
from 0 for all compositions ADA samples (flips, ±90° turns, full-range
rotations, log-normal scales). The shift constants are re-centered between the
shear and the scale so the band matrices always index the valid window.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def next_smooth(n: int) -> int:
    """Smallest {2,3,5}-smooth integer ≥ n (fast FFT lengths)."""
    m = n
    while True:
        k = m
        for f in (2, 3, 5):
            while k % f == 0:
                k //= f
        if k == 1:
            return m
        m += 1


@lru_cache(maxsize=8)
def _dft_mats(n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Real rDFT/irDFT as dense matrices (numpy fp32, cached per length):
    Re = x @ cos_f, Im = −(x @ sin_f) with cos_f/sin_f [n, K] (K = n//2+1);
    inverse x = (Re·w) @ cos_fᵀ − (Im·w) @ sin_fᵀ with the hermitian weights
    w = (1, 2, …, 2[, 1 if n even])/n. Used by the "dftmm" shear impl below."""
    k = np.arange(n // 2 + 1, dtype=np.float64)
    j = np.arange(n, dtype=np.float64)
    ang = (2.0 * np.pi / n) * np.outer(j, k)
    w = np.full(n // 2 + 1, 2.0 / n)
    w[0] = 1.0 / n
    if n % 2 == 0:
        w[-1] = 1.0 / n
    return (
        np.cos(ang).astype(np.float32),
        np.sin(ang).astype(np.float32),
        w.astype(np.float32),
    )


def _shift_rows_dftmm(
    x: Array,
    shift: Array,
    taper_from: float | None,
    taper_conditional: bool,
) -> Array:
    """`_fft_shift_rows` semantics with the rFFT/irFFT realized as shared DFT
    MATMULS on the MXU instead of jnp.fft — the TPU fast path. Measured on the
    v5e @1024² (hp=1600, [4,3,1600,1600]): one jnp.fft rfft+irfft roundtrip is
    14.7 ms (VPU-bound) while the same roundtrip as two [rows,n]×[n,K] matmuls
    is ~1.5 ms — the FFT was 2×17 ms of the 27 ms warp forward. The matrices
    are trace-time constants (5 MB each @1600); inputs keep their dtype on the
    MXU (bf16 training: bf16×bf16→fp32-accumulate; fp32 inputs get HIGHEST),
    and the per-row phase arithmetic runs fp32 either way. bf16 coefficient
    rounding adds ~4e-3 relative noise — validated against the fft impl in
    tests/test_train.py; the fp32/parity path keeps the exact jnp.fft impl."""
    n = x.shape[-1]
    cos_f, sin_f, w = _dft_mats(n)
    bf16 = x.dtype == jnp.bfloat16
    mdt = jnp.bfloat16 if bf16 else jnp.float32
    prec = None if bf16 else jax.lax.Precision.HIGHEST
    cos_m = jnp.asarray(cos_f, mdt)
    sin_m = jnp.asarray(sin_f, mdt)

    dot = lambda a, b: jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    )
    xm = x.astype(mdt)
    re = dot(xm, cos_m)  # [..., K] fp32
    im = -dot(xm, sin_m)

    k = jnp.arange(n // 2 + 1, dtype=jnp.float32)
    s = jnp.mod(shift.astype(jnp.float32), float(n))[..., None]
    ang = (2.0 * jnp.pi / n) * k * s
    c, sn = jnp.cos(ang), jnp.sin(ang)
    re, im = re * c - im * sn, re * sn + im * c
    if n % 2 == 0:
        im = im.at[..., -1].set(0.0)  # Nyquist of a real signal stays real
    if taper_from is not None:
        fr = k / (n / 2.0)
        t = jnp.where(
            fr <= taper_from,
            1.0,
            0.5 * (1.0 + jnp.cos(jnp.pi * (fr - taper_from) / max(1.0 - taper_from, 1e-6))),
        )
        if taper_conditional:
            frac = s - jnp.round(s)
            has_frac = jnp.abs(frac) > 1e-4
            t = jnp.where(has_frac, t, 1.0)
        re, im = re * t, im * t

    wk = jnp.asarray(w, jnp.float32)
    out = dot((re * wk).astype(mdt), cos_m.T) - dot((im * wk).astype(mdt), sin_m.T)
    return out.astype(x.dtype) if bf16 else out


def _fft_shift_rows(
    x: Array,
    shift: Array,
    taper_from: float | None,
    taper_conditional: bool = True,
    impl: str = "fft",
) -> Array:
    """Shift each row of x [..., N] LEFT by `shift` rows-worth of samples —
    out[..., i] = x_interp[..., i + shift] — via an rFFT phase ramp
    (periodic-sinc interpolation). `shift` broadcasts against x's leading dims.
    Wrapped-around content is NOT masked here (callers mask by source
    validity). Optional raised-cosine taper from `taper_from`·Nyquist
    suppresses the periodic-sinc interpolant's ringing at the top of the band
    (the role the SYM6 presmooth plays in the reference pipeline). By default
    the taper is applied PER ROW, only to rows whose shift is genuinely
    fractional: integer shifts are pure sample relabelings with zero
    interpolation error, so tapering them would low-pass images that need no
    antialiasing at all — in particular every image during the ADA warm-up,
    where the sampled transforms are identity (round-3 VERDICT weak #2).
    taper_conditional=False restores the round-3 always-on behavior (kept for
    the training-quality ablation).

    impl="dftmm" computes the identical transform with shared DFT matmuls on
    the MXU (see _shift_rows_dftmm) — the TPU bf16 fast path."""
    if impl == "dftmm":
        return _shift_rows_dftmm(x, shift, taper_from, taper_conditional)
    n = x.shape[-1]
    # FFT on a flattened [rows, n] view: XLA:CPU's fft thunk RET_CHECKs on
    # non-dim0-major layouts, which GSPMD batch sharding induces on the 4-D
    # form (fft_thunk.cc:167, hit by the mesh test); the 2-D reshape keeps the
    # sharded batch dim leading and the layout monotonic on every backend
    f = jnp.fft.rfft(x.astype(jnp.float32).reshape(-1, n), axis=-1)
    f = f.reshape(*x.shape[:-1], n // 2 + 1)
    k = jnp.arange(n // 2 + 1, dtype=jnp.float32)
    # e^{2πik·s/N}; fold s mod N first to keep the f32 phase argument small
    s = jnp.mod(shift.astype(jnp.float32), float(n))[..., None]
    ang = (2.0 * jnp.pi / n) * k * s
    phase = jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
    f = f * phase
    if n % 2 == 0:
        # the Nyquist bin of a real signal must stay real under a fractional
        # shift: keeping only the real part projects f_nyq·e^{iπs} → f_nyq·cos(πs)
        f = f.at[..., -1].set(jax.lax.complex(f[..., -1].real, jnp.zeros_like(f[..., -1].real)))
    if taper_from is not None:
        fr = k / (n / 2.0)
        t = jnp.where(
            fr <= taper_from,
            1.0,
            0.5 * (1.0 + jnp.cos(jnp.pi * (fr - taper_from) / max(1.0 - taper_from, 1e-6))),
        )
        if taper_conditional:
            frac = s - jnp.round(s)  # [..., 1], broadcasts over the k axis
            has_frac = jnp.abs(frac) > 1e-4
            t = jnp.where(has_frac, t, 1.0)
        f = f * t
    out = jnp.fft.irfft(f.reshape(-1, f.shape[-1]), n=n, axis=-1)
    return out.reshape(*f.shape[:-1], n)


def _scale_band(n_out: int, n_in: int, sigma: Array, gamma: Array) -> Array:
    """Per-sample banded resample matrix K [B, n_out, n_in]:
    K[b, o, i] = tri((i − (σ_b·o + γ_b)) / w_b) / w_b with w_b = max(|σ_b|, 1)
    (kernel widened for minification → proper antialiasing in the scale
    direction). Rows are renormalized in the interior and ramp naturally at
    the edges (min(rowsum,1)/rowsum), matching zeros-outside semantics."""
    o = jnp.arange(n_out, dtype=jnp.float32)
    i = jnp.arange(n_in, dtype=jnp.float32)
    pos = sigma[:, None] * o[None, :] + gamma[:, None]  # [B, n_out]
    w = jnp.maximum(jnp.abs(sigma), 1.0)[:, None, None]  # [B,1,1]
    z = (i[None, None, :] - pos[:, :, None]) / w
    k = jnp.maximum(0.0, 1.0 - jnp.abs(z)) / w
    rn = jnp.sum(k, axis=-1, keepdims=True)
    return k * (jnp.minimum(rn, 1.0) / jnp.maximum(rn, 1e-6))


def _wrap_mask(n: int, shift: Array) -> Array:
    """Validity ramp for a row shifted LEFT by `shift`: sample i reads source
    position m = i + shift; valid on m ∈ [0, n−1] with a 1-px ramp to zero at
    m = −1 and m = n (the bilinear gather's partial-window behavior).
    Returns shift.shape × [n]."""
    i = jnp.arange(n, dtype=jnp.float32)
    m = i[None, :] + shift.astype(jnp.float32)[..., None]
    return jnp.clip(m + 1.0, 0.0, 1.0) * jnp.clip(float(n) - m, 0.0, 1.0)


def affine_warp_fft(
    img: Array,
    G: Array,
    pad_frac: float = 0.25,
    taper_from: float | None = 0.85,
    taper_conditional: bool = True,
    shear_impl: str = "auto",
) -> Array:
    """Warp [B, C, H, W] (square H == W) through per-sample normalized-coords
    affine G [B, 3, 3] — same contract as apply_affine(..., method="matmul",
    oversample_grid=False) — with zero gathers. See module docstring.

    The transform parameters (shears, scales, masks, band matrices) are
    stop-gradiented: ADA's matrices are sampled constants, and only the image
    gradient is needed (G pass backprops through augmented fakes,
    reference: train.py:231-236).

    shear_impl: "fft" = jnp.fft phase ramps (exact, the fp32/parity impl);
    "dftmm" = the same transform as shared DFT matmuls on the MXU (the TPU
    bf16 fast path — jnp.fft is VPU-bound, ~10× slower at 1024², see
    _shift_rows_dftmm); "auto" = dftmm for bf16 inputs on an accelerator
    backend, fft otherwise (CPU matmul-DFT would be slower than FFTW, and
    fp32 callers are the parity/exactness modes)."""
    b, c, h, w = img.shape
    if h != w:
        raise ValueError(f"affine_warp_fft needs square images, got {h}x{w}")

    # TPU matmul precision: the band einsums below would silently run bf16 on
    # the MXU (measured 1e-2 identity error at fp32 inputs on the chip);
    # fp32 inputs get fp32 matmuls (parity semantics), bf16 training keeps
    # the fast default — its images are bf16-rounded anyway
    prec = jax.lax.Precision.HIGHEST if img.dtype == jnp.float32 else None
    if shear_impl == "auto":
        # resolve from the device the computation will actually run on: a
        # jax.default_device(cpu) context (the documented eager/CPU pattern
        # under the pinned axon platform) must pick the FFT path even when
        # the process-default backend is an accelerator
        dev = getattr(jax.config, "jax_default_device", None)
        platform = dev.platform if dev is not None else jax.default_backend()
        shear_impl = (
            "dftmm" if img.dtype == jnp.bfloat16 and platform != "cpu" else "fft"
        )

    pad_min = math.ceil(h * pad_frac) + 1
    hp = next_smooth(h + 2 * pad_min)
    pad = (hp - h) // 2
    pad2 = hp - h - pad
    imgp = jnp.pad(img, ((0, 0), (0, 0), (pad, pad2), (pad, pad2)), mode="reflect")

    # pixel-space affine: source_padded = A·(x', y') + t  (square: the
    # normalized↔pixel scale factors cancel, A = Ginv[:2,:2] exactly)
    Ginv = jax.lax.stop_gradient(jnp.linalg.inv(G.astype(jnp.float32)))
    A = Ginv[:, :2, :2]
    half = 0.5 * (1.0 - float(h))  # (x'+0.5) grid → −w/2 centering, per axis
    tx = (A[:, 0, 0] + A[:, 0, 1]) * half + (Ginv[:, 0, 2] + 1.0) * (h / 2.0) + pad - 0.5
    ty = (A[:, 1, 0] + A[:, 1, 1]) * half + (Ginv[:, 1, 2] + 1.0) * (h / 2.0) + pad - 0.5

    # per-sample transpose-select: work in the frame where |b| ≤ |d| so the
    # pass-1 shear slope |b/d| ≤ 1 (handles ±90° turns and flips exactly)
    sel = jnp.abs(A[:, 0, 1]) > jnp.abs(A[:, 1, 1])  # [B]
    a_ = jnp.where(sel, A[:, 1, 0], A[:, 0, 0])
    b_ = jnp.where(sel, A[:, 1, 1], A[:, 0, 1])
    c_ = jnp.where(sel, A[:, 0, 0], A[:, 1, 0])
    d_ = jnp.where(sel, A[:, 0, 1], A[:, 1, 1])
    tx_ = jnp.where(sel, ty, tx)
    ty_ = jnp.where(sel, tx, ty)
    src = jnp.where(sel[:, None, None, None], jnp.swapaxes(imgp, -1, -2), imgp)

    # guard d away from 0 (unreachable for ADA's orthogonal×scale samples once
    # the transpose-select has run, but keeps the math finite for any G)
    d_safe = jnp.where(jnp.abs(d_) < 1e-3, jnp.where(d_ < 0, -1e-3, 1e-3), d_)
    det = a_ * d_ - b_ * c_

    # ---- pass 1: horizontal. T[v, x'] = src[v, σ1·x' + β1·v + δ1] ----
    sigma1 = det / d_safe
    beta1 = b_ / d_safe
    delta1 = tx_ - beta1 * ty_
    # center the scale positions inside [0, hp): positions σ1·x' + γ1,
    # shear shift carries the rest (s̃1(v) = β1·v + δ1 − γ1)
    # integer-rounded centering: the band matrix then has exact taps for
    # σ = ±1 (identity, flips, 90° turns, integer translates) and the
    # fractional residue rides the FFT shear, which is exact for any shift
    gamma1 = jnp.round((hp - sigma1 * (w - 1)) / 2.0)
    v_idx = jnp.arange(hp, dtype=jnp.float32)
    s1 = beta1[:, None] * v_idx[None, :] + (delta1 - gamma1)[:, None]  # [B, hp]
    s1 = jax.lax.stop_gradient(s1)
    sheared = _fft_shift_rows(src, s1[:, None, :], taper_from, taper_conditional, shear_impl)  # [B,C,hp,hp]
    sheared = sheared * jax.lax.stop_gradient(_wrap_mask(hp, s1))[:, None, :, :].astype(sheared.dtype)
    K1 = jax.lax.stop_gradient(_scale_band(w, hp, sigma1, gamma1)).astype(sheared.dtype)  # [B,W,hp]
    T = jnp.einsum("bchx,box->bcho", sheared, K1, precision=prec)  # [B,C,hp,W]

    # ---- pass 2: vertical. out[y', x'] = T[σ2·y' + β2·x' + δ2, x'] ----
    sigma2 = d_
    beta2 = c_
    delta2 = ty_
    gamma2 = jnp.round((hp - sigma2 * (h - 1)) / 2.0)
    x_idx = jnp.arange(w, dtype=jnp.float32)
    s2 = beta2[:, None] * x_idx[None, :] + (delta2 - gamma2)[:, None]  # [B, W]
    s2 = jax.lax.stop_gradient(s2)
    Tt = jnp.swapaxes(T, -1, -2)  # [B,C,W,hp] — v minor for the row FFT
    sheared2 = _fft_shift_rows(Tt, s2[:, None, :], taper_from, taper_conditional, shear_impl)
    sheared2 = sheared2 * jax.lax.stop_gradient(_wrap_mask(hp, s2))[:, None, :, :].astype(sheared2.dtype)
    K2 = jax.lax.stop_gradient(_scale_band(h, hp, sigma2, gamma2)).astype(sheared2.dtype)  # [B,H,hp]
    out_t = jnp.einsum("bcxv,byv->bcxy", sheared2, K2, precision=prec)  # [B,C,W,H]
    out = jnp.swapaxes(out_t, -1, -2).astype(img.dtype)

    # per-sample identity bypass: ADA applies each elementary transform with
    # probability p, so during warm-up (p≈0) nearly every sampled G IS the
    # identity — those images pass through bit-exact in every dtype/precision
    # mode instead of accumulating FFT+matmul rounding
    is_ident = jax.lax.stop_gradient(
        jnp.all(jnp.abs(G - jnp.eye(3, dtype=G.dtype)) < 1e-6, axis=(1, 2))
    )
    return jnp.where(is_ident[:, None, None, None], img, out)
