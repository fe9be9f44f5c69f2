"""Space-to-depth (polyphase) evaluation of StyleGAN2 synthesis layers.

Why: on TPU, XLA lays convolution activations out channels-minor. The high-res
StyleGAN2 layers have few channels (64 @512², 32 @1024² full-width), so every
128-wide vector lane tile is 50-75% padding and every conv runs at a fraction
of MXU utilization — profiled at 4.4× off peak at 1024², with the stride-2
up-conv additionally materializing a 2.1 GiB lhs-dilated temp (25 ms of a
75 ms batch-16 synthesis call). Space-to-depth re-expresses those layers
EXACTLY (same math, reordered) on a half-resolution grid with 4× channels,
filling the lanes: measured 2.1× per conv at 512² and 4.4× at 1024² on a v5e.

The phase representation of x [B,C,H,W] is P [B,4C,H/2,W/2] with PHASE-MAJOR
channel index (py*2+px)*C + c: P[b, (py*2+px)*C + c, i, j] = x[b, c, 2i+py,
2j+px].

Design rule learned the hard way: every phase op must be ONE dense conv over
the full 4C-channel tensor. Any decomposition that slices per-phase (4
C-channel pieces) or stacks 6-D intermediates reintroduces the small-channel
lane padding (4× tile-padded temps, measured 8 GiB OOM / 16×-bandwidth blur)
that s2d exists to remove. The dense kernels carry structural zeros (2.25×
the minimal MACs) but run at full MXU utilization, which nets out far ahead.

Ops (per-axis derivations; 2-D kernels are the separable product):
* `phase_conv3x3` — stride-1 3×3 SAME conv as a dense SAME 3×3 conv in phase
  space: output phase py tap t reads input phase qy=(py+t-1)%2 at coarse
  offset floor((py+t-1)/2) ∈ {-1,0,1}; kernel block [p,q,a] = W[t] where
  t = 2a + qy - py - 1 (when in [0,3)).
* `phase_conv_up_blur` — the up path's conv_transpose2d(stride 2, 3×3)
  followed by the 4-tap Blur(pad=(1,1)) (reference models/stylegan2.py:
  227-238), folded into ONE dense 4×4 conv from the native half-res input to
  the phase output: composite taps Kc[v] = Σ_s k[s]·W[v+s-1] (v ∈ [-3,2]),
  output phase py position a holds Kc[2(1-a)+py]; input padded ((1,2),(1,2)).
  The per-sample demodulation commutes with the per-channel blur, so
  demod-after-composite is exact.
* `phase_upsample` — the skip pyramid's 2× FIR upsample (upfirdn up=2,
  pad (2,1), gain 4): dense [4C,C,3,3] conv, block (p,co),(ci) =
  δ(co,ci)·k1[2a-py]·k1[2b-px].
* `phase_conv1x1` — 1×1 conv as a block-diagonal dense [4O,4I,1,1] conv.
* `phase_conv_down_blur` — the discriminator's downsample ConvLayer
  (Blur(pad0,pad1) then stride-2 VALID conv, reference models/stylegan2.py:
  579-621) folded into ONE dense conv over the phase grid: composite fine taps
  Kc[v] = Σ_t W[t]·k[v+pad0-t]; output position a reads fine x[2a+v], whose
  phase is v mod 2 at coarse offset floor(v/2) — a stride-1 3-tap conv
  [O,4I,3,3] to a native output, or (phase_out) a stride-2 4-tap conv
  [4O,4I,4,4] to the phase rep of the downsampled result.
Only symmetric FIR kernels are supported (StyleGAN2's [1,3,3,1] is).

Every op is verified against the native implementation in tests/test_s2d.py.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray


def space_to_depth(x: Array) -> Array:
    """[B,C,H,W] -> [B,4C,H/2,W/2], PHASE-MAJOR: index (py*2+px)*C + c."""
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // 2, 2, w // 2, 2)
    return x.transpose(0, 3, 5, 1, 2, 4).reshape(b, 4 * c, h // 2, w // 2)


def depth_to_space(p: Array) -> Array:
    """Inverse of space_to_depth."""
    b, c4, hc, wc = p.shape
    c = c4 // 4
    p = p.reshape(b, 2, 2, c, hc, wc)
    return p.transpose(0, 3, 4, 1, 5, 2).reshape(b, c, hc * 2, wc * 2)


# ---------------------------------------------------------------------------
# mask constants (numpy, built once) — placement tensors mapping original
# kernel taps into phase-space kernel slots
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _m_body() -> np.ndarray:
    """M[py, qy, a, t] = 1 iff t == 2a + qy - py - 1 (t ∈ [0,3), a ∈ [0,3))."""
    m = np.zeros((2, 2, 3, 3), np.float32)
    for py in range(2):
        for qy in range(2):
            for a in range(3):
                t = 2 * a + qy - py - 1
                if 0 <= t < 3:
                    m[py, qy, a, t] = 1.0
    return m


@lru_cache(maxsize=None)
def _m_up(k1: tuple) -> np.ndarray:
    """MC[py, a, t] = Σ_s k1[s]·[t == 2(1-a) + py + s - 1] — composite
    transpose-conv + blur taps with the FIR folded in (a ∈ [0,4))."""
    k = np.asarray(k1, np.float32)
    m = np.zeros((2, 4, 3), np.float32)
    for py in range(2):
        for a in range(4):
            for s in range(len(k)):
                t = 2 * (1 - a) + py + s - 1
                if 0 <= t < 3:
                    m[py, a, t] += k[s]
    return m


@lru_cache(maxsize=None)
def _m_skip(k1: tuple) -> np.ndarray:
    """MS[py, a] = k1[2a - py] (0 if out of range) — 2× FIR upsample taps."""
    k = np.asarray(k1, np.float32)
    m = np.zeros((2, 3), np.float32)
    for py in range(2):
        for a in range(3):
            s = 2 * a - py
            if 0 <= s < len(k):
                m[py, a] = k[s]
    return m


@lru_cache(maxsize=None)
def _m_down(k1: tuple, ksize: int) -> np.ndarray:
    """Md[qy, a, ty] = Σ_s k1[s]·[floor((ty+s-pad0)/2) == a-1 and
    (ty+s-pad0) mod 2 == qy] — blur⊕stride-2-conv composite taps, phase input
    → native output (offsets span [-1,1] for ksize∈{1,3}, klen=4)."""
    k = np.asarray(k1, np.float32)
    pad0 = ((len(k) - 2) + (ksize - 1) + 1) // 2
    m = np.zeros((2, 3, ksize), np.float32)
    for ty in range(ksize):
        for s in range(len(k)):
            v = ty + s - pad0
            qy, dy = v % 2, v // 2  # python mod/floordiv: correct for v<0
            if -1 <= dy <= 1:
                m[qy, dy + 1, ty] += k[s]
    return m


@lru_cache(maxsize=None)
def _m_down_p2p(k1: tuple, ksize: int) -> np.ndarray:
    """Mp[py, qy, a, ty] = Σ_s k1[s]·[py + floor((ty+s-pad0)/2) == a-1 and
    (ty+s-pad0) mod 2 == qy] — same composite, output kept in phase form
    (coarse stride 2, offsets span [-1,2])."""
    k = np.asarray(k1, np.float32)
    pad0 = ((len(k) - 2) + (ksize - 1) + 1) // 2
    m = np.zeros((2, 2, 4, ksize), np.float32)
    for py in range(2):
        for ty in range(ksize):
            for s in range(len(k)):
                v = ty + s - pad0
                qy, o = v % 2, py + v // 2
                if -1 <= o <= 2:
                    m[py, qy, o + 1, ty] += k[s]
    return m


def fir_taps(kernel, gain: float) -> tuple:
    """Normalized per-axis FIR taps with the per-axis share of `gain` folded
    in (matches ops/upfirdn2d.setup_filter's separable 2-D filter)."""
    k = np.asarray(kernel, np.float64)
    k = k / k.sum() * math.sqrt(gain)
    return tuple(float(v) for v in k)


# ---------------------------------------------------------------------------
# ops
# ---------------------------------------------------------------------------


def phase_conv3x3_kernel(w: Array) -> Array:
    """[O,I,3,3] -> [4O,4I,3,3] dense SAME-conv kernel (phase-major)."""
    o, i = w.shape[0], w.shape[1]
    m = jnp.asarray(_m_body(), w.dtype)
    # HIGHEST: kernel construction must not round W through a bf16 einsum
    # (default TPU einsum precision) — it poisons fp32 parity modes (3e-2
    # max err, measured). The einsum is [O,I,3,3]-sized: cost is nil.
    k = jnp.einsum("oidf,pqad,PQbf->pPoqQiab", w, m, m, precision=lax.Precision.HIGHEST)
    return k.reshape(4 * o, 4 * i, 3, 3)


def phase_conv3x3(p: Array, w: Array, precision=None) -> Array:
    """Stride-1 3×3 SAME conv in phase space: p [B,4I,h,w], w [O,I,3,3]."""
    k = phase_conv3x3_kernel(w).astype(p.dtype)
    return lax.conv_general_dilated(
        p, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=precision,
    )


def phase_conv_up_blur_kernel(w: Array, k1: tuple) -> Array:
    """[O,I,3,3] -> [4O,I,4,4] composite transpose-conv⊕blur kernel."""
    o, i = w.shape[0], w.shape[1]
    mc = jnp.asarray(_m_up(k1), w.dtype)
    k = jnp.einsum("oidf,pad,Pbf->pPoiab", w, mc, mc, precision=lax.Precision.HIGHEST)
    return k.reshape(4 * o, i, 4, 4)


def phase_conv_up_blur(x: Array, w: Array, k1: tuple, precision=None) -> Array:
    """conv_transpose2d(stride 2, W [O,I,3,3]) + Blur(k, pad (1,1), gain in
    k1): native input [B,I,h,w] -> phase output [B,4O,h,w] (resolution 2h)."""
    k = phase_conv_up_blur_kernel(w, k1).astype(x.dtype)
    return lax.conv_general_dilated(
        x, k, (1, 1), ((1, 2), (1, 2)), dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=precision,
    )


def phase_upsample(x: Array, kernel, gain: float = 4.0) -> Array:
    """2× FIR upsample (Upsample module: upfirdn up=2, pad (2,1)) from native
    [B,C,h,w] to the phase rep [B,4C,h,w] of the 2h output. One dense
    [4C,C,3,3] conv (C is small — RGB skip pyramid)."""
    c = x.shape[1]
    ms = np.asarray(_m_skip(fir_taps(kernel, gain)))
    ker = np.zeros((2, 2, c, c, 3, 3), np.float32)
    for py in range(2):
        for px in range(2):
            for ch in range(c):
                ker[py, px, ch, ch] = np.outer(ms[py], ms[px])
    ker = jnp.asarray(ker.reshape(4 * c, c, 3, 3), x.dtype)
    # FIR precision policy mirrors ops/upfirdn2d._fir_precision: the skip
    # pyramid adds straight into the image, so a default-precision (bf16)
    # conv here costs 4.8e-2 max err in fp32-HIGHEST parity mode (measured)
    if x.dtype == jnp.bfloat16:
        prec = None
    else:
        prec = (
            lax.Precision.HIGHEST
            if jax.config.jax_default_matmul_precision is None
            else None
        )
    return lax.conv_general_dilated(
        x, ker, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=prec,
    )


def phase_conv_down_blur_kernel(w: Array, k1: tuple, phase_out: bool) -> Array:
    """[O,I,kt,kt] -> dense composite blur⊕stride-2 kernel: [O,4I,3,3]
    (native output) or [4O,4I,4,4] (phase output)."""
    o, i, kt = w.shape[0], w.shape[1], w.shape[2]
    if phase_out:
        mp = jnp.asarray(_m_down_p2p(k1, kt), w.dtype)
        k = jnp.einsum(
            "oidf,pqad,PQbf->pPoqQiab", w, mp, mp, precision=lax.Precision.HIGHEST
        )
        return k.reshape(4 * o, 4 * i, 4, 4)
    md = jnp.asarray(_m_down(k1, kt), w.dtype)
    k = jnp.einsum("oidf,qad,Qbf->oqQiab", w, md, md, precision=lax.Precision.HIGHEST)
    return k.reshape(o, 4 * i, 3, 3)


def phase_conv_down_blur(
    p: Array, w: Array, k1: tuple, phase_out: bool = False, precision=None
) -> Array:
    """Blur(pad) + stride-2 VALID conv (discriminator ConvLayer downsample)
    from the phase rep p [B,4I,h,w] of a 2h-resolution input. Returns the
    h-resolution result natively [B,O,h,w] or (phase_out) as the phase rep
    [B,4O,h/2,w/2]."""
    k = phase_conv_down_blur_kernel(w, k1, phase_out).astype(p.dtype)
    if phase_out:
        return lax.conv_general_dilated(
            p, k, (2, 2), ((1, 2), (1, 2)), dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=precision,
        )
    return lax.conv_general_dilated(
        p, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=precision,
    )


def phase_conv1x1(p: Array, w1: Array, precision=None) -> Array:
    """1×1 conv in phase space as a block-diagonal dense conv:
    p [B,4I,h,w], w1 [O,I] -> [B,4O,h,w]."""
    o, i = w1.shape
    eye = jnp.asarray(np.eye(4, dtype=np.float32), w1.dtype)
    k = jnp.einsum(
        "pq,oi->poqi", eye, w1, precision=lax.Precision.HIGHEST
    ).reshape(4 * o, 4 * i)[:, :, None, None]
    return lax.conv_general_dilated(
        p, k.astype(p.dtype), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=precision,
    )


