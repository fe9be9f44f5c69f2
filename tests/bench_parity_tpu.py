"""Chip parity artifact: full-width generator vs the ACTUAL torch reference.

Runs the reference PyTorch StyleGAN2 (CPU, CUDA ext stubbed — its CPU branches
never touch it; reference models/stylegan2.py:368-576) and our JAX generator
on the attached TPU with identical weights + stored noise, in both fp32
operating points:

  * parity mode        (default, Precision.HIGHEST 6-pass)
  * fast-parity mode   (jax.default_matmul_precision("high"), 3-pass on the
                        high-res demodulated body convs only)

Usage:  python tests/bench_parity_tpu.py [size=256] [batch=2]
Writes a row you can paste into PARITY.md. 1024² full-width takes ~10 min
(torch CPU forward ~1 min/frame on the 1-core box + TPU compile).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

REFERENCE = "/root/reference"
size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2

# ---- reference torch forward (CPU) ----
import torch

torch.manual_seed(0)
import torch.utils.cpp_extension as ce

ce.load = lambda *a, **k: None
sys.path.insert(0, REFERENCE)
import models.stylegan2 as ref_sg2

g_ref = ref_sg2.Generator(size, 512, 8).eval()
sd = {k: v.detach() for k, v in g_ref.state_dict().items()}
z = np.random.RandomState(1).randn(batch, 512).astype(np.float32)

# the reference hardcodes th.cuda.FloatTensor for float truncation — pass a
# tensor of ones + a pinned mean latent (identity lerp on both sides), as
# tests/test_reference_parity.py:61-78 does
mean_w = np.random.RandomState(2).randn(512).astype(np.float32)
ones = np.ones(batch, np.float32)
g_ref.truncation_latent = torch.from_numpy(mean_w)

t0 = time.time()
with torch.no_grad():
    img_ref, _ = g_ref(
        [torch.from_numpy(z)], truncation=torch.from_numpy(ones), randomize_noise=False
    )
img_ref = img_ref.numpy()
print(f"torch reference forward: {time.time() - t0:.1f}s  out {img_ref.shape}", flush=True)
del g_ref

# ---- our generator on the TPU ----
import jax

from maua_tpu.compile_cache import setup_compile_cache
setup_compile_cache()
import jax.numpy as jnp

from maua_tpu.io import generator_variables_from_torch, infer_generator_config
from maua_tpu.models import Generator, auto_s2d_min_res

config = infer_generator_config(sd)
assert config["size"] == size, config
# the production operating point: polyphase (s2d) evaluation of the
# low-channel high-res layers (exact; ops/s2d.py)
gen = Generator(
    **config,
    s2d_min_res=auto_s2d_min_res(size, config["channel_multiplier"], config["channel_max"]),
)
variables = generator_variables_from_torch(sd)
zj = jnp.asarray(z)


def synth():
    @jax.jit
    def f(z):
        img, _ = gen.apply(
            variables,
            z,
            truncation=jnp.ones(batch),
            truncation_latent=jnp.asarray(mean_w),
            randomize_noise=False,
        )
        return img

    return np.asarray(f(zj))


rows = []
for tag, ctx in (
    ("fp32 HIGHEST", None),
    ('fp32 matmul-precision "high"', jax.default_matmul_precision("high")),
):
    t0 = time.time()
    if ctx is None:
        out = synth()
    else:
        with ctx:
            out = synth()
    err = np.abs(out - img_ref)
    mse = float(np.mean((out - img_ref) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-30))
    rows.append((tag, err.max(), err.mean(), psnr))
    print(
        f"{tag} @{size}² full-width: max|err|={err.max():.3e} mean={err.mean():.3e} "
        f"PSNR={psnr:.1f} dB  ({time.time() - t0:.0f}s)",
        flush=True,
    )

print("\nPARITY.md row(s):")
for tag, mx, mn, psnr in rows:
    print(f"| {size}² full-width (vs torch reference, batch {batch}) | {tag} | {mx:.2e} | {mn:.2e} | {psnr:.1f} dB |")
