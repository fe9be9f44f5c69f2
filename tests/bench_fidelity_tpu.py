"""Dev utility: bf16-vs-fp32 synthesis fidelity on the attached chip.

Same weights, same latents, both compute dtypes → PSNR / max abs error in
[-1,1] image space. Documents what the bf16 fast path costs in fidelity.
"""

import os
import sys

sys.path.insert(0, "/root/repo")
import jax

from maua_tpu.compile_cache import setup_compile_cache
setup_compile_cache()
import jax.numpy as jnp
import numpy as np

from maua_tpu.models import Generator

size = int(sys.argv[1]) if len(sys.argv) > 1 else 256

gen32 = Generator(size=size, constant_input=True)
gen16 = Generator(size=size, constant_input=True, dtype=jnp.bfloat16)
rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
variables = jax.jit(lambda: gen32.init(rngs, jnp.zeros((1, 512))))()

z = jax.random.normal(jax.random.PRNGKey(2), (4, 512))
img32 = np.asarray(jax.jit(lambda z: gen32.apply(variables, z, randomize_noise=False)[0])(z))
img16 = np.asarray(jax.jit(lambda z: gen16.apply(variables, z, randomize_noise=False)[0])(z))

err = np.abs(img32 - img16)
mse = float(np.mean((img32 - img16) ** 2))
psnr = 10 * np.log10(4.0 / mse)  # signal range [-1,1] -> peak-to-peak 2
print(f"size={size}: max|err|={err.max():.4f} mean|err|={err.mean():.5f} PSNR={psnr:.1f} dB")
print(f"fp32 range [{img32.min():.2f},{img32.max():.2f}]")
