"""End-to-end pipeline test: synthesized WAV + fabricated checkpoint →
generate() → video file (BASELINE config-1 shape, CPU-runnable)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.io.wavfile
import torch

from maua_tpu.models import Generator
from maua_tpu.pipeline import generate, get_noise_range
from maua_tpu.render import render, write_video

# end-to-end WAV->video pipeline runs — the slow tier
pytestmark = pytest.mark.slow

from test_torch_ckpt import _flax_gen_to_torch_sd


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    p = tmp_path_factory.mktemp("ckpt") / "g32.pt"
    gen = Generator(size=32, constant_input=True, channel_max=64)
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, jnp.zeros((1, 512))
    )
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in _flax_gen_to_torch_sd(variables, gen).items()}
    torch.save({"g_ema": sd}, str(p))
    return str(p)


@pytest.fixture(scope="module")
def tiny_wav(tmp_path_factory):
    p = tmp_path_factory.mktemp("audio") / "clicks.wav"
    sr = 22050
    n = sr * 2
    y = 0.1 * np.sin(2 * np.pi * 440.0 * np.arange(n) / sr)
    for s in range(0, n - 100, sr // 2):
        y[s : s + 100] += np.hanning(100)
    scipy.io.wavfile.write(str(p), sr, (y * 32767).astype(np.int16))
    return str(p)


def test_get_noise_range_sg2():
    rmin, rmax, side = get_noise_range(1024, 1024, False)
    assert (rmin, rmax) == (5, 22)
    assert side(10) == 5
    rmin1, rmax1, side1 = get_noise_range(1024, 1024, True)
    assert (rmin1, rmax1) == (2, 11)


def test_generate_end_to_end(tiny_ckpt, tiny_wav, tmp_path):
    out = generate(
        ckpt=tiny_ckpt,
        audio_file=tiny_wav,
        G_res=32,
        out_size=32,
        fps=4,
        duration=1.5,
        latent_count=12,
        batch=4,
        output_file=str(tmp_path / "out.mp4"),
    )
    assert os.path.exists(out) or os.path.exists(out + ".npy")
    # npy fallback lets us check frame contents
    if os.path.exists(out + ".npy"):
        frames = np.load(out + ".npy")
        assert frames.shape == (6, 32, 32, 3)
        assert frames.dtype == np.uint8
    else:
        assert os.path.getsize(out) > 0


def test_generate_reconciles_stale_out_size(tiny_ckpt, tiny_wav, tmp_path):
    """With G_res/out_size left at their 1024 defaults, both must reconcile to
    the checkpoint's true resolution — a stale out_size builds the noise
    pyramid for the wrong geometry (first noise map lands on the wrong layer)."""
    out = generate(
        ckpt=tiny_ckpt,
        audio_file=tiny_wav,
        fps=2,
        duration=1,
        latent_count=4,
        batch=2,
        output_file=str(tmp_path / "stale.mp4"),
    )
    assert os.path.exists(out) or os.path.exists(out + ".npy")
    if os.path.exists(out + ".npy"):
        frames = np.load(out + ".npy")
        assert frames.shape[1:] == (32, 32, 3)


def test_generate_with_rewrites(tiny_ckpt, tiny_wav, tmp_path):
    """Model rewriting end-to-end (VERDICT r2 item 5): get_rewrites flows
    through generate() -> render() and actually changes the pixels, and the
    loaded weights stay untouched — a rewrite-run followed by a plain run
    reproduces the plain frames bit-exactly (the reference's setattr hack
    mutated the live model, render.py:160-167; ours is functional)."""
    from maua_tpu.reactive import Rewrite

    def perturb(weight, mod):
        return weight + jnp.mean(mod) * 0.5 * jnp.std(weight) * jnp.sign(weight)

    def get_rewrites(args):
        return [Rewrite("conv1/conv/weight", perturb, modulation=np.ones(args.n_frames, np.float32))]

    common = dict(
        ckpt=tiny_ckpt, audio_file=tiny_wav, G_res=32, out_size=32,
        fps=2, duration=1, latent_count=4, batch=2, seed=3,
    )
    plain = generate(**common, output_file=str(tmp_path / "plain.npy"))
    rewritten = generate(**common, get_rewrites=get_rewrites, output_file=str(tmp_path / "rw.npy"))
    plain2 = generate(**common, output_file=str(tmp_path / "plain2.npy"))

    f_plain, f_rw, f_plain2 = (np.load(p) for p in (plain, rewritten, plain2))
    assert f_plain.shape == f_rw.shape and f_plain.shape[1:] == (32, 32, 3)
    assert not np.array_equal(f_plain, f_rw), "rewrite produced identical frames"
    np.testing.assert_array_equal(f_plain, f_plain2)


def test_render_rejects_truncation_without_latent(tiny_ckpt, tmp_path):
    """Direct render() callers must not silently get un-truncated frames:
    scalar/tensor truncation without truncation_latent is an error."""
    from maua_tpu.io import load_generator

    gen, variables = load_generator(tiny_ckpt)
    latents = np.zeros((2, gen.n_latent, 512), np.float32)
    with pytest.raises(ValueError, match="truncation"):
        render(
            generator=gen,
            variables=variables,
            latents=latents,
            noise=[],
            output_file=str(tmp_path / "x.mp4"),
            batch_size=2,
            fps=4,
            truncation=0.7,
        )


def test_render_tensor_truncation_and_padding(tiny_ckpt, tmp_path):
    """Tail batch smaller than batch_size must be padded, not retraced; tensor
    truncation is per-frame (reference: render.py:169-172)."""
    from maua_tpu.io import load_generator

    gen, variables = load_generator(tiny_ckpt)
    n_frames, n_latent = 5, gen.n_latent
    w = gen.apply(variables, jax.random.normal(jax.random.PRNGKey(0), (2, 512)), method=Generator.get_latent)
    latents = jnp.repeat(w[:1][None], n_frames, axis=0).reshape(n_frames, 1, 512)
    latents = jnp.repeat(latents, n_latent, axis=1)
    trunc_latent = gen.apply(variables, jax.random.PRNGKey(1), method=Generator.mean_latent)

    out = str(tmp_path / "trunc.mp4")
    render(
        generator=gen,
        variables=variables,
        latents=latents,
        noise=[],
        output_file=out,
        batch_size=4,
        fps=4,
        truncation=np.linspace(0.2, 1.0, n_frames).astype(np.float32),
        truncation_latent=trunc_latent,
    )
    assert os.path.exists(out) or os.path.exists(out + ".npy")


def test_write_video_roundtrip(tmp_path):
    arr = (np.random.RandomState(0).rand(4, 16, 16, 3) * 255).astype(np.uint8)
    out = str(tmp_path / "clip.mp4")
    write_video(arr, out, fps=8)
    assert os.path.exists(out) or os.path.exists(out + ".npy")


def test_cli_plugin_loading_and_override(tiny_ckpt, tiny_wav, tmp_path):
    """Plugin protocol: functions loaded from file, OVERRIDE wins over CLI
    (reference: generate_audiovisual.py:266-299)."""
    from maua_tpu.pipeline.cli import load_plugin

    plugin = tmp_path / "plug.py"
    plugin.write_text(
        "OVERRIDE = dict(fps=2)\n"
        "def get_truncation(args):\n"
        "    import numpy as np\n"
        "    return np.linspace(0.5, 1.0, args.n_frames).astype('float32')\n"
    )
    funcs, override = load_plugin(str(plugin))
    assert override == {"fps": 2}
    assert funcs["get_truncation"] is not None
    assert funcs["get_latents"] is None


def test_generate_with_bends_plugin(tiny_ckpt, tiny_wav, tmp_path):
    """End-to-end with a translate bend timeline (the tauceti pattern)."""
    import jax.numpy as jnp

    from maua_tpu.pipeline import generate as gen_mod
    from maua_tpu.reactive import translate_bend

    def get_bends(args):
        mod = jnp.linspace(0, 1, args.n_frames)
        return [translate_bend(2, modulation=mod)]

    out = generate(
        ckpt=tiny_ckpt,
        audio_file=tiny_wav,
        get_bends=get_bends,
        G_res=32,
        out_size=32,
        fps=2,
        duration=1.5,
        latent_count=8,
        batch=2,
        output_file=str(tmp_path / "bent.mp4"),
    )
    assert os.path.exists(out) or os.path.exists(out + ".npy")


def test_render_on_device_mesh(tiny_ckpt, tmp_path, monkeypatch):
    """Frame-axis data-parallel inference: batch sharded over the 8-device
    CPU mesh (the DataParallel analogue, reference:
    generate_audiovisual.py:54-55). Mesh rendering must KEEP the
    device-resident timeline (VERDICT r2 item 8): the whole timeline is
    staged sharded up front, so jax.device_put is called a fixed number of
    times (staging), not once per batch."""
    import jax.numpy as jnp

    from maua_tpu.io import load_generator
    from maua_tpu.models import Generator
    from maua_tpu.parallel import get_mesh

    gen, variables = load_generator(tiny_ckpt)
    n_frames = 32  # 4 batches of 8 — a per-batch feed would device_put >= 4x
    w = gen.apply(variables, jax.random.normal(jax.random.PRNGKey(0), (1, 512)), method=Generator.get_latent)
    latents = jnp.repeat(jnp.repeat(w[None], n_frames, 0), gen.n_latent, 1)
    latents = latents + 0.01 * jax.random.normal(jax.random.PRNGKey(1), latents.shape)

    puts = []
    real_put = jax.device_put
    monkeypatch.setattr(jax, "device_put", lambda *a, **k: (puts.append(1), real_put(*a, **k))[1])

    out = str(tmp_path / "mesh.mp4")
    render(
        generator=gen,
        variables=variables,
        latents=latents,
        noise=[],
        output_file=out,
        batch_size=8,
        fps=4,
        mesh=get_mesh(),
    )
    assert os.path.exists(out) or os.path.exists(out + ".npy")
    # staging puts only (latents + any mods), independent of batch count
    assert len(puts) <= 3, f"mesh render fed per batch: {len(puts)} device_puts"


def test_pack_frames_widescreen_crop():
    """2048-wide gen output -> 1920x1080 crop+resize on device
    (reference: render.py:98-105)."""
    import jax.numpy as jnp

    from maua_tpu.render.frames import _pack_frames

    img = jnp.zeros((2, 3, 1024, 2048))
    out = _pack_frames(img, 1920)
    assert out.shape == (2, 1080, 1920, 3)
    assert out.dtype == jnp.uint8

    img_p = jnp.zeros((2, 3, 2048, 1024))
    out_p = _pack_frames(img_p, 1080)
    assert out_p.shape == (2, 1920, 1080, 3)

    sq = jnp.zeros((2, 3, 64, 64))
    assert _pack_frames(sq, None).shape == (2, 64, 64, 3)


def test_generate_stylegan1_end_to_end(tiny_wav, tmp_path):
    """SG1 checkpoints route through the G_style port
    (reference: generate_audiovisual.py:41-42)."""
    import torch

    from test_stylegan1 import fabricate_sg1_sd

    sd = {k: torch.from_numpy(v) for k, v in fabricate_sg1_sd(size=32).items()}
    p = str(tmp_path / "sg1.pt")
    torch.save(sd, p)

    out = generate(
        ckpt=p,
        audio_file=tiny_wav,
        stylegan1=True,
        G_res=32,
        out_size=32,
        fps=2,
        duration=1.0,
        latent_count=6,
        batch=2,
        truncation=0.8,
        output_file=str(tmp_path / "sg1.mp4"),
    )
    assert os.path.exists(out) or os.path.exists(out + ".npy")


def test_segmented_noise_structure():
    """The reference's moving-noise timeline (generate_video.py:288-336):
    coarse scales animate at the START, mid scales in the MIDDLE band, fine
    scales at the END; scales beyond the cap are dropped (None)."""
    from maua_tpu.pipeline.interpolate import segmented_noise

    n_frames = 12
    noise = segmented_noise(n_frames, 64, 64, moving_frames=4, mid_start=3, smooth=0.0)
    rmin, rmax, _ = get_noise_range(64, 64, False)
    assert len(noise) == rmax - rmin  # one per scale (11 @64²)
    for i, n in enumerate(noise):
        assert n is not None and n.shape[0] == n_frames and n.shape[1] == 1

    def animated(seg):  # frames differ within the slice
        return np.ptp(seg, axis=0).max() > 1e-6

    coarse, mid, fine = noise[0], noise[5], noise[-1]
    assert animated(coarse[:4]) and not animated(coarse[6:])
    assert not animated(mid[:3]) and animated(mid[3:7]) and not animated(mid[8:])
    assert not animated(fine[:4]) and animated(fine[-4:])

    # the >max_scale_idx VRAM guard (generate_video.py:293-295)
    capped = segmented_noise(4, 64, 64, moving_frames=2, max_scale_idx=4, smooth=0.0)
    assert capped[4] is not None and all(n is None for n in capped[5:])


def test_build_manipulations_pad_and_timelines():
    """Manipulation list parity (generate_video.py:463-523): the layer-0
    replication-pad + add-noise manipulation appears iff out_size > G_res;
    translate/zoom/rotate timelines have per-frame modulation."""
    from maua_tpu.pipeline.interpolate import build_manipulations

    same = build_manipulations(8, 32, 32)
    assert same == []

    up = build_manipulations(8, 64, 32, translate_layer=2, zoom_layer=3, rotate_layer=4)
    # pad + noise at layer 0 (uncommented reference manipulation :470-483)
    assert up[0].layer == 0 and up[1].layer == 0
    x = jnp.ones((2, 3, 4, 4))
    assert up[0].transform(x).shape == (2, 3, 8, 8)  # 4x4 -> 2^log_min_res
    layers = [b.layer for b in up[2:]]
    assert layers == [2, 3, 4]
    for b in up[2:]:
        assert b.modulation is not None and len(b.modulation) == 8
    zoom_mod = np.asarray(up[3].modulation)
    assert zoom_mod.min() >= 0.5 - 1e-6 and zoom_mod.max() <= 1.5 + 1e-6
    rot_mod = np.asarray(up[4].modulation)
    assert rot_mod.min() >= 0.0 and rot_mod.max() <= 360.0


def test_interpolation_video_working_subset(tiny_ckpt, tmp_path):
    """generate_video.py's working subset end-to-end: static first-latent hold
    + segmented moving noise + bend timelines + the noise-debug video."""
    from maua_tpu.pipeline.interpolate import interpolation_video

    out = str(tmp_path / "iv.mp4")
    res = interpolation_video(
        tiny_ckpt,
        n_latents=3,
        duration=1.5,
        fps=4,
        interp="static",
        batch=3,
        output_file=out,
        noise_mode="segmented",
        noise_debug=True,
        translate_layer=1,
        zoom_layer=2,
        rotate_layer=2,
        truncation=0.8,
    )
    assert os.path.exists(res) or os.path.exists(res + ".npy")
    dbg = str(tmp_path / "iv_noise.mp4")
    assert os.path.exists(dbg) or os.path.exists(dbg + ".npy")
    if os.path.exists(res + ".npy"):
        frames = np.load(res + ".npy")
        assert frames.shape == (6, 32, 32, 3)
        # static latent + moving noise is NOT a freeze-frame video
        assert np.ptp(frames.astype(np.int16), axis=0).max() > 0


def test_interpolation_video_slerp_cli(tiny_ckpt, tmp_path):
    """Flag-compatible CLI (reference generate_video.py argparse): --n_frames
    overrides duration*fps, --latents loads a user .npy selection."""
    from maua_tpu.pipeline.interpolate import main as interp_main

    sel = np.tile(
        np.random.RandomState(0).randn(3, 1, 512).astype(np.float32), (1, 8, 1)
    )
    latf = str(tmp_path / "sel.npy")
    np.save(latf, sel)
    out = str(tmp_path / "cli.mp4")
    rc = interp_main([
        "--ckpt", tiny_ckpt, "--latents", latf, "--interp", "slerp",
        "--n_frames", "4", "--fps", "4", "--batch", "2", "--output_file", out,
    ])
    assert rc == 0
    assert os.path.exists(out) or os.path.exists(out + ".npy")
