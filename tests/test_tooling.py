"""Tooling smoke tests: eval CLIs, device monitor, prepare_vae_codes,
sample/interpolate entry points."""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    import cv2

    from maua_tpu.data import prepare_data

    folder = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    for i in range(8):
        cv2.imwrite(str(folder / f"i{i}.png"), (rng.rand(40, 40, 3) * 255).astype(np.uint8))
    out = str(tmp_path_factory.mktemp("shards"))
    prepare_data(str(folder), out, sizes=(32,), n_workers=1)
    return out


@pytest.fixture(scope="module")
def tiny_ckpt2(tmp_path_factory):
    import torch

    from maua_tpu.models import Generator
    from test_torch_ckpt import _flax_gen_to_torch_sd

    p = tmp_path_factory.mktemp("ck") / "g32b.pt"
    gen = Generator(size=32, constant_input=True, channel_max=32)
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, jnp.zeros((1, 512))
    )
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in _flax_gen_to_torch_sd(variables, gen).items()}
    torch.save({"g_ema": sd}, str(p))
    return str(p)


def test_eval_cli_inception_and_fid(shard_dir, tiny_ckpt2, tmp_path, capsys, monkeypatch):
    """Exercises the stats/fid plumbing with a cheap feature stub — the real
    InceptionV3 architecture is covered by test_eval (299² compile is too
    slow for the 1-core CI box)."""
    import maua_tpu.eval.cli as cli

    def tiny_features(weights_path, fid_variant=False):
        def feats(img):
            import jax.numpy as jnp

            pooled = jnp.mean(img, axis=(2, 3))
            return jnp.concatenate([pooled, jnp.var(img, axis=(2, 3))], axis=1)

        return feats, False

    monkeypatch.setattr(cli, "_feature_net", tiny_features)
    main = cli.main

    stats = str(tmp_path / "stats.pkl")
    assert main(["inception", "--path", shard_dir, "--size", "32", "--batch", "4", "--out", stats]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["calibrated"] is False
    assert os.path.exists(stats)

    assert main(["fid", "--ckpt", tiny_ckpt2, "--stats", stats, "--n_sample", "8", "--batch", "4"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["fid"])


def test_eval_cli_ppl(tiny_ckpt2, capsys):
    from maua_tpu.eval.cli import main

    assert main(["ppl", "--ckpt", tiny_ckpt2, "--n_sample", "8", "--batch", "4"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["ppl"])


def test_device_monitor(tmp_path):
    from maua_tpu.telemetry.monitor import DeviceMonitor

    log = str(tmp_path / "mon.jsonl")
    mon = DeviceMonitor(log, interval_s=0.05, window=3).start()
    time.sleep(0.5)
    mon.stop()
    lines = open(log).read().strip().splitlines()
    assert len(lines) >= 1
    entry = json.loads(lines[0])
    assert "host_rss_kb" in entry or any(k.startswith("dev0") for k in entry)


def test_prepare_vae_codes(shard_dir, tmp_path):
    from maua_tpu.data.prepare_vae_codes import encode_dataset
    from maua_tpu.models.autoencoder import LogCoshVAE

    model = LogCoshVAE(hidden_dims=(8, 16, 32, 64), latent_dim=32)
    x0 = jnp.zeros((1, 3, 32, 32))
    variables = model.init({"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)}, x0)
    out = str(tmp_path / "codes")
    n = encode_dataset(model, variables, shard_dir, 32, out, batch=4)
    assert n == 8
    import glob
    import pickle

    from maua_tpu.data import RecordShardReader

    shards = glob.glob(os.path.join(out, "*.mrec"))
    assert shards
    r = RecordShardReader(shards[0])
    code = pickle.loads(r.get(0))
    assert code.shape == (32,)


def test_sample_cli(tiny_ckpt2, tmp_path):
    from maua_tpu.pipeline.sample import sample

    out = sample(tiny_ckpt2, pics=3, sample_batch=2, truncation=0.7, out_dir=str(tmp_path / "s"), grid=True)
    assert os.path.exists(os.path.join(out, "000000.png"))
    assert os.path.exists(os.path.join(out, "grid.png"))


def test_interpolate_video(tiny_ckpt2, tmp_path):
    from maua_tpu.pipeline.interpolate import interpolation_video

    out = interpolation_video(
        tiny_ckpt2, n_latents=4, duration=1.0, fps=4, batch=2,
        output_file=str(tmp_path / "i.mp4"),
    )
    assert os.path.exists(out) or os.path.exists(out + ".npy")


def test_projector_inversion_reduces_loss(tiny_ckpt2):
    """GAN inversion improves reconstruction over the init
    (reference: projector.py:146-173)."""
    import jax.numpy as jnp

    from maua_tpu.io import load_generator
    from maua_tpu.pipeline.projector import project

    gen, variables = load_generator(tiny_ckpt2)
    # target = a real generator sample, so a perfect inversion exists
    z = jax.random.normal(jax.random.PRNGKey(5), (1, gen.style_dim))
    target, _ = gen.apply(variables, z, randomize_noise=False)

    latent, noises, history = project(
        gen, variables, jnp.asarray(target), n_steps=30, lr=0.2, log_every=5,
        noise_regularize_weight=1e3,
    )
    assert latent.shape == (1, gen.n_latent, gen.style_dim)
    assert len(noises) == gen.num_layers
    assert history[-1]["dist"] < history[0]["dist"]


def test_vae_sweep_cli(shard_dir, capsys):
    from maua_tpu.train.vae_cli import main

    # decoder rebuilds from 2x2, so size must equal 2^(n_layers+1)
    rc = main([
        "--path", shard_dir, "--model", "logcosh", "--size", "32",
        "--iter", "4", "--batch_size", "2", "--latent_dim", "16",
        "--number_filters", "4", "--n_layers", "4", "--learning_rate", "1e-3",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    score_line = [l for l in lines if "Score" in l][-1]
    assert np.isfinite(score_line["Score"])
    assert not score_line.get("failed", False)


def test_select_latents_cli(tiny_ckpt2, tmp_path):
    from maua_tpu.pipeline.select_latents import main

    out = str(tmp_path / "sel")
    rc = main([
        "--ckpt", tiny_ckpt2, "--n", "6", "--out", out,
        "--pick", "intro=0,2", "--pick", "drop=1,3,5", "--seed", "3",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "sheet.jpg"))
    all_lat = np.load(os.path.join(out, "all_latents.npy"))
    intro = np.load(os.path.join(out, "intro_latents.npy"))
    drop = np.load(os.path.join(out, "drop_latents.npy"))
    assert all_lat.shape[0] == 6 and all_lat.ndim == 3  # [n, L, D] W+
    np.testing.assert_array_equal(intro, all_lat[[0, 2]])
    np.testing.assert_array_equal(drop, all_lat[[1, 3, 5]])
    assert os.path.exists(os.path.join(out, "intro_sheet.jpg"))


def test_latent_picker_http_workflow(tmp_path):
    """Drives the web latent picker end-to-end over real HTTP: gallery state,
    image fetch, intro/drop selection (incl. clearing), new batch, save —
    the reference's click-to-sort workflow (select_latents.py:262-341)
    without a display."""
    import json
    import threading
    import urllib.request

    import numpy as np

    from maua_tpu.pipeline.select_latents import LatentPicker, make_picker_server

    rng = np.random.RandomState(0)
    calls = []

    def sample(n):
        calls.append(n)
        return rng.randn(n, 14, 512).astype(np.float32), np.tanh(
            rng.randn(n, 3, 16, 16).astype(np.float32)
        )

    picker = LatentPicker(sample, str(tmp_path / "sel"), n_per_batch=4)
    picker.new_batch()
    srv = make_picker_server(picker, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"

    def get(path):
        with urllib.request.urlopen(base + path, timeout=10) as r:
            return r.headers.get_content_type(), r.read()

    def post(path, obj=None):
        req = urllib.request.Request(
            base + path, data=json.dumps(obj or {}).encode(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            return json.loads(r.read())

    try:
        ctype, html = get("/")
        assert ctype == "text/html" and b"latent picker" in html
        state = json.loads(get("/state")[1])
        assert len(state["items"]) == 4
        ctype, jpg = get("/img/2.jpg")
        assert ctype == "image/jpeg" and jpg[:2] == b"\xff\xd8"

        post("/select", {"index": 0, "set": "intro"})
        post("/select", {"index": 1, "set": "drop"})
        post("/select", {"index": 2, "set": "intro"})
        post("/select", {"index": 2, "set": None})  # clear
        state = json.loads(get("/state")[1])
        assert state["counts"] == {"intro": 1, "drop": 1}
        assert state["items"][0]["set"] == "intro" and state["items"][2]["set"] is None

        new = post("/batch")
        assert new["indices"] == [4, 5, 6, 7] and calls == [4, 4]

        post("/select", {"index": 5, "set": "intro"})
        saved = post("/save")
        intro = np.load(saved["intro"])
        assert intro.shape == (2, 14, 512)
        np.testing.assert_array_equal(intro[0], np.load(saved["all"])[0])
        drop = np.load(saved["drop"])
        assert drop.shape == (1, 14, 512)
        import os

        assert os.path.exists(str(tmp_path / "sel" / "intro_sheet.jpg"))

        # error surfaces as HTTP 500 JSON, not a hung socket
        import urllib.error

        try:
            post("/select", {"index": 99, "set": "intro"})
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 500
    finally:
        srv.shutdown()
        t.join(timeout=5)
