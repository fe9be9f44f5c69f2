"""Training-CLI wiring and smoke coverage.

Lives in its own (alphabetically early) file: the end-to-end smoke launches a
subprocess that needs real memory, and at the tail of the full suite the
parent pytest process has accumulated enough RSS from ~180 prior tests that
the child segfaults inside XLA:CPU (observed twice, deterministic). Running
early, both processes fit comfortably.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

# subprocess train-CLI smoke runs (multi-minute XLA:CPU compiles) — slow tier
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    import cv2

    from maua_tpu.data import prepare_data

    folder = tmp_path_factory.mktemp("cli_imgs")
    rng = np.random.RandomState(0)
    for i in range(8):
        cv2.imwrite(str(folder / f"i{i}.png"), (rng.rand(40, 40, 3) * 255).astype(np.uint8))
    out = str(tmp_path_factory.mktemp("cli_shards"))
    prepare_data(str(folder), out, sizes=(16, 32), n_workers=1)
    return out


def test_train_cli_config_wiring(capsys):
    """--print_config: every CLI flag lands on the right TrainConfig field
    (guards the argparse wiring incl. --bf16/--s2d_min_res/--channel_max)
    without running a step."""
    from maua_tpu.train.cli import main

    rc = main([
        "--path", "/nonexistent", "--iter", "1", "--size", "32",
        "--batch_size", "3", "--channel_max", "48", "--bf16",
        "--s2d_min_res", "16", "--no-augment", "--print_config",
    ])
    assert rc == 0
    cfg = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert cfg["size"] == 32 and cfg["batch_size"] == 3
    assert cfg["channel_max"] == 48 and cfg["bf16"] is True
    assert cfg["s2d_min_res"] == 16 and cfg["augment"] is False
    assert cfg["r1"] == pytest.approx(1e-5 * 32**2)  # derived arg (train.py:430)


def test_train_cli_two_process(shard_dir, tmp_path):
    """Multi-host bring-up (VERDICT r2 item 4): two real OS processes
    rendezvous via --coordinator (jax.distributed on localhost), each with 2
    virtual CPU devices, and run 2 full training iterations over the 4-device
    global mesh — loader rank-sharding (batch 4 global -> 2 local), rank-0
    metrics IO, and the ALL-process orbax checkpoint (a rank-0-only save
    deadlocks orbax's sync_global_processes barrier — regression-guarded
    here). Mirrors the reference's torch.distributed env:// launch
    (train.py:432-447).

    Config notes (jaxlib 0.9 XLA:CPU + Gloo): running a SECOND collective
    program concurrently (the sample-grid synth) races Gloo context creation
    natively and segfaults ~50% of runs — img_every=0 keeps one collective
    program + the checkpoint barrier (grid synthesis under a mesh is covered
    single-process by tests/test_pipeline.py). The driver os._exit(0)s after
    main() returns: Gloo teardown during interpreter finalization also
    crashes. And Gloo tears down a TIMED-OUT collective while its TCP
    completion is in flight — rank skew past the ~30 s default (two processes
    time-slicing one core through a 2-minute compile) made the step SIGSEGV
    deterministically; fixed by --xla_cpu_collective_timeout_seconds=1200
    (set below and by maybe_initialize_distributed). All jaxlib-CPU
    artifacts — on TPU slices collectives ride ICI through an entirely
    different path."""
    import socket

    with socket.socket() as s:  # free localhost port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    run_dir = str(tmp_path / "run2p")
    driver = tmp_path / "run_cli_2p.py"
    driver.write_text(
        "import sys, os\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from maua_tpu.train.cli import main\n"
        "rc = main(sys.argv[1:])\n"
        "sys.stdout.flush(); sys.stderr.flush()\n"
        "os._exit(rc)\n"
    )
    # capability under guard: rendezvous + loader rank-sharding + rank-0
    # gating + the all-process orbax barrier. Double-backward regs are
    # covered single-process elsewhere (test_train.py) — disabling them
    # (--r1 0 --path_regularize 0) cuts the rank compile from minutes to
    # seconds, shrinking the rank-skew window the Gloo races live in.
    common = [
        "--path", shard_dir, "--run_dir", run_dir, "--iter", "2",
        "--size", "16", "--batch_size", "4", "--channel_max", "8",
        "--r1", "0", "--path_regularize", "0", "--no-augment",
        "--no-lookahead", "--s2d_min_res", "0", "--img_every", "0",
        "--checkpoint_every", "0", "--log_every", "1", "--n_sample", "2",
        "--num_workers", "0", "--coordinator", f"127.0.0.1:{port}",
        "--num_processes", "2",
    ]
    env = dict(os.environ, PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH", ""))
    # the raised collective timeout guards against jaxlib 0.9's Gloo
    # timeout-teardown SIGSEGV under heavy rank skew (1-core host, two
    # processes compiling a 2-minute program concurrently); it is also set by
    # maybe_initialize_distributed, but the env must carry it in case a
    # backend initializes before main() gets there
    env["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=2"
        " --xla_cpu_collective_timeout_seconds=1200"
    )
    def launch():
        procs = [
            subprocess.Popen(
                [sys.executable, str(driver)] + common + ["--process_id", str(r)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
            for r in range(2)
        ]
        outs = []
        try:
            for p in procs:
                out, err = p.communicate(timeout=600)
                outs.append((p.returncode, out, err))
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        return outs

    # quiesce the parent before launching: release jit caches and force a GC
    # so the ranks compete with as small a parent as possible on this 1-core
    # box (round-3 full-suite failure mode: 3/3 retries crashed under load)
    import gc
    import time

    import jax as _jax

    _jax.clear_caches()
    gc.collect()

    # retry ONLY on the documented jaxlib Gloo SIGSEGV (a signal exit on
    # either rank, see docstring) — the raised timeout makes it rare but not
    # extinct; a real regression in our code fails the same way every attempt
    # and still fails this test, and the functional assertions below must
    # pass on the green attempt. A crashed rank usually drags its peer into
    # coordination-service barrier errors, so the peer's nonzero rc is part
    # of the same artifact, covered by the any(rc != 0) green check.
    for attempt in range(5):
        outs = launch()
        if not any(rc < 0 for rc, _, _ in outs):
            break
        import shutil

        shutil.rmtree(run_dir, ignore_errors=True)
        print(f"attempt {attempt}: rank crashed by signal "
              f"{[rc for rc, _, _ in outs]}; retrying (jaxlib Gloo artifact)")
        time.sleep(2.0)  # let the dead coordinator's port/threads drain
    for rc, out, err in outs:
        assert rc == 0, (rc, err[-2000:])
    # both processes saw the 4-device global mesh
    assert "process 0/2, 2 local / 4 global devices" in outs[0][1]
    assert "process 1/2, 2 local / 4 global devices" in outs[1][1]
    # rank 0 (and only rank 0) wrote finite metrics; the multihost orbax
    # checkpoint barrier completed and produced the final checkpoint
    lines = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert len(lines) >= 2
    assert all(np.isfinite(v) for v in lines[-1].values() if isinstance(v, float))
    assert os.path.isdir(os.path.join(run_dir, "step_0000002"))
    assert '"step"' not in outs[1][1]  # rank 1 stays quiet


def test_train_cli_smoke(shard_dir, tmp_path):
    """2 iterations of the full training CLI (loader -> jitted step -> jsonl
    metrics + sample grid + checkpoint), in a subprocess (real entry path +
    memory isolation)."""
    run_dir = str(tmp_path / "run")
    driver = tmp_path / "run_cli.py"
    driver.write_text(
        "import sys\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from maua_tpu.train.cli import main\n"
        "sys.exit(main(sys.argv[1:]))\n"
    )
    args = [
        "--path", shard_dir, "--run_dir", run_dir, "--iter", "2",
        "--size", "32", "--batch_size", "2", "--channel_max", "32",
        "--d_reg_every", "2", "--g_reg_every", "2", "--no-augment",
        "--s2d_min_res", "8", "--img_every", "2", "--checkpoint_every", "2",
        "--log_every", "1", "--n_sample", "2", "--num_workers", "0",
    ]
    env = dict(os.environ, PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH", ""))
    # the parent suite sets XLA_FLAGS=--xla_force_host_platform_device_count=8;
    # inheriting it makes the child build an 8-device mesh (8x the memory for
    # a smoke run) and segfault under load — scrub it
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, str(driver)] + args, env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert proc.returncode == 0, (proc.returncode, proc.stderr[-2000:])
    lines = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert len(lines) >= 1
    assert all(np.isfinite(v) for v in lines[-1].values() if isinstance(v, float))
