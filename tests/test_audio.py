"""Audio DSP tests: STFT round-trips, known-signal feature checks, envelope
post-processing semantics (SURVEY.md §4: golden-value tests for audio)."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

import maua_tpu.audio as audio


SR = 22050


def synth_click_track(sr=SR, dur=3.0, bpm=120.0):
    """Clicks on the beat + a 440 Hz tone — known onsets and chroma."""
    n = int(sr * dur)
    y = 0.1 * np.sin(2 * np.pi * 440.0 * np.arange(n) / sr)
    period = int(sr * 60.0 / bpm)
    for start in range(0, n - 100, period):
        y[start : start + 100] += np.hanning(100) * np.sin(2 * np.pi * 1500 * np.arange(100) / sr)
    return y.astype(np.float32)


def test_stft_istft_roundtrip():
    y = np.random.RandomState(0).randn(SR).astype(np.float32) * 0.1
    S = audio.stft(jnp.asarray(y), n_fft=1024, hop_length=256)
    y2 = audio.istft(S, n_fft=1024, hop_length=256, length=len(y))
    np.testing.assert_allclose(np.asarray(y2), y, atol=1e-4)


def test_stft_peak_bin():
    f = 1000.0
    y = np.sin(2 * np.pi * f * np.arange(SR) / SR).astype(np.float32)
    S = np.abs(np.asarray(audio.stft(jnp.asarray(y), n_fft=2048, hop_length=512)))
    peak_bin = S[:, S.shape[1] // 2].argmax()
    expected = round(f / (SR / 2) * 1024)
    assert abs(int(peak_bin) - expected) <= 1


def test_resample_signal_preserves_shape_and_mean():
    x = np.sin(np.linspace(0, 20 * np.pi, 1000)).astype(np.float32)
    r = np.asarray(audio.resample_signal(jnp.asarray(x), 333))
    assert r.shape == (333,)
    assert abs(r.mean() - x.mean()) < 1e-3
    r2 = np.asarray(audio.resample_signal(jnp.asarray(x), 1000))
    np.testing.assert_allclose(r2, x, atol=1e-6)


def test_normalize_and_percentile_clip():
    x = jnp.asarray(np.linspace(-3, 7, 101).astype(np.float32))
    n = np.asarray(audio.normalize(x))
    assert n.min() == pytest.approx(0) and n.max() == pytest.approx(1)

    sig = np.zeros(100, np.float32)
    sig[10] = 1.0
    sig[50] = 10.0  # extreme peak should be clipped away at p=50
    c = np.asarray(audio.percentile_clip(jnp.asarray(sig), 50))
    assert c.max() == pytest.approx(1.0)
    assert c[10] == pytest.approx(1.0)  # lower peak saturates after clip

    # jittable: identical result under jit (users may jit reactive pipelines)
    cj = np.asarray(jax.jit(audio.percentile_clip, static_argnums=1)(jnp.asarray(sig), 50))
    np.testing.assert_allclose(cj, c, atol=1e-7)
    # no-peaks fallback (monotone signal): percentile over the whole signal
    mono = jnp.asarray(np.linspace(0, 1, 20, dtype=np.float32))
    m = np.asarray(audio.percentile_clip(mono, 50))
    assert np.isfinite(m).all() and m.max() == pytest.approx(1.0)


def test_compress_expand():
    x = jnp.asarray(np.array([0.1, 0.5, 0.9], np.float32))
    out = np.asarray(audio.compress(x, 0.8, 0.5))
    assert out.max() == pytest.approx(1.0)


def test_gaussian_filter_smooths_and_preserves_shape():
    x = np.zeros((100,), np.float32)
    x[50] = 1.0
    sm = np.asarray(audio.gaussian_filter(jnp.asarray(x), 2.0))
    assert sm.shape == (100,)
    assert sm[50] < 1.0 and sm[48] > 0.0
    np.testing.assert_allclose(sm.sum(), 1.0, rtol=1e-3)  # mass preserved

    # 2-D timeline
    x2 = np.zeros((60, 4), np.float32)
    x2[30, 2] = 1.0
    sm2 = np.asarray(audio.gaussian_filter(jnp.asarray(x2), 1.5))
    assert sm2.shape == (60, 4)
    assert sm2[29, 2] > 0

    # causal: energy after the impulse is suppressed
    smc = np.asarray(audio.gaussian_filter(jnp.asarray(x), 2.0, causal=0.0))
    assert smc[53] == pytest.approx(0.0, abs=1e-6)
    assert smc[47] > 0


def test_gaussian_filter_short_sequence_fallback():
    x = np.random.RandomState(0).rand(5).astype(np.float32)
    sm = np.asarray(audio.gaussian_filter(jnp.asarray(x), 10.0))
    assert sm.shape == (5,)
    assert np.isfinite(sm).all()


def test_hpss_separates_tone_from_clicks():
    y = synth_click_track()
    h, p = audio.hpss(jnp.asarray(y), margin=1.0)
    # harmonic keeps the 440 Hz tone, percussive keeps the clicks
    S_h = np.abs(np.asarray(audio.stft(h, n_fft=2048, hop_length=512)))
    S_p = np.abs(np.asarray(audio.stft(p, n_fft=2048, hop_length=512)))
    bin_440 = round(440 / (SR / 2) * 1024)
    assert S_h[bin_440].mean() > 2 * S_p[bin_440].mean()


def test_onsets_peak_on_beats():
    y = synth_click_track(bpm=120, dur=4.0)
    n_frames = 120  # 30 fps * 4 s
    env = np.asarray(audio.onsets(y, SR, n_frames, type="rosa", smooth=1))
    assert env.shape == (n_frames,)
    assert env.min() >= 0 and env.max() <= 1.0 + 1e-6
    # beats every 0.5 s -> every 15 frames; check local maxima near beats
    beat_frames = np.arange(0, n_frames, 15)
    on_beat = env[np.clip(beat_frames[1:], 0, n_frames - 1)]
    off_beat = env[np.clip(beat_frames[1:] + 7, 0, n_frames - 1)]
    assert on_beat.mean() > off_beat.mean()


def test_onsets_madmom_ensemble_runs():
    y = synth_click_track(dur=2.0)
    env = np.asarray(audio.onsets(y, SR, 60, type="mm"))
    assert env.shape == (60,)
    assert np.isfinite(env).all()


def test_rms_tracks_amplitude():
    n = SR * 2
    y = np.sin(2 * np.pi * 440 * np.arange(n) / SR).astype(np.float32)
    y[: n // 2] *= 0.1  # quiet first half
    env = np.asarray(audio.rms(y, SR, 60, smooth=2, clip=100, power=1))
    assert env[:25].mean() < env[35:].mean()


def test_chroma_concentrates_on_played_note():
    # A4 = 440 Hz, pitch class A (index 9 with C=0)
    y = np.sin(2 * np.pi * 440 * np.arange(SR * 2) / SR).astype(np.float32)
    ch = audio.raw_chroma(y, SR, type="cqt", nearest_neighbor=False)
    assert ch.shape[0] == 12
    assert int(np.argmax(ch.mean(axis=1))) == 9


def test_chroma_full_pipeline_shapes():
    # broadband signal so every pitch class has energy (the notes selection
    # keeps the LOWEST-median classes, reference: signal.py:152-153)
    y = (0.1 * np.random.RandomState(0).randn(SR * 2)).astype(np.float32)
    ch = np.asarray(audio.chroma(y, SR, 60, notes=7))
    assert ch.shape == (60, 7)
    assert np.isfinite(ch).all()
    sums = ch.sum(axis=1)
    assert ((np.abs(sums - 1.0) < 1e-3) | (np.abs(sums) < 1e-6)).all()


def test_beat_track_finds_tempo():
    y = synth_click_track(bpm=120, dur=8.0)
    tempo, beats = audio.beat_track(y=y, sr=SR)
    assert 100 < tempo < 140, tempo
    assert len(beats) >= 10
    # inter-beat interval ≈ 0.5 s = 21.5 frames at hop 512
    ibi = np.diff(beats).mean() * 512 / SR
    assert 0.4 < ibi < 0.6, ibi


@pytest.mark.slow
def test_laplacian_segmentation_two_sections():
    # two clearly different sections: 440 Hz tone then broadband noise bursts
    rng = np.random.RandomState(0)
    a = 0.2 * np.sin(2 * np.pi * 440 * np.arange(SR * 4) / SR)
    b = 0.2 * rng.randn(SR * 4)
    y = np.concatenate([a, b]).astype(np.float32)
    # overlay clicks so the beat tracker has something to lock onto
    period = int(SR * 0.5)
    for s in range(0, len(y) - 100, period):
        y[s : s + 100] += np.hanning(100)
    times, labels = audio.laplacian_segmentation(y, SR, k=2)
    assert times[0] == 0.0
    assert len(times) >= 2
    # a boundary should exist near t=4s
    assert any(3.0 < t < 5.0 for t in times), times


def test_plot_utils_write_files(tmp_path):
    """Plot helpers render to files headlessly (reference: util.py:23-94)."""
    import matplotlib

    matplotlib.use("Agg")
    y = synth_click_track(dur=1.0)
    sig = np.linspace(0, 1, 30)

    out1 = audio.plot_signals([sig, sig**2], labels=["a", "b"], out_file=str(tmp_path / "s.png"))
    out2 = audio.plot_spectra([np.random.rand(12, 30)], out_file=str(tmp_path / "sp.png"))
    out3 = audio.plot_audio(y, SR, out_file=str(tmp_path / "a.png"))
    for p in (out1, out2, out3):
        import os

        assert os.path.getsize(p) > 0
    msg = audio.info(sig, "sig")
    assert "shape=(30,)" in msg


def test_chroma_clp_concentrates_on_played_note():
    y = np.sin(2 * np.pi * 440 * np.arange(SR * 2) / SR).astype(np.float32)
    ch = np.asarray(audio.chroma_clp(y, SR))
    assert ch.shape[0] == 12
    assert int(np.argmax(ch.mean(axis=1))) == 9  # A
    norms = np.linalg.norm(ch, axis=0)
    assert np.allclose(norms[norms > 1e-6], 1.0, atol=1e-5)  # l2 per frame


def test_chroma_deep_warns_and_substitutes_clp():
    import warnings

    y = np.sin(2 * np.pi * 440 * np.arange(SR) / SR).astype(np.float32)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        ch = audio.raw_chroma(y, SR, type="deep", nearest_neighbor=False)
    assert any("DeepChroma" in str(w.message) for w in rec)
    want = audio.raw_chroma(y, SR, type="clp", nearest_neighbor=False)
    np.testing.assert_allclose(ch, want, atol=1e-6)
