"""CLI integration tests (reference tests/test_cli_integration.py analogue).

Drives ``iq_to_audio_tpu.cli.main`` in-process (a subprocess would pay the
JAX import+compile cost per case) against synthetic captures, asserting
output WAV sample rate/count/RMS like the reference's golden-output suite.
"""

from __future__ import annotations

import numpy as np
import pytest

from conftest import make_nfm_iq

from iq_to_audio_tpu.cli import build_parser, main
from iq_to_audio_tpu.io.riff import parse_wav_header
from iq_to_audio_tpu.io.writer import read_wav, write_stereo_wav

FS = 250_000.0
CENTER = 145_000_000.0
TARGET = CENTER + 25_000.0


@pytest.fixture
def capture(tmp_path):
    iq = make_nfm_iq(FS, 1.0, 25_000.0)
    path = tmp_path / f"baseband_{int(CENTER)}Hz_iq.wav"
    write_stereo_wav(path, np.column_stack([iq.real, iq.imag]), int(FS))
    return path


def test_version_exits_zero(capsys):
    with pytest.raises(SystemExit) as exc:
        main(["--version"])
    assert exc.value.code == 0


def test_parser_rejects_conflicts():
    with pytest.raises(SystemExit):
        main(["--cli", "--interactive"])
    with pytest.raises(SystemExit):
        main(["--cli", "--audio-post", "x", "--benchmark"])


def test_parser_limits_targets(capture):
    args = ["--cli", "--in", str(capture)]
    for f in range(6):
        args += ["--ft", str(145_000_000 + f * 1000)]
    with pytest.raises(SystemExit):
        main(args)


def test_duplicate_targets_rejected(capture):
    with pytest.raises(SystemExit):
        main(["--cli", "--in", str(capture), "--ft", "145025000", "--ft", "145025000"])


def test_nfm_full_run(tmp_path, capture, capsys):
    out = tmp_path / "audio.wav"
    rc = main(["--cli", "--in", str(capture), "--ft", str(int(TARGET)), "--out", str(out)])
    assert rc == 0
    data, rate = read_wav(out)
    assert rate == 48_000
    assert abs(data.shape[0] - 48_000) < 100
    rms = float(np.sqrt(np.mean(data[4800:43200, 0] ** 2)))
    assert 0.01 < rms < 0.2  # demodulated 1 kHz NFM tone level window
    captured = capsys.readouterr()
    assert "Audio peak level" in captured.out


def test_probe_only_output(capture, capsys):
    rc = main(["--cli", "--in", str(capture), "--ft", str(int(TARGET)), "--probe-only"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Sample rate: 250000.00 Hz" in out
    assert "Center frequency: 145000000 Hz" in out
    assert "decimation" in out


def test_preview_flag(tmp_path, capture):
    out = tmp_path / "audio.wav"
    rc = main(
        [
            "--cli",
            "--in",
            str(capture),
            "--ft",
            str(int(TARGET)),
            "--out",
            str(out),
            "--preview",
            "0.25",
        ]
    )
    assert rc == 0
    preview = tmp_path / "audio_preview.wav"
    assert preview.exists()
    data, rate = read_wav(preview)
    assert abs(data.shape[0] - 12_000) < 400


def test_multi_target_outputs(tmp_path, capture):
    out = tmp_path / "audio.wav"
    rc = main(
        [
            "--cli",
            "--in",
            str(capture),
            "--ft",
            str(int(TARGET)),
            "--ft",
            str(int(CENTER - 30_000)),
            "--out",
            str(out),
            "--mix-sign",
            "1",
        ]
    )
    assert rc == 0
    assert (tmp_path / f"audio_{int(TARGET)}.wav").exists()
    assert (tmp_path / f"audio_{int(CENTER - 30_000)}.wav").exists()


def test_multi_capture_same_stem_and_artifacts(tmp_path):
    """Two --in captures with the SAME filename in different directories
    must not clobber each other's outputs, and shared --dump-iq /
    --plot-stages hints get per-capture suffixes instead of each capture
    overwriting the previous one's artifacts."""
    iq = make_nfm_iq(FS, 0.4, 25_000.0)
    paths = []
    for d in ("day1", "day2"):
        sub = tmp_path / d
        sub.mkdir()
        p = sub / f"baseband_{int(CENTER)}Hz_cap.wav"
        write_stereo_wav(p, np.column_stack([iq.real, iq.imag]), int(FS))
        paths.append(p)
    out = tmp_path / "audio.wav"
    dump = tmp_path / "chan.cf32"
    rc = main(
        [
            "--cli",
            "--in", str(paths[0]),
            "--in", str(paths[1]),
            "--ft", str(int(TARGET)),
            "--out", str(out),
            "--dump-iq", str(dump),
            "--mix-sign", "1",
        ]
    )
    assert rc == 0
    outs = sorted(q.name for q in tmp_path.glob("audio_*.wav"))
    dumps = sorted(q.name for q in tmp_path.glob("chan_*.cf32"))
    assert len(outs) == 2, outs  # unique per capture, no clobbering
    assert len(dumps) == 2, dumps
    for q in tmp_path.glob("chan_*.cf32"):
        assert q.stat().st_size > 0


def test_pass_through_demod_none(tmp_path, capture, capsys):
    out = tmp_path / "slice.wav"
    rc = main(
        [
            "--cli",
            "--in",
            str(capture),
            "--ft",
            str(int(TARGET)),
            "--demod",
            "none",
            "--out",
            str(out),
        ]
    )
    assert rc == 0
    info = parse_wav_header(out)
    assert info.channels == 2
    assert "IQ slice peak magnitude" in capsys.readouterr().out


def test_dump_iq_and_plot(tmp_path, capture):
    out = tmp_path / "audio.wav"
    rc = main(
        [
            "--cli",
            "--in",
            str(capture),
            "--ft",
            str(int(TARGET)),
            "--out",
            str(out),
            "--dump-iq",
            str(tmp_path / "d.cf32"),
            "--plot-stages",
            str(tmp_path / "p.png"),
        ]
    )
    assert rc == 0
    assert (tmp_path / "d.cf32").stat().st_size > 1000
    assert (tmp_path / "p.png").stat().st_size > 10_000


def test_spectrum_png_only(tmp_path, capture):
    """--spectrum-png without --ft renders the capture PSD+waterfall PNG and
    exits cleanly (headless analogue of the GUI snapshot)."""
    png = tmp_path / "spec.png"
    rc = main(["--cli", "--in", str(capture), "--spectrum-png", str(png)])
    assert rc == 0
    assert png.stat().st_size > 10_000


def test_spectrum_png_alongside_run(tmp_path, capture):
    out = tmp_path / "audio.wav"
    png = tmp_path / "spec.png"
    rc = main(
        [
            "--cli",
            "--in",
            str(capture),
            "--ft",
            str(int(TARGET)),
            "--out",
            str(out),
            "--spectrum-png",
            str(png),
            "--spectrum-seconds",
            "0.5",
        ]
    )
    assert rc == 0
    assert png.stat().st_size > 10_000
    assert out.exists()


def test_spectrum_png_raw_needs_rate(tmp_path, capsys):
    raw = tmp_path / "capture.cs16"
    raw.write_bytes(np.zeros(65536, dtype=np.int16).tobytes())
    rc = main(
        ["--cli", "--in", str(raw), "--spectrum-png", str(tmp_path / "s.png")]
    )
    assert rc != 0  # clean failure, not a traceback


def test_benchmark_smoke(capsys):
    rc = main(
        [
            "--cli",
            "--benchmark",
            "--benchmark-seconds",
            "0.5",
            "--benchmark-sample-rate",
            "250000",
        ]
    )
    assert rc == 0


def test_audio_post_cli(tmp_path):
    from iq_to_audio_tpu.io.riff import WavStreamWriter

    rng = np.random.default_rng(0)
    audio = rng.normal(scale=0.002, size=32_000).astype(np.float32)
    audio[12_000:20_000] += 0.4 * np.sin(
        2 * np.pi * 600 * np.arange(8_000) / 16_000
    ).astype(np.float32)
    p = tmp_path / "rec.wav"
    with WavStreamWriter(p, 16_000, 1, "pcm_s16le") as w:
        w.write_float(audio)
    rc = main(["--audio-post", str(tmp_path), "--audio-post-mode", "static"])
    assert rc == 0
    assert (tmp_path / "rec-cleaned.wav").exists()


def test_audio_post_cli_stream_threshold(tmp_path, monkeypatch):
    """--audio-post-stream-mb routes the file through the bounded-memory
    streaming engine with byte-identical output."""
    from iq_to_audio_tpu.io.riff import WavStreamWriter
    import iq_to_audio_tpu.post.squelch as sq

    called = []
    orig = sq._process_wav_streaming
    monkeypatch.setattr(
        sq, "_process_wav_streaming",
        lambda *a, **k: (called.append(1), orig(*a, **k))[1],
    )
    rng = np.random.default_rng(0)
    audio = rng.normal(scale=0.002, size=32_000).astype(np.float32)
    audio[12_000:20_000] += 0.4 * np.sin(
        2 * np.pi * 600 * np.arange(8_000) / 16_000
    ).astype(np.float32)
    for d in ("mem", "stream"):
        (tmp_path / d).mkdir()
        with WavStreamWriter(tmp_path / d / "rec.wav", 16_000, 1, "pcm_s16le") as w:
            w.write_float(audio)
    rc = main(["--audio-post", str(tmp_path / "mem"), "--audio-post-mode", "static"])
    assert rc == 0 and not called
    rc = main(["--audio-post", str(tmp_path / "stream"), "--audio-post-mode",
               "static", "--audio-post-stream-mb", "0.001"])
    assert rc == 0 and called
    assert (tmp_path / "mem" / "rec-cleaned.wav").read_bytes() == (
        tmp_path / "stream" / "rec-cleaned.wav"
    ).read_bytes()


def test_missing_input_errors():
    with pytest.raises(SystemExit):
        main(["--cli", "--ft", "145000000"])


def test_raw_input_needs_rate(tmp_path, capsys):
    path = tmp_path / "cap.cu8"
    path.write_bytes(bytes(4096))
    rc = main(["--cli", "--in", str(path), "--ft", "1000000", "--fc", "1000000"])
    assert rc == 1  # clean error, not a traceback


def test_input_format_override_parsing():
    parser = build_parser()
    args = parser.parse_args(["--input-format", "raw-cs16"])
    assert args.input_format == "raw-cs16"


def test_cli_multi_capture_sequential_fallback(tmp_path, monkeypatch):
    """Repeated --in on a single-device host falls back to one pipeline run
    per capture with per-capture output names."""
    import jax
    import numpy as np
    from conftest import make_nfm_iq
    from iq_to_audio_tpu.io.writer import read_wav, write_stereo_wav
    from iq_to_audio_tpu import cli

    single = jax.devices()[:1]
    monkeypatch.setattr(jax, "devices", lambda *a, **k: single)

    fs = 250_000.0
    paths = []
    for name in ("one", "two"):
        iq = make_nfm_iq(fs, 0.4, 25_000.0)
        p = tmp_path / f"baseband_145000000Hz_{name}.wav"
        write_stereo_wav(p, np.column_stack([iq.real, iq.imag]), int(fs))
        paths.append(p)
    out = tmp_path / "audio.wav"
    rc = cli.main(
        [
            "--cli",
            "--in", str(paths[0]),
            "--in", str(paths[1]),
            "--ft", "145025000",
            "--out", str(out),
            "--chunk", "32768",
            "--mix-sign", "1",
        ]
    )
    assert rc == 0
    a1, sr1 = read_wav(tmp_path / "audio_baseband_145000000Hz_one.wav")
    a2, sr2 = read_wav(tmp_path / "audio_baseband_145000000Hz_two.wav")
    assert sr1 == sr2 == 48_000
    assert a1.shape == a2.shape
    np.testing.assert_array_equal(a1, a2)  # identical captures -> identical audio


def test_cli_multi_capture_dp_path(tmp_path):
    """With enough devices the repeated --in path runs data-parallel."""
    import jax

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs multiple devices")
    import numpy as np
    from conftest import make_nfm_iq
    from iq_to_audio_tpu.io.writer import read_wav, write_stereo_wav
    from iq_to_audio_tpu import cli

    fs = 250_000.0
    paths = []
    for name in ("dpa", "dpb"):
        iq = make_nfm_iq(fs, 0.4, 25_000.0)
        p = tmp_path / f"baseband_145000000Hz_{name}.wav"
        write_stereo_wav(p, np.column_stack([iq.real, iq.imag]), int(fs))
        paths.append(p)
    rc = cli.main(
        [
            "--cli",
            "--in", str(paths[0]),
            "--in", str(paths[1]),
            "--ft", "145025000",
            "--mix-sign", "1",
        ]
    )
    assert rc == 0
    outs = sorted(tmp_path.glob("baseband_145000000Hz_dp*_145025000.wav"))
    assert len(outs) == 2
    a1, _ = read_wav(outs[0])
    a2, _ = read_wav(outs[1])
    np.testing.assert_array_equal(a1, a2)


def test_cli_burst_mode(tmp_path):
    """--burst-segments routes through the heterogeneous executor and the
    spliced output matches the serial run (device stream only here)."""
    iq = make_nfm_iq(FS, 5.0, 25_000.0)
    cap = tmp_path / f"baseband_{int(CENTER)}Hz_burst.wav"
    write_stereo_wav(cap, np.column_stack([iq.real, iq.imag]), int(FS))

    serial_out = tmp_path / "serial.wav"
    rc = main(["--cli", "--in", str(cap), "--ft", str(int(TARGET)),
               "--out", str(serial_out)])
    assert rc == 0
    burst_out = tmp_path / "burst.wav"
    rc = main(["--cli", "--in", str(cap), "--ft", str(int(TARGET)),
               "--out", str(burst_out),
               "--burst-segments", "2", "--burst-cpu-workers", "0"])
    assert rc == 0
    a, _ = read_wav(serial_out)
    b, _ = read_wav(burst_out)
    assert a.shape == b.shape
    err = 20.0 * np.log10(
        np.linalg.norm(b[:, 0] - a[:, 0]) / max(np.linalg.norm(a[:, 0]), 1e-30)
    )
    assert err < -60.0, f"burst-vs-serial error {err:.1f} dB"
