#!/usr/bin/env python
"""Comprehensive end-to-end test harness (reference
``run_comprehensive_tests.py``): runs the pytest suite, demodulates synthetic
captures end-to-end for every mode, computes per-capture audio statistics,
renders waveform/histogram/spectrum/waterfall/stage/channel-IQ diagnostics,
captures each run's pipeline log, processes any real-capture fixtures
(``$IQ2A_FIXTURE_DIR`` + ``fixtures.json``, same manifest as
``tests/test_real_captures.py``), runs a benchmark matrix and emits an HTML
report under ``testreports/``.

Usage: python run_comprehensive_tests.py [--skip-pytest] [--quick]
"""

from __future__ import annotations

import argparse
import html
import io
import json
import logging
import os
import subprocess
import sys
import time
from dataclasses import asdict, dataclass
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", os.environ.get("IQ2A_PLATFORM", "cpu"))

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

REPORT_DIR = REPO / "testreports"
FIXTURE_DIR = Path(os.environ.get("IQ2A_FIXTURE_DIR", REPO / "tests" / "fixtures"))


# --------------------------------------------------------------------------
# measurements
# --------------------------------------------------------------------------


@dataclass
class AudioStats:
    """Quantitative per-capture audio statistics (reference
    run_comprehensive_tests.py::AudioStats)."""

    samples: int
    duration_s: float
    rms_dbfs: float
    peak_dbfs: float
    dc_offset: float
    clipped_pct: float
    zero_cross_hz: float


def audio_stats(audio: np.ndarray, rate: float) -> AudioStats:
    x = audio[:, 0].astype(np.float64) if audio.ndim == 2 else audio.astype(np.float64)
    n = x.size
    rms = float(np.sqrt(np.mean(x**2))) if n else 0.0
    peak = float(np.max(np.abs(x))) if n else 0.0
    crossings = int(np.count_nonzero(np.diff(np.signbit(x)))) if n > 1 else 0
    return AudioStats(
        samples=n,
        duration_s=n / rate if rate else 0.0,
        rms_dbfs=20 * np.log10(max(rms, 1e-9)),
        peak_dbfs=20 * np.log10(max(peak, 1e-9)),
        dc_offset=float(np.mean(x)) if n else 0.0,
        clipped_pct=100.0 * float(np.mean(np.abs(x) >= 0.985)) if n else 0.0,
        zero_cross_hz=crossings / (n / rate) / 2.0 if n > 1 and rate else 0.0,
    )


class _CapturedLog:
    """Context manager collecting the pipeline's log lines for the report."""

    def __enter__(self):
        self.stream = io.StringIO()
        self.handler = logging.StreamHandler(self.stream)
        self.handler.setLevel(logging.INFO)
        self.handler.setFormatter(logging.Formatter("%(levelname)s %(message)s"))
        logging.getLogger("iq_to_audio_tpu").addHandler(self.handler)
        return self

    def __exit__(self, *exc):
        logging.getLogger("iq_to_audio_tpu").removeHandler(self.handler)
        return False

    @property
    def text(self) -> str:
        return self.stream.getvalue()


# --------------------------------------------------------------------------
# stages
# --------------------------------------------------------------------------


def run_pytest() -> dict:
    start = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "--ignore=tests/test_benchmark.py"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    return {
        "ok": proc.returncode == 0,
        "seconds": time.time() - start,
        "tail": "\n".join(proc.stdout.splitlines()[-15:]),
    }


def _diag_plots(work, mode, iq, fs, out, dump, plot):
    """Waveform+histogram, input PSD+waterfall, channel-IQ spectrum."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from iq_to_audio_tpu.analysis.spectrum import compute_psd, streaming_waterfall
    from iq_to_audio_tpu.io.writer import read_wav

    artifacts = []
    stats = None
    if out is not None and Path(out).exists():
        audio, rate = read_wav(out)
        stats = audio_stats(audio, float(rate))
        fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(10, 5))
        t = np.arange(audio.shape[0]) / rate
        ax1.plot(t, audio[:, 0], lw=0.4)
        ax1.set_title(f"{mode} waveform")
        ax2.hist(audio[:, 0], bins=120)
        ax2.set_title("amplitude histogram")
        fig.tight_layout()
        wf_png = work / f"waveform_{mode}.png"
        fig.savefig(wf_png, dpi=90)
        plt.close(fig)
        artifacts.append(wf_png.name)
    if plot is not None and Path(plot).exists():
        artifacts.append(Path(plot).name)
    # input spectrum + waterfall diagnostic
    freqs, psd = compute_psd(iq[: 1 << 17], fs, nfft=1 << 15)
    _, _, waterfall, _ = streaming_waterfall(iter([iq]), fs, nfft=1 << 12, max_slices=120)
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 4))
    ax1.plot(freqs / 1e3, psd, lw=0.5)
    ax1.set_title(f"{mode} input PSD")
    ax2.imshow(waterfall.matrix, aspect="auto", cmap="viridis")
    ax2.set_title("waterfall")
    fig.tight_layout()
    spec_png = work / f"spectrum_{mode}.png"
    fig.savefig(spec_png, dpi=90)
    plt.close(fig)
    artifacts.append(spec_png.name)
    # decimated channel IQ spectrum (from --dump-iq cf32)
    if dump is not None and Path(dump).exists():
        chan = np.fromfile(dump, dtype=np.complex64)
        if chan.size:
            cf, cp = compute_psd(chan, 1.0, nfft=min(1 << 13, chan.size))
            fig, ax = plt.subplots(figsize=(8, 3))
            ax.plot(cf, cp, lw=0.5)
            ax.set_title(f"{mode} channel IQ PSD (normalised freq)")
            fig.tight_layout()
            ch_png = work / f"channel_{mode}.png"
            fig.savefig(ch_png, dpi=90)
            plt.close(fig)
            artifacts.append(ch_png.name)
    return artifacts, stats


def run_e2e(quick: bool) -> list[dict]:
    from conftest import make_am_iq, make_nfm_iq, make_tone_iq

    from iq_to_audio_tpu import ProcessingConfig, ProcessingPipeline
    from iq_to_audio_tpu.io.writer import write_stereo_wav

    fs = 250_000.0
    seconds = 0.5 if quick else 1.5
    center = 145_000_000.0
    offset = 25_000.0
    cases = [
        ("nfm", make_nfm_iq(fs, seconds, offset)),
        ("am", make_am_iq(fs, seconds, offset)),
        ("usb", make_tone_iq(fs, seconds, offset + 1_000.0)),
        ("lsb", make_tone_iq(fs, seconds, offset - 1_000.0)),
        ("none", make_tone_iq(fs, seconds, offset)),
    ]
    results = []
    work = REPORT_DIR / "e2e"
    work.mkdir(parents=True, exist_ok=True)
    for mode, iq in cases:
        cap = work / f"baseband_{int(center)}Hz_{mode}.wav"
        write_stereo_wav(cap, np.column_stack([iq.real, iq.imag]), int(fs))
        out = work / f"audio_{mode}.wav"
        plot = work / f"stages_{mode}.png"
        dump = work / f"chan_{mode}.cf32"
        cfg = ProcessingConfig(
            in_path=cap,
            target_freq=center + offset,
            demod_mode=mode,
            output_path=out,
            plot_stages_path=plot if mode != "none" else None,
            dump_iq_path=dump if mode != "none" else None,
        )
        start = time.time()
        with _CapturedLog() as log:
            result = ProcessingPipeline(cfg).run()
        elapsed = time.time() - start
        artifacts, stats = _diag_plots(
            work, mode, iq, fs,
            out if mode != "none" else None,
            dump if mode != "none" else None,
            plot if mode != "none" else None,
        )
        entry = {
            "mode": mode,
            "elapsed": elapsed,
            "realtime": seconds / elapsed,
            # wall time is dominated by one-time XLA compiles at these tiny
            # (1.5 s) captures; the loop number is the steady-state rate
            "loop_realtime": seconds / max(result.loop_seconds, 1e-9),
            "peak_dbfs": 20 * np.log10(max(result.audio_peak, 1e-6)),
            "artifacts": artifacts,
            "stats": asdict(stats) if stats else None,
            "log": log.text,
        }
        results.append(entry)
        print(
            f"[e2e] {mode}: {elapsed:.2f}s wall ({entry['realtime']:.1f}x; "
            f"loop {entry['loop_realtime']:.1f}x realtime)"
        )
    return results


def run_fixtures(quick: bool) -> list[dict]:
    """Real-capture matrix: every entry in the fixtures manifest through the
    full pipeline with stats + diagnostics (reference process_sample over its
    samples/ directory)."""
    manifest = FIXTURE_DIR / "fixtures.json"
    if not manifest.is_file():
        print(f"[fixtures] none found ({manifest}) — skipping tier")
        return []
    from iq_to_audio_tpu import ProcessingConfig, ProcessingPipeline
    from iq_to_audio_tpu.io.reader import convert_to_complex  # noqa: F401
    from iq_to_audio_tpu.io.writer import read_wav

    entries = json.loads(manifest.read_text())
    work = REPORT_DIR / "fixtures"
    work.mkdir(parents=True, exist_ok=True)
    results = []
    for entry in entries:
        path = FIXTURE_DIR / entry["file"]
        if not path.is_file():
            continue
        mode = entry.get("mode", "nfm")
        tag = path.stem[:40]
        out = work / f"audio_{tag}.wav"
        # honor the manifest's CLI-style extras the config can express
        # (raw captures need an explicit sample rate; SSB/AM set --bw)
        extras: dict = {}
        argv = list(entry.get("args", []))
        for flag, field, cast in (
            ("--input-sample-rate", "input_sample_rate", float),
            ("--bw", "bandwidth", float),
            ("--input-format", "input_format", str),
        ):
            if flag in argv:
                extras[field] = cast(argv[argv.index(flag) + 1])
        if "--no-agc" in argv:
            extras["agc_enabled"] = False
        cfg = ProcessingConfig(
            in_path=path,
            target_freq=float(entry["target_freq"]),
            center_freq=float(entry["center_freq"]) if entry.get("center_freq") else None,
            demod_mode=mode,
            output_path=out,
            max_input_seconds=5.0 if quick else None,
            **extras,
        )
        start = time.time()
        with _CapturedLog() as log:
            try:
                result = ProcessingPipeline(cfg).run()
            except Exception as exc:  # noqa: BLE001 - matrix keeps going
                results.append({"file": entry["file"], "mode": mode, "error": str(exc)})
                print(f"[fixtures] {entry['file']}: FAILED ({exc})")
                continue
        elapsed = time.time() - start
        audio, rate = read_wav(out)
        stats = audio_stats(audio, float(rate))
        row = {
            "file": entry["file"],
            "mode": mode,
            "elapsed": elapsed,
            "peak_dbfs": 20 * np.log10(max(result.audio_peak, 1e-6)),
            "stats": asdict(stats),
            "log": log.text,
        }
        expect = entry.get("expect", {})
        checks = []
        if "min_rms_dbfs" in expect:
            checks.append(("rms", stats.rms_dbfs >= expect["min_rms_dbfs"]))
        if "max_clipped_pct" in expect:
            checks.append(("clip", stats.clipped_pct <= expect["max_clipped_pct"]))
        row["checks_ok"] = all(ok for _, ok in checks) if checks else None
        results.append(row)
        print(f"[fixtures] {entry['file']}: {elapsed:.2f}s")
    return results


def run_benchmarks(quick: bool) -> list[dict]:
    """Benchmark matrix: the headline config plus rate variants."""
    from iq_to_audio_tpu.pipeline.benchmark import run_benchmark

    # the headline row mirrors bench.py's geometry (30 s non-quick) so the
    # report's number is comparable to the recorded BENCH_cpu.json artifact
    # instead of a setup-dominated short run
    matrix = [("headline 2.5 MS/s NFM", 2_500_000.0, None, 1)]
    if not quick:
        matrix.append(("1.0 MS/s NFM", 1_000_000.0, 8.0, 1))
        matrix.append(("8.0 MS/s NFM", 8_000_000.0, 8.0, 1))
        # 5 channels ride one shared channelizer pass (batched output axis)
        matrix.append(("5-channel 2.5 MS/s NFM", 2_500_000.0, 10.0, 5))
    out = []
    for label, rate, secs, channels in matrix:
        results: dict = {}
        run_benchmark(
            seconds=1.0 if quick else (secs or 30.0),
            sample_rate=rate,
            freq_offset=25_000.0,
            center_freq=None,
            target_freq=None,
            base_kwargs=None,
            results_out=results,
            channels=channels,
        )
        results["label"] = label
        out.append(results)
        print(f"[bench] {label}: {results.get('realtime_factor', '?')}x")
    return out


# --------------------------------------------------------------------------
# report
# --------------------------------------------------------------------------


def _stats_cell(stats: dict | None) -> str:
    if not stats:
        return "—"
    return (
        f"rms {stats['rms_dbfs']:.1f} dBFS, peak {stats['peak_dbfs']:.1f} dBFS, "
        f"dc {stats['dc_offset']:+.4f}, clip {stats['clipped_pct']:.2f}%, "
        f"zc {stats['zero_cross_hz']:.0f} Hz"
    )


def write_report(pytest_res, e2e_res, fixture_res, bench_res) -> Path:
    REPORT_DIR.mkdir(exist_ok=True)
    rows = "".join(
        f"<tr><td>{r['mode']}</td><td>{r['elapsed']:.2f}s</td>"
        f"<td>{r['realtime']:.1f}x (loop {r.get('loop_realtime', 0):.1f}x)</td>"
        f"<td>{r['peak_dbfs']:.1f} dBFS</td>"
        f"<td>{_stats_cell(r.get('stats'))}</td>"
        f"<td>{' '.join(f'<a href=e2e/{html.escape(a)}>{html.escape(a)}</a>' for a in r['artifacts'])}</td></tr>"
        for r in e2e_res
    )
    logs = "".join(
        f"<details><summary>{r['mode']} run log</summary><pre>{html.escape(r['log'])}</pre></details>"
        for r in e2e_res
        if r.get("log")
    )
    if fixture_res:
        fx_rows = "".join(
            (
                f"<tr><td>{html.escape(r['file'])}</td><td>{r['mode']}</td>"
                + (
                    f"<td colspan=3>ERROR: {html.escape(r['error'])}</td></tr>"
                    if "error" in r
                    else f"<td>{r['elapsed']:.2f}s</td><td>{_stats_cell(r.get('stats'))}</td>"
                    f"<td>{'OK' if r.get('checks_ok') else ('—' if r.get('checks_ok') is None else 'FAIL')}</td></tr>"
                )
            )
            for r in fixture_res
        )
        fixtures_html = (
            "<h2>Real-capture fixtures</h2>"
            "<table><tr><th>file</th><th>mode</th><th>elapsed</th><th>stats</th><th>checks</th></tr>"
            f"{fx_rows}</table>"
        )
    else:
        fixtures_html = (
            "<h2>Real-capture fixtures</h2><p>No fixtures present "
            f"(populate {html.escape(str(FIXTURE_DIR))} + fixtures.json).</p>"
        )
    bench_html = "".join(
        f"<h3>{html.escape(b.get('label', 'benchmark'))}</h3>"
        f"<pre>{html.escape(json.dumps({k: v for k, v in b.items() if k != 'label'}, indent=2, default=str))}</pre>"
        for b in bench_res
    )
    doc = f"""<!doctype html><html><head><meta charset=utf-8>
<title>iq-to-audio-tpu comprehensive test report</title>
<style>body{{font-family:sans-serif;margin:2em}}table{{border-collapse:collapse}}
td,th{{border:1px solid #999;padding:4px 10px}}pre{{background:#f4f4f4;padding:1em}}</style>
</head><body>
<h1>iq-to-audio-tpu comprehensive test report</h1>
<p>platform: {html.escape(jax.default_backend())} · generated {time.strftime("%Y-%m-%d %H:%M:%S")}</p>
<h2>pytest suite</h2>
<p>{"PASSED" if pytest_res["ok"] else "FAILED"} in {pytest_res["seconds"]:.1f}s</p>
<pre>{html.escape(pytest_res["tail"])}</pre>
<h2>End-to-end demodulation</h2>
<table><tr><th>mode</th><th>elapsed (incl. compile)</th><th>realtime</th><th>peak</th><th>audio stats</th><th>artifacts</th></tr>
{rows}</table>
{logs}
{fixtures_html}
<h2>Benchmark matrix</h2>
{bench_html}
</body></html>"""
    out = REPORT_DIR / "report.html"
    out.write_text(doc)
    (REPORT_DIR / "report.json").write_text(
        json.dumps(
            {
                "pytest": pytest_res,
                "e2e": e2e_res,
                "fixtures": fixture_res,
                "bench": bench_res,
            },
            indent=2,
            default=str,
        )
    )
    return out


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip-pytest", action="store_true")
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()

    pytest_res = {"ok": True, "seconds": 0.0, "tail": "(skipped)"}
    if not args.skip_pytest:
        print("[1/4] pytest suite…")
        pytest_res = run_pytest()
        print(f"      {'OK' if pytest_res['ok'] else 'FAILED'} in {pytest_res['seconds']:.0f}s")
    print("[2/4] end-to-end demodulation…")
    e2e_res = run_e2e(args.quick)
    print("[3/4] real-capture fixtures…")
    fixture_res = run_fixtures(args.quick)
    print("[4/4] benchmark matrix…")
    bench_res = run_benchmarks(args.quick)
    report = write_report(pytest_res, e2e_res, fixture_res, bench_res)
    print(f"report: {report}")
    # nonzero on ANY failure: the nightly runs this without `|| true`, so
    # a fixture-matrix regression must fail the workflow, not just tint
    # the HTML report (e2e failures raise out of run_e2e and already
    # exit nonzero via the traceback)
    fixture_failures = [r for r in fixture_res if "error" in r]
    if fixture_failures:
        print(f"{len(fixture_failures)} fixture(s) FAILED")
    return 0 if pytest_res["ok"] and not fixture_failures else 1


if __name__ == "__main__":
    sys.exit(main())
