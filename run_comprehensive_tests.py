#!/usr/bin/env python
"""Comprehensive end-to-end test harness (reference
``run_comprehensive_tests.py``): runs the pytest suite, demodulates synthetic
captures end-to-end for every mode, renders waveform/spectrum/waterfall/stage
diagnostics, runs the benchmark matrix and emits an HTML report under
``testreports/``.

Usage: python run_comprehensive_tests.py [--skip-pytest] [--quick]
"""

from __future__ import annotations

import argparse
import html
import json
import os
import subprocess
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", os.environ.get("IQ2A_PLATFORM", "cpu"))

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

REPORT_DIR = REPO / "testreports"


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


def run_e2e(quick: bool) -> list[dict]:
    from conftest import make_am_iq, make_nfm_iq, make_tone_iq

    from iq_to_audio_tpu import ProcessingConfig, ProcessingPipeline
    from iq_to_audio_tpu.analysis.spectrum import compute_psd, streaming_waterfall
    from iq_to_audio_tpu.io.writer import read_wav, write_stereo_wav

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

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
        cfg = ProcessingConfig(
            in_path=cap,
            target_freq=center + offset,
            demod_mode=mode,
            output_path=out,
            plot_stages_path=plot if mode != "none" else None,
        )
        start = time.time()
        result = ProcessingPipeline(cfg).run()
        elapsed = time.time() - start
        entry = {
            "mode": mode,
            "elapsed": elapsed,
            "realtime": seconds / elapsed,
            "peak_dbfs": 20 * np.log10(max(result.audio_peak, 1e-6)),
            "artifacts": [],
        }
        if mode != "none":
            audio, rate = read_wav(out)
            entry["samples"] = int(audio.shape[0])
            entry["rms"] = float(np.sqrt(np.mean(audio[:, 0] ** 2)))
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
            entry["artifacts"].append(wf_png.name)
            if plot.exists():
                entry["artifacts"].append(plot.name)
        # input spectrum + waterfall diagnostic
        freqs, psd = compute_psd(iq[: 1 << 17], fs, nfft=1 << 15)
        _, _, waterfall, _ = streaming_waterfall(
            iter([iq]), fs, nfft=1 << 12, max_slices=120
        )
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 4))
        ax1.plot(freqs / 1e3, psd, lw=0.5)
        ax1.set_title(f"{mode} input PSD")
        ax2.imshow(waterfall.matrix, aspect="auto", cmap="viridis")
        ax2.set_title("waterfall")
        fig.tight_layout()
        spec_png = work / f"spectrum_{mode}.png"
        fig.savefig(spec_png, dpi=90)
        plt.close(fig)
        entry["artifacts"].append(spec_png.name)
        results.append(entry)
        print(f"[e2e] {mode}: {elapsed:.2f}s ({entry['realtime']:.1f}x realtime)")
    return results


def run_benchmarks(quick: bool) -> dict:
    from iq_to_audio_tpu.pipeline.benchmark import run_benchmark

    results = {}
    run_benchmark(
        seconds=1.0 if quick else 5.0,
        sample_rate=2_500_000.0,
        freq_offset=25_000.0,
        center_freq=None,
        target_freq=None,
        base_kwargs=None,
        results_out=results,
    )
    return results


def write_report(pytest_res, e2e_res, bench_res) -> Path:
    REPORT_DIR.mkdir(exist_ok=True)
    rows = "".join(
        f"<tr><td>{r['mode']}</td><td>{r['elapsed']:.2f}s</td>"
        f"<td>{r['realtime']:.1f}x</td><td>{r['peak_dbfs']:.1f} dBFS</td>"
        f"<td>{' '.join(f'<a href=e2e/{html.escape(a)}>{html.escape(a)}</a>' for a in r['artifacts'])}</td></tr>"
        for r in e2e_res
    )
    doc = f"""<!doctype html><html><head><meta charset=utf-8>
<title>iq-to-audio-tpu comprehensive test report</title>
<style>body{{font-family:sans-serif;margin:2em}}table{{border-collapse:collapse}}
td,th{{border:1px solid #999;padding:4px 10px}}pre{{background:#f4f4f4;padding:1em}}</style>
</head><body>
<h1>iq-to-audio-tpu comprehensive test report</h1>
<h2>pytest suite</h2>
<p>{"PASSED" if pytest_res["ok"] else "FAILED"} in {pytest_res["seconds"]:.1f}s</p>
<pre>{html.escape(pytest_res["tail"])}</pre>
<h2>End-to-end demodulation</h2>
<table><tr><th>mode</th><th>elapsed</th><th>realtime</th><th>peak</th><th>artifacts</th></tr>
{rows}</table>
<h2>Benchmark</h2>
<pre>{html.escape(json.dumps(bench_res, indent=2))}</pre>
</body></html>"""
    out = REPORT_DIR / "report.html"
    out.write_text(doc)
    return out


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip-pytest", action="store_true")
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()

    pytest_res = {"ok": True, "seconds": 0.0, "tail": "(skipped)"}
    if not args.skip_pytest:
        print("[1/3] pytest suite…")
        pytest_res = run_pytest()
        print(f"      {'OK' if pytest_res['ok'] else 'FAILED'} in {pytest_res['seconds']:.0f}s")
    print("[2/3] end-to-end demodulation…")
    e2e_res = run_e2e(args.quick)
    print("[3/3] benchmark…")
    bench_res = run_benchmarks(args.quick)
    report = write_report(pytest_res, e2e_res, bench_res)
    print(f"report: {report}")
    return 0 if pytest_res["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
