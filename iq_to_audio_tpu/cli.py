"""Command-line front end.

Flag-for-flag capability match with the reference CLI (reference
``cli.py:151-412``; flag list README.md:63-91): ``--in/--ft/--bw/--fc/
--fs-ch/--demod/--deemph/--no-agc/--out/--dump-iq/--plot-stages/--chunk/
--fft-workers/--filter-block/--iq-order/--input-format/--input-sample-rate/
--mix-sign/--probe-only/--interactive/--interactive-seconds/--preview/
--benchmark*/--cli/--audio-post*/--verbose/--version`` plus the ``digital``
subcommand.

TPU-native difference: multiple ``--ft`` targets are batched through ONE
pipeline run (shared channelizer pass, leading channel axis) instead of the
reference's sequential per-target loop (reference ``cli.py:683-710``).
"""

from __future__ import annotations

import argparse
import logging
import math
import os
import sys
from pathlib import Path

# Honor an explicit JAX_PLATFORMS from the user's environment.  Some hosts
# register an accelerator plugin from sitecustomize and programmatically pin
# the platform, which silently outranks the env var; re-asserting it through
# jax.config (before any backend initialisation) restores the documented env
# semantics — e.g. `JAX_PLATFORMS=cpu iq-to-audio ...` really runs on CPU.
if os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from . import __version__
from .io.formats import parse_user_format
from .pipeline.benchmark import run_benchmark
from .pipeline.config import ProcessingConfig
from .pipeline.pipeline import ProcessingCancelled, ProcessingPipeline, ProcessingResult
from .pipeline.preview import run_preview
from .pipeline.progress import TqdmProgressSink
from .post.digital import DEFAULT_DECODER_KEY, DIGITAL_DECODERS, get_decoder
from .post.squelch import (
    AudioPostOptions,
    SquelchConfig,
    gather_audio_targets,
    process_audio_batch,
)

LOG = logging.getLogger("iq_to_audio_tpu")


def positive_float(value: str) -> float:
    """argparse type: a strictly positive float."""
    try:
        parsed = float(value)
    except ValueError as exc:
        raise argparse.ArgumentTypeError(str(exc)) from exc
    if parsed <= 0:
        raise argparse.ArgumentTypeError("Expected a positive value.")
    return parsed


def _die(what: str, exc: Exception, verbose: bool) -> int:
    """Uniform failure exit used by every CLI mode: one ERROR line, full
    traceback only under ``--verbose``.  Must be called from inside the
    ``except`` block so ``LOG.exception`` sees the active exception."""
    LOG.error("%s: %s", what, exc)
    if verbose:
        LOG.exception("%s — debug traceback", what)
    return 1


DIGITAL_DECODER_KEYS: tuple[str, ...] = tuple(d.key for d in DIGITAL_DECODERS)


def _add_digital_subcommand(parser: argparse.ArgumentParser) -> None:
    sub = parser.add_subparsers(dest="subcommand", metavar="command")
    digital = sub.add_parser(
        "digital",
        help="Run a digital decoder inside the backend container.",
        description=(
            "Bind-mounts a directory of exported audio into the "
            "iq-to-audio backend container and runs a decoder preset "
            "(e.g. DSD-FME), or an explicit command, over it."
        ),
    )
    digital.add_argument(
        "--audio-dir", type=Path, required=True,
        help="Directory of exported audio to mount inside the container.",
    )
    digital.add_argument(
        "--decoder", choices=DIGITAL_DECODER_KEYS, default=DEFAULT_DECODER_KEY,
        help="Decoder preset to run (default: %(default)s).",
    )
    digital.add_argument(
        "--image", default=None,
        help="Override the backend Docker image.",
    )
    digital.add_argument(
        "--no-pull", dest="pull", action="store_false", default=True,
        help="Never pull the backend image; fail if it is missing locally.",
    )
    digital.add_argument(
        "decoder_args", nargs=argparse.REMAINDER,
        help="Explicit container command (prefix with -- to pass flags).",
    )


def _digital_command_tokens(args: argparse.Namespace) -> tuple[str, ...]:
    """The container command: an explicit trailing command wins, otherwise
    the selected preset's default.  Raises ValueError on unusable input."""
    tokens = list(getattr(args, "decoder_args", None) or [])
    if tokens[:1] == ["--"]:
        tokens = tokens[1:]
    if tokens:
        return tuple(tokens)
    try:
        preset = get_decoder(args.decoder)
    except KeyError as exc:
        raise ValueError(f"Unsupported decoder preset: {args.decoder}") from exc
    if not preset.default_command:
        raise ValueError("No command specified for backend container.")
    return preset.default_command


def _existing_dir(path: Path) -> Path:
    if not path.exists():
        raise ValueError(f"Audio directory does not exist: {path}")
    if not path.is_dir():
        raise ValueError(f"Audio path is not a directory: {path}")
    return path


def run_digital_command(args: argparse.Namespace) -> int:
    """``iq-to-audio digital …``: one linear flow, every user error funneled
    through ValueError/DockerBackendError into a single exit path."""
    from .post import docker_backend as db

    try:
        command = _digital_command_tokens(args)
        launch = db.DockerLaunchRequest(
            command=command,
            audio_dir=_existing_dir(args.audio_dir),
            decoder_key=args.decoder,
            pull_if_missing=bool(args.pull),
        )
        backend = db.DockerBackend(
            config=db.DockerBackendConfig(image=args.image or db.DEFAULT_IMAGE)
        )
        backend.ensure_connection()
        LOG.info("Backend decoder '%s': %s", args.decoder, " ".join(command))
        backend.run_and_stream(
            launch, log_callback=lambda text: print(text, end="", flush=True)
        )
    except (ValueError, db.DockerBackendError) as exc:
        LOG.error("%s", exc)
        return 1
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description=(
            "Extract and demodulate narrowband channels from SDR baseband "
            "recordings (TPU-native JAX engine)."
        ),
    )
    parser.add_argument("--in", dest="input_path", required=False, type=Path,
                        action="append", default=None,
                        help="Input SDR++ baseband WAV file. Supply multiple "
                             "times to process several captures; same-geometry "
                             "captures batch data-parallel over the device mesh.")
    parser.add_argument("--ft", dest="target_freqs", type=positive_float, action="append",
                        default=None,
                        help="Target RF frequency in Hz. Supply up to five times to batch additional channels.")
    parser.add_argument("--bw", dest="bandwidth", type=positive_float, default=12_500.0,
                        help="Channel bandwidth in Hz (default: 12500).")
    parser.add_argument("--fc", dest="center_freq", type=positive_float,
                        help="Override center frequency in Hz if filename parsing fails.")
    parser.add_argument("--fs-ch", dest="fs_ch", type=positive_float, default=96_000.0,
                        help="Desired complex channel sample rate prior to demod (default: 96 kHz).")
    parser.add_argument("--demod", dest="demod",
                        choices=["nfm", "am", "usb", "lsb", "ssb", "none"], default="nfm",
                        help="Demodulator (nfm, am, usb, lsb, ssb=alias for usb, none=no demodulation). Default: nfm.")
    parser.add_argument("--deemph", dest="deemph_us", type=positive_float, default=300.0,
                        help="FM de-emphasis time constant in microseconds (default: 300).")
    parser.add_argument("--no-agc", dest="agc_enabled", action="store_false",
                        help="Disable automatic gain control in supported demodulators.")
    parser.add_argument("--out", dest="output_path", type=Path,
                        help="Output WAV path. Defaults to audio_<FT>_48k.wav alongside input.")
    parser.add_argument("--dump-iq", dest="dump_iq", type=Path,
                        help="Optional path to write channelized complex float32 IQ (cf32).")
    parser.add_argument("--plot-stages", dest="plot_stages", type=Path,
                        help="Save PSD plots for major pipeline stages to the given PNG path.")
    parser.add_argument("--spectrum-png", dest="spectrum_png", type=Path,
                        help="Render the capture's averaged PSD + waterfall to this PNG "
                             "(headless analogue of the GUI snapshot; usable without --ft).")
    parser.add_argument("--spectrum-seconds", dest="spectrum_seconds",
                        type=positive_float, default=4.0,
                        help="Seconds of IQ streamed into --spectrum-png (default: 4.0).")
    parser.add_argument("--chunk", dest="chunk_size", type=int, default=1_048_576,
                        help="Complex samples per processing chunk (default: 1,048,576).")
    parser.add_argument("--fft-workers", dest="fft_workers", type=int,
                        help="Accepted for compatibility; XLA owns FFT parallelism on TPU.")
    parser.add_argument("--filter-block", dest="filter_block", type=int, default=65_536,
                        help="FFT block size hint for the overlap-save channel filter (default: 65536).")
    parser.add_argument("--strict-filter-block", dest="auto_filter_block", action="store_false",
                        help="Honor --filter-block verbatim instead of auto-optimizing the FFT size.")
    parser.add_argument("--iq-order", dest="iq_order",
                        choices=["iq", "qi", "iq_inv", "qi_inv"], default="iq",
                        help="Interpretation of the stereo channels: iq (default), qi, iq_inv, qi_inv.")
    parser.add_argument("--input-format", dest="input_format", type=str,
                        help="Override input encoding (wav-s16, wav-u8, wav-f32, raw-cu8, raw-cs16, raw-cf32).")
    parser.add_argument("--input-sample-rate", dest="input_sample_rate", type=positive_float,
                        help="Manual input sample rate in Hz (used when headers are missing).")
    parser.add_argument("--mix-sign", dest="mix_sign", type=int, choices=[-1, 1],
                        help="Override automatic mixer sign selection.")
    parser.add_argument("--probe-only", dest="probe_only", action="store_true",
                        help="Probe metadata and exit without demodulating.")
    parser.add_argument("--interactive", dest="interactive", action="store_true",
                        help="Launch interactive spectrum viewer to pick frequency/bandwidth.")
    parser.add_argument("--interactive-seconds", dest="interactive_seconds",
                        type=positive_float, default=2.0,
                        help="Duration of IQ snapshot (seconds) for interactive mode (default: 2.0).")
    parser.add_argument("--preview", dest="preview_seconds", type=positive_float,
                        help="Preview only the first SECONDS of the recording and exit.")
    parser.add_argument("--benchmark", dest="benchmark", action="store_true",
                        help="Run a synthetic throughput benchmark and exit.")
    parser.add_argument("--benchmark-seconds", dest="benchmark_seconds",
                        type=positive_float, default=5.0,
                        help="Duration of synthetic capture in seconds when benchmarking (default: 5).")
    parser.add_argument("--benchmark-sample-rate", dest="benchmark_sample_rate",
                        type=positive_float, default=2_500_000.0,
                        help="Sample rate in Hz for synthetic benchmark captures (default: 2.5e6).")
    parser.add_argument("--benchmark-offset", dest="benchmark_offset", type=float,
                        default=25_000.0,
                        help="Frequency offset (Hz) between center and target for benchmark tone (default: 25 kHz).")
    parser.add_argument("--benchmark-channels", dest="benchmark_channels", type=int,
                        default=1, choices=range(1, 6), metavar="N",
                        help="Batch N channels through the shared channelizer pass when benchmarking (default: 1).")
    parser.add_argument("--cli", dest="cli", action="store_true",
                        help="Run in CLI mode (default launches the interactive GUI when available).")
    parser.add_argument("--audio-post", dest="audio_post_path", type=Path,
                        help="Apply audio post-processing (auto squelch) to the given file or directory.")
    parser.add_argument("--audio-post-mode", dest="audio_post_mode",
                        choices=["adaptive", "static", "transient"], default="adaptive",
                        help="Squelch algorithm to use when --audio-post is supplied (default: adaptive).")
    parser.add_argument("--audio-post-noise-floor", dest="audio_post_noise_floor", type=float,
                        help="Manual noise floor in dBFS for --audio-post (auto-detected by default).")
    parser.add_argument("--audio-post-noise-percentile", dest="audio_post_percentile",
                        type=float, default=0.2,
                        help="Percentile used for auto noise floor estimation (default: 0.2).")
    parser.add_argument("--audio-post-threshold", dest="audio_post_threshold", type=float,
                        default=6.0,
                        help="Margin above noise floor in dBFS for the squelch threshold (default: 6).")
    parser.add_argument("--audio-post-lead", dest="audio_post_lead", type=float, default=0.15,
                        help="Lead-in seconds retained when trimming silence (default: 0.15).")
    parser.add_argument("--audio-post-trail", dest="audio_post_trail", type=float, default=0.35,
                        help="Trailing seconds retained when trimming silence (default: 0.35).")
    parser.add_argument("--audio-post-no-trim", dest="audio_post_trim", action="store_false",
                        help="Disable silence trimming when performing --audio-post.")
    parser.add_argument("--audio-post-overwrite", dest="audio_post_overwrite",
                        action="store_true",
                        help="Overwrite original files when performing --audio-post.")
    parser.add_argument("--audio-post-suffix", dest="audio_post_suffix", default="-cleaned",
                        help="Suffix to append when writing cleaned copies (default: -cleaned).")
    parser.add_argument("--audio-post-stream-mb", dest="audio_post_stream_mb",
                        type=positive_float, default=None,
                        help="WAVs with more data than this many MiB are squelched by the "
                             "bounded-memory streaming engine (byte-identical output; default "
                             "256 MiB, or $IQ2A_POST_BLOCK_BYTES).")
    parser.add_argument("--profile-dir", dest="profile_dir", type=Path,
                        help="Write a jax.profiler (xprof) trace of the chunk loop to this directory.")
    parser.add_argument("--checkpoint-secs", dest="checkpoint_secs", type=positive_float,
                        help="Checkpoint the stream state every N seconds of input for --resume.")
    parser.add_argument("--resume", dest="resume", action="store_true",
                        help="Resume an interrupted run from its checkpoint (requires --checkpoint-secs on the original run).")
    parser.add_argument("--burst-segments", dest="burst_segments", type=int, default=0,
                        help="Burst mode: split the capture into N frame-aligned segments processed "
                             "concurrently by the device stream and host-CPU workers, then splice "
                             "the audio (see docs/performance.md; 0 = off).")
    parser.add_argument("--burst-cpu-workers", dest="burst_cpu_workers", type=int, default=1,
                        help="Host-CPU worker subprocesses for --burst-segments (0 = device stream only).")
    parser.add_argument("--seq-parallel", dest="seq_parallel",
                        choices=["auto", "on", "off"], default="auto",
                        help="Shard ONE capture across the whole device mesh "
                             "(sequence parallelism: ppermute halos + distributed "
                             "scans). auto = engage when >1 device is visible and "
                             "the run is a plain demod; on = force (error if the "
                             "config cannot shard); off = never. Default: auto.")
    parser.add_argument("--verbose", dest="verbose", action="store_true",
                        help="Enable debug logging.")
    parser.add_argument("--version", action="version", version=__version__,
                        help="Print the version and exit.")
    parser.set_defaults(agc_enabled=True)
    parser.set_defaults(audio_post_trim=True)
    parser.set_defaults(auto_filter_block=True)
    _add_digital_subcommand(parser)
    return parser


# --audio-post-* flag -> SquelchConfig field plumbing, declaratively
_SQUELCH_FLAG_FIELDS = {
    "method": "audio_post_mode",
    "manual_noise_floor_db": "audio_post_noise_floor",
    "noise_floor_percentile": "audio_post_percentile",
    "threshold_margin_db": "audio_post_threshold",
    "trim_silence": "audio_post_trim",
    "trim_lead_seconds": "audio_post_lead",
    "trim_trail_seconds": "audio_post_trail",
}


def _post_options(args: argparse.Namespace) -> AudioPostOptions:
    fields = {dst: getattr(args, src) for dst, src in _SQUELCH_FLAG_FIELDS.items()}
    fields["auto_noise_floor"] = args.audio_post_noise_floor is None
    return AudioPostOptions(
        config=SquelchConfig(**fields),
        overwrite=args.audio_post_overwrite,
        cleaned_suffix=args.audio_post_suffix,
        stream_threshold_bytes=(
            int(args.audio_post_stream_mb * 1024 * 1024)
            if args.audio_post_stream_mb is not None else None
        ),
    )


def _run_audio_post(args: argparse.Namespace) -> int:
    post_options = _post_options(args)
    try:
        post_targets = gather_audio_targets(args.audio_post_path, post_options)
    except Exception as exc:
        return _die("Unable to enumerate audio targets", exc, args.verbose)
    if not post_targets:
        LOG.error("No audio files found at %s.", args.audio_post_path)
        return 1
    naming = (
        "overwrite"
        if post_options.overwrite
        else f"suffix '{post_options.cleaned_suffix}'"
    )
    LOG.info(
        "Audio post-processing %d file(s) via %s squelch (%s).",
        len(post_targets),
        post_options.config.method,
        naming,
    )

    def _progress(completed: int, total: int, current: Path) -> None:
        if total > 0:
            pct = 100.0 * min(max(completed, 0), total) / total
            LOG.info(" [%6.2f%%] %s", pct, current)
        else:
            LOG.info("Processing %s", current)

    summary = process_audio_batch(post_targets, post_options, progress_cb=_progress)
    for item in summary.results:
        LOG.info(
            "%s -> %s | %.2fs -> %.2fs | %.1f%% retained | floor %.1f dB "
            "| threshold %.1f dB",
            item.input_path, item.output_path, item.duration_in,
            item.duration_out, item.retained_ratio * 100.0,
            item.noise_floor_db, item.threshold_db,
        )
    if summary.errors:
        LOG.error("Audio post-processing failed on %d file(s).", summary.failed)
        for path, error in summary.errors:
            LOG.error(" - %s: %s", path, error)
        return 1
    LOG.info(
        "Audio post-processing complete: delta-size %+d bytes, delta-duration %+0.2f s.",
        summary.aggregate_size_delta(),
        summary.aggregate_duration_delta(),
    )
    return 0


def _render_capture_spectrum(
    args: argparse.Namespace,
    input_fmt: tuple[str | None, str | None, str | None],
) -> None:
    """``--spectrum-png``: stream a snapshot of the capture into a PSD +
    waterfall PNG.  Headless analogue of the GUI snapshot page — the
    reference renders waterfalls only inside its Qt GUI (reference
    ``interactive/workers.py:36-161``)."""
    from .analysis.visualize import save_capture_spectrum
    from .io.formats import resolve_input_format
    from .io.probe import probe_sample_rate
    from .utils.freq import detect_center_frequency

    codec, container, _src = input_fmt
    spec, _source = resolve_input_format(
        args.input_path, requested=codec, container_hint=container
    )
    if args.input_sample_rate is not None:
        sample_rate = float(args.input_sample_rate)
    elif spec.requires_sample_rate:
        raise ValueError(
            "Raw captures need --input-sample-rate for --spectrum-png."
        )
    else:
        sample_rate = probe_sample_rate(args.input_path).value
    center = args.center_freq
    if center is None:
        center = detect_center_frequency(args.input_path).value
    out = save_capture_spectrum(
        args.input_path,
        args.spectrum_png,
        spec=spec,
        sample_rate=sample_rate,
        seconds=args.spectrum_seconds,
        center_freq=center,
        iq_order=args.iq_order,
    )
    LOG.info("Capture spectrum written to %s", out)


def main(argv: list[str] | None = None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)

    if getattr(args, "subcommand", None) == "digital":
        logging.basicConfig(
            level=logging.DEBUG if getattr(args, "verbose", False) else logging.INFO,
            format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        )
        return run_digital_command(args)

    if args.cli and args.interactive:
        parser.error("--cli cannot be combined with --interactive.")
    if args.audio_post_path and args.interactive:
        parser.error("--audio-post cannot be combined with --interactive.")
    if args.audio_post_path and args.benchmark:
        parser.error("--audio-post cannot be combined with --benchmark.")
    if args.audio_post_path and not 0.0 <= args.audio_post_percentile <= 1.0:
        parser.error("--audio-post-noise-percentile must be between 0.0 and 1.0.")
    if args.benchmark and args.interactive:
        parser.error("--benchmark cannot be combined with --interactive.")

    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )

    if args.audio_post_path:
        return _run_audio_post(args)

    frequencies: list[float] = list(args.target_freqs or [])

    # normalise the (repeatable) --in flag: keep the list for the
    # multi-capture path, expose the primary path everywhere else
    args.input_paths = list(args.input_path or [])
    args.input_path = args.input_paths[0] if args.input_paths else None

    # (codec, container, source) from an explicit --input-format override
    input_fmt: tuple[str | None, str | None, str | None] = (None, None, None)
    if args.input_format:
        try:
            container, codec = parse_user_format(args.input_format, default_container=None)
        except ValueError as exc:
            parser.error(f"--input-format: {exc}")
        input_fmt = (codec, container, "cli")

    if len(frequencies) > 5:
        parser.error("At most five target frequencies are supported per run.")
    for n, freq in enumerate(frequencies):
        if any(
            math.isclose(freq, prior, rel_tol=0.0, abs_tol=0.5)
            for prior in frequencies[:n]
        ):
            parser.error("Duplicate target frequencies are not allowed.")

    # flags whose dest already IS the ProcessingConfig field name pass
    # straight through; everything renamed or derived is listed explicitly
    shared_kwargs = {
        name: getattr(args, name)
        for name in (
            "bandwidth",
            "center_freq",
            "deemph_us",
            "agc_enabled",
            "chunk_size",
            "filter_block",
            "auto_filter_block",
            "iq_order",
            "probe_only",
            "fft_workers",
            "input_sample_rate",
            "profile_dir",
            "checkpoint_secs",
            "resume",
        )
    }
    shared_kwargs |= {
        "center_freq_source": "cli" if args.center_freq is not None else None,
        "demod_mode": args.demod,
        "fs_ch_target": args.fs_ch,
        "mix_sign_override": args.mix_sign,
        "input_format": input_fmt[0],
        "input_container": input_fmt[1],
        "input_format_source": input_fmt[2],
    }
    base_kwargs = {
        **shared_kwargs,
        "target_freq": frequencies[0] if frequencies else 0.0,
        "target_freqs": list(frequencies),
        "output_path": args.output_path,
        "dump_iq_path": args.dump_iq,
        "plot_stages_path": args.plot_stages,
    }

    if args.benchmark:
        bench_kwargs = {k: v for k, v in base_kwargs.items() if k != "target_freqs"}
        try:
            return run_benchmark(
                seconds=args.benchmark_seconds,
                sample_rate=args.benchmark_sample_rate,
                freq_offset=args.benchmark_offset,
                center_freq=args.center_freq,
                target_freq=frequencies[0] if frequencies else None,
                base_kwargs=bench_kwargs,
                channels=args.benchmark_channels,
            )
        except Exception as exc:
            return _die("Benchmark failed", exc, args.verbose)

    progress_sink = None
    configs: list[ProcessingConfig] = []
    launch_gui = args.interactive or (not args.cli and not args.benchmark)

    if launch_gui:
        try:
            from .interactive.app import launch_interactive_session
        except ImportError as exc:
            if args.interactive:
                LOG.error("Interactive mode unavailable: %s", exc)
                return 1
            LOG.info("Interactive GUI unavailable (%s); falling back to CLI mode.", exc)
            launch_gui = False
        else:
            try:
                session = launch_interactive_session(
                    input_path=args.input_path,
                    base_kwargs=base_kwargs,
                    snapshot_seconds=args.interactive_seconds,
                )
                configs = list(session.configs)
                progress_sink = session.progress_sink
                if getattr(session, "burst_segments", 0) and not args.burst_segments:
                    # the GUI's Channel-panel burst setting applies unless
                    # the command line already pinned one
                    args.burst_segments = session.burst_segments
            except KeyboardInterrupt:
                LOG.info("Interactive session cancelled.")
                return 0
            except Exception as exc:
                return _die("Interactive session failed", exc, args.verbose)

    if not launch_gui:
        if args.input_path is None:
            parser.error("--in is required in CLI mode.")
        if not frequencies and not args.probe_only and not args.spectrum_png:
            parser.error("Provide at least one --ft target frequency in CLI mode.")

    if args.spectrum_png and not launch_gui:
        try:
            _render_capture_spectrum(args, input_fmt)
        except Exception as exc:
            return _die("Spectrum rendering failed", exc, args.verbose)
        if not frequencies and not args.probe_only:
            return 0  # spectrum-only invocation

    if args.preview_seconds is not None:
        if launch_gui:
            LOG.warning(
                "--preview is ignored in interactive mode; use the GUI preview button instead."
            )
        else:
            config = _build_batched_config(args, frequencies, shared_kwargs)
            LOG.info(
                "=== Previewing %d target(s): %s ===",
                max(1, len(frequencies)),
                "/".join(f"{f:.0f}" for f in frequencies) or "(center)",
            )
            try:
                sink = _make_sink()
                _, preview_path = run_preview(config, args.preview_seconds, progress_sink=sink)
            except ProcessingCancelled:
                LOG.info("Preview cancelled by user.")
                return 0
            except Exception as exc:
                return _die("Preview failed", exc, args.verbose)
            LOG.info("Preview written to %s", preview_path)
            return 0

    if not launch_gui:
        if len(args.input_paths) > 1:
            return _run_multi_capture(args, frequencies, shared_kwargs, _make_sink)
        sp_rc = _maybe_run_seq_parallel(args, frequencies, shared_kwargs)
        if sp_rc is not None:
            return sp_rc
        configs = [_build_batched_config(args, frequencies, shared_kwargs)]

    if not configs:
        LOG.info("No target frequencies to process.")
        return 0

    hetero_ex = None
    if args.burst_segments and args.burst_segments > 1:
        from .pipeline.hetero import HeteroExecutor

        hetero_ex = HeteroExecutor(
            cpu_workers=max(0, args.burst_cpu_workers),
            n_segments=args.burst_segments,
        )

    results: list[tuple[ProcessingConfig, ProcessingResult]] = []
    try:
        for index, config in enumerate(configs, start=1):
            freq_list = [f for f in config.all_target_freqs() if f > 0]
            LOG.info(
                "=== Processing %d target(s): %s (%d/%d) ===",
                max(1, len(freq_list)),
                "/".join(f"{f:.0f}" for f in freq_list) or "(probe)",
                index,
                len(configs),
            )
            use_session_sink = (
                index == 1
                and progress_sink is not None
                and getattr(progress_sink, "is_live", True)
            )
            sink = progress_sink if use_session_sink else _make_sink()
            try:
                if hetero_ex is not None:
                    result = hetero_ex.run(config, progress_sink=sink)
                    assert result is not None  # not a warm-only pass
                else:
                    result = ProcessingPipeline(config).run(progress_sink=sink)
            except ProcessingCancelled:
                LOG.info("Processing cancelled by user.")
                return 0
            except Exception as exc:
                return _die("Processing failed", exc, args.verbose)
            results.append((config, result))
    finally:
        if hetero_ex is not None:
            hetero_ex.close()

    if args.probe_only:
        for config, result in results:
            info = result.sample_rate_probe
            tag = int(round(result.target_freq))
            print(
                f"[{tag}] Sample rate: {info.value:.2f} Hz "
                f"(header={info.header}, wave={info.wave}, override={info.override})"
            )
            print(
                f"[{tag}] Center frequency: {result.center_freq:.0f} Hz, "
                f"target: {result.target_freq:.0f} Hz, offset: {result.freq_offset:.0f} Hz"
            )
            print(
                f"[{tag}] Channel decimation: {result.decimation} "
                f"-> {result.fs_channel:.2f} Hz, mixer sign {result.mix_sign}"
            )
    else:
        for config, result in results:
            freq_list = [f for f in config.all_target_freqs() if f > 0]
            mode = (config.demod_mode or "").lower()
            for freq, peak in zip(freq_list, result.audio_peaks or [result.audio_peak]):
                if peak > 0:
                    peak_db = 20.0 * math.log10(peak)
                    if mode == "none":
                        print(f"[{int(round(freq))}] IQ slice peak magnitude: {peak_db:.2f} dBFS")
                    else:
                        print(f"[{int(round(freq))}] Audio peak level: {peak_db:.2f} dBFS")

    return 0


def _make_sink():
    try:
        return TqdmProgressSink()
    except RuntimeError as exc:
        LOG.warning("Progress reporting disabled: %s", exc)
        return None


def _maybe_run_seq_parallel(
    args: argparse.Namespace,
    frequencies: list[float],
    shared_kwargs: dict,
) -> int | None:
    """Shard ONE capture over the whole device mesh (sequence parallelism).

    SURVEY §2d SP plan: "if sharding one capture across chips, carry
    boundary state via collective-permute" — :func:`..parallel.sharded.
    build_sharded_step` implements exactly that (ppermute halos for the
    FIR/discriminator, distributed first-order scans for the IIR/AGC
    carries), and :func:`..parallel.dp_runner.run_captures_dp` with a
    single job is the pure seq-over-devices instance (dp=1).  Engaged
    for plain demod runs when ``--seq-parallel`` is ``on``, or ``auto``
    with more than one visible device.  Returns an exit code, or None to
    fall back to the serial pipeline (the reference's single-stream
    behaviour, reference ``processing.py:341-345`` state carry).
    """
    if args.seq_parallel == "off":
        return None
    import jax

    n_dev = len(jax.devices())
    demod = "usb" if args.demod == "ssb" else args.demod  # documented alias
    burst = bool(args.burst_segments and args.burst_segments > 1)
    eligible = (
        bool(frequencies)
        and not burst  # an explicit burst request wins
        and not args.probe_only
        and args.preview_seconds is None
        and args.dump_iq is None
        and args.plot_stages is None
        and args.spectrum_png is None
        and not args.resume
        and not args.checkpoint_secs
        and getattr(args, "profile_dir", None) is None
        and demod in {"nfm", "am", "usb", "lsb"}
    )
    if args.seq_parallel == "auto" and n_dev < 2:
        return None
    if not eligible:
        if args.seq_parallel == "on":
            LOG.error(
                "--seq-parallel on: this run cannot shard (sequence "
                "parallelism supports plain nfm/am/usb/lsb demodulation "
                "without probe/preview/dump/stage/checkpoint/burst modes)."
            )
            return 1
        return None

    from .parallel.dp_runner import CaptureJob, run_captures_dp

    # serial-parity output naming: the same per-channel paths the serial
    # pipeline would write (shared --out hints get _<freq> suffixes when
    # batching; defaults are audio_<FT>_48k.wav beside the input)
    helper = ProcessingPipeline(
        _build_batched_config(args, frequencies, shared_kwargs)
    )
    paths = helper._channel_paths(list(frequencies), args.output_path)
    for p in paths:
        p.parent.mkdir(parents=True, exist_ok=True)
    job = CaptureJob(
        in_path=args.input_path,
        target_freqs=list(frequencies),
        output_paths=paths,
        center_freq=args.center_freq,
        input_format=args.input_format,
        input_sample_rate=args.input_sample_rate,
    )
    LOG.info(
        "=== Processing %d target(s): %s (sequence-parallel over %d "
        "device(s)) ===",
        len(frequencies),
        "/".join(f"{f:.0f}" for f in frequencies),
        n_dev,
    )
    try:
        res = run_captures_dp(
            [job],
            bandwidth=args.bandwidth,
            demod_mode=demod,
            fs_ch_target=args.fs_ch,
            deemph_us=args.deemph_us,
            agc_enabled=args.agc_enabled,
            iq_order=args.iq_order,
            mix_sign_override=args.mix_sign,
            progress_sink=_make_sink(),
        )
    except ProcessingCancelled:
        LOG.info("Processing cancelled by user.")
        return 0  # serial-path parity: cancel is a clean exit
    except ValueError as exc:
        if args.seq_parallel == "on":
            return _die("Sequence-parallel run failed", exc, args.verbose)
        LOG.info(
            "Sequence-parallel execution unavailable (%s); running the "
            "serial pipeline.", exc
        )
        return None
    except Exception as exc:
        return _die("Processing failed", exc, args.verbose)
    for freq, peak in zip(frequencies, res.audio_peaks[0]):
        if peak > 0:
            print(
                f"[{int(round(freq))}] Audio peak level: "
                f"{20.0 * math.log10(peak):.2f} dBFS"
            )
    return 0


def _run_multi_capture(
    args: argparse.Namespace,
    frequencies: list[float],
    shared_kwargs: dict,
    make_sink,
) -> int:
    """Process several ``--in`` captures.

    When the device mesh can host one capture per dp row and the run is a
    plain demod (no probe/preview/dump/stage/checkpoint modes), the captures
    batch through ONE sharded step (:mod:`..parallel.dp_runner`).  Anything
    else falls back to sequential pipeline runs — the reference's behaviour
    for all multi-input work (reference ``cli.py:683-710``).
    """
    import jax

    paths = args.input_paths
    # per-capture disambiguation tags: input stems, made unique when two
    # captures share a filename (day1/cap.wav + day2/cap.wav must not
    # silently write to the same output)
    tags: list[str] = []
    for i, p in enumerate(paths):
        tag = p.stem
        if sum(1 for q in paths if q.stem == tag) > 1:
            tag = f"{tag}{i + 1}"
        tags.append(tag)
    demod = "usb" if args.demod == "ssb" else args.demod  # documented alias
    n_dev = len(jax.devices())
    burst = bool(args.burst_segments and args.burst_segments > 1)
    dp_ok = (
        frequencies
        and not burst  # an explicit burst request wins over the dp mesh path
        and n_dev >= len(paths)
        and n_dev % len(paths) == 0
        and not args.probe_only
        and args.preview_seconds is None
        and args.dump_iq is None
        and args.plot_stages is None
        and not args.resume
        and not args.checkpoint_secs
        and demod in {"nfm", "am", "usb", "lsb"}
    )
    if dp_ok:
        from .parallel.dp_runner import CaptureJob, run_captures_dp

        def _outs(tag: str) -> list[Path]:
            if args.output_path is None:
                return []
            base = args.output_path
            return [base.with_name(f"{base.stem}_{tag}{base.suffix}")]

        jobs = [
            CaptureJob(
                in_path=p,
                target_freqs=list(frequencies),
                output_paths=_outs(tag),
                center_freq=args.center_freq,
                input_format=args.input_format,
                input_sample_rate=args.input_sample_rate,
            )
            for p, tag in zip(paths, tags)
        ]
        try:
            res = run_captures_dp(
                jobs,
                bandwidth=args.bandwidth,
                demod_mode=demod,
                fs_ch_target=args.fs_ch,
                deemph_us=args.deemph_us,
                agc_enabled=args.agc_enabled,
                iq_order=args.iq_order,
                mix_sign_override=args.mix_sign,
                progress_sink=make_sink(),
            )
        except ProcessingCancelled:
            LOG.info("Processing cancelled by user.")
            return 0
        except ValueError as exc:
            LOG.info(
                "Data-parallel multi-capture unavailable (%s); "
                "processing captures sequentially.", exc
            )
        else:
            for g, peaks in enumerate(res.audio_peaks):
                for k, peak in enumerate(peaks):
                    LOG.info(
                        "[%s @ %.0f] audio peak %.2f dBFS",
                        paths[g].name,
                        frequencies[k],
                        20.0 * math.log10(max(peak, 1e-9)),
                    )
            return 0

    rc = 0
    out_base = args.output_path
    dump_base = args.dump_iq
    plot_base = args.plot_stages
    hetero_ex = None
    if burst:
        # an explicit --burst-segments applies to EVERY capture in the
        # sequential loop (it used to be silently dropped with >1 --in)
        from .pipeline.hetero import HeteroExecutor

        hetero_ex = HeteroExecutor(
            cpu_workers=max(0, args.burst_cpu_workers),
            n_segments=args.burst_segments,
        )

    def _per_capture(base: Path | None, tag: str) -> Path | None:
        """Shared artifact hints get a per-capture suffix — every capture
        would otherwise overwrite the previous one's file."""
        if base is None:
            return None
        return base.with_name(f"{base.stem}_{tag}{base.suffix}")

    try:
        for p, tag in zip(paths, tags):
            args.input_path = p
            args.output_path = _per_capture(out_base, tag)
            args.dump_iq = _per_capture(dump_base, tag)
            args.plot_stages = _per_capture(plot_base, tag)
            config = _build_batched_config(args, frequencies, shared_kwargs)
            LOG.info("=== Processing capture %s ===", p)
            try:
                if hetero_ex is not None:
                    hetero_ex.run(config, progress_sink=make_sink())
                else:
                    ProcessingPipeline(config).run(progress_sink=make_sink())
            except ProcessingCancelled:
                LOG.info("Processing cancelled by user.")
                return 0
            except Exception as exc:
                rc = _die(f"Processing failed for {p}", exc, args.verbose)
    finally:
        if hetero_ex is not None:
            hetero_ex.close()
    return rc


def _build_batched_config(
    args: argparse.Namespace, frequencies: list[float], shared_kwargs: dict
) -> ProcessingConfig:
    """One config with all targets riding the batched channel axis."""
    return ProcessingConfig(
        in_path=args.input_path,
        target_freq=frequencies[0] if frequencies else 0.0,
        extra_target_freqs=list(frequencies[1:]),
        output_path=args.output_path,
        dump_iq_path=args.dump_iq,
        plot_stages_path=args.plot_stages,
        **shared_kwargs,
    )


if __name__ == "__main__":
    sys.exit(main())
