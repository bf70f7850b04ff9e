"""Streaming pipeline orchestrator.

Drives the jitted chunk step (:mod:`.step`) from a host loop with:

* superstep dispatch: S chunks scanned per device call with one batched
  upload (reads and uploads are synchronous-by-design — helper threads
  measurably degrade dispatch on high-latency runtimes),
* window-deferred output fetching: each accumulation window's D2H happens
  one window later, overlapped with compute,
* exact host-side sample bookkeeping (valid counts for the padded final
  chunk and the resampler come from Python-int mirrors, never device syncs),
* cooperative cancellation with partial-output cleanup, checkpoint/resume,
  progress phases, probe-only mode, preview limits, IQ dumping,
  pass-through slicing and stage snapshots — the full capability surface of
  the reference ``ProcessingPipeline`` (reference ``processing.py:682-1233``).

Up to five target frequencies are batched through one shared channelizer
pass (leading channel axis) instead of the reference's sequential per-target
runs (reference ``cli.py:683-710``).
"""

from __future__ import annotations

import contextlib
import dataclasses
import logging
import math
import os
import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from ..demod import DecoderStats, create_decoder
from ..io.formats import InputFormatSpec, resolve_input_format
from ..io.probe import SampleRateProbe, probe_sample_rate
from ..io.reader import IQReader, convert_to_complex
from ..io.writer import AudioWriter, IQDebugWriter, IQSliceWriter
from ..ops.ddc import DDCPlan, bandpass_kernel
from ..ops.nco import nco_increment_fixed
from ..ops.resample import ResamplePlan, design_resampler_kernel
from ..ref.chain import choose_mix_sign
from ..utils.freq import detect_center_frequency
from .config import ProcessingConfig
from .filters import compute_decimation, design_channel_filter, tune_chunk_size
from .progress import PhaseState, ProgressSink, ProgressTracker
from .step import build_chunk_step

LOG = logging.getLogger(__name__)

# bump when the carried state pytree layout changes (v2: raw-domain
# interleaved FIR tail, MXU block-IIR carries)
_CKPT_VERSION = 3  # v3: running pre-clip peak moved from accs into state

_OUTPUT_RATE = 48_000.0


@dataclass
class ProcessingResult:
    sample_rate_probe: SampleRateProbe
    center_freq: float
    target_freq: float
    freq_offset: float
    decimation: int
    fs_channel: float
    mix_sign: int
    audio_peak: float
    #: per-channel peaks when multiple targets were batched (channel 0 first)
    audio_peaks: list[float] = field(default_factory=list)
    #: per-channel audio RMS (reference surfaces this via DecoderStats)
    stats: list[DecoderStats] = field(default_factory=list)
    #: per-channel output paths actually written
    output_paths: list[Path] = field(default_factory=list)
    #: wall-clock seconds spent in the chunk loop (compile excluded)
    loop_seconds: float = 0.0
    #: complex input samples consumed
    input_samples: int = 0


class ProcessingCancelled(RuntimeError):  # noqa: N818 - parity with reference
    """Raised when processing is aborted early by user request."""


def _truncate_payload(path: Path, payload_bytes: int) -> None:
    """Truncate a WAV's data payload to ``payload_bytes`` (resume support)."""
    from ..io.riff import parse_wav_header

    path = Path(path)
    if not path.exists():
        return
    info = parse_wav_header(path)
    keep = min(payload_bytes, info.data_size)
    with path.open("r+b") as f:
        f.truncate(info.data_offset + keep)


class ProcessingPipeline:
    def __init__(self, config: ProcessingConfig):
        self.config = config
        self._cancelled = False
        self._input_spec: InputFormatSpec | None = None
        self._profiling = False
        # Benchmark warm-up mode: run the full pipeline (compiling and
        # dispatching every device program) but never fetch device->host.
        # On the tunneled runtime the connection's FIRST fetch blocks on a
        # minutes-scale session toll (docs/performance.md "Measured
        # status"), so bench.py pays that toll separately and uses this
        # fetch-free pass purely to compile/dispatch everything.  Outputs
        # are silent/empty in this mode — benchmark tooling only.
        self.warm_no_fetch = False

    def cancel(self) -> None:
        self._cancelled = True

    # -- helpers -----------------------------------------------------------

    def _is_pass_through_mode(self) -> bool:
        mode = (self.config.demod_mode or "").lower()
        return mode in {"none", "pass", "iq"}

    def _target_freqs(self) -> list[float]:
        freqs = [f for f in self.config.all_target_freqs() if f and f > 0]
        return freqs

    def _default_output_path(self, target_freq: float) -> Path:
        ft = int(target_freq)
        if self._is_pass_through_mode():
            spec = self._input_spec
            in_suffix = self.config.in_path.suffix
            wav_suffixes = {".wav", ".wave", ".wv", ".rf64"}
            if spec and spec.container == "wav":
                ext = in_suffix if in_suffix.lower() in wav_suffixes else ".wav"
            elif spec and spec.container == "raw":
                codec_ext = {
                    "pcm_u8": ".cu8",
                    "pcm_s16le": ".cs16",
                    "pcm_f32le": ".cf32",
                }.get(spec.codec, ".raw")
                ext = in_suffix or codec_ext
            else:
                ext = in_suffix or ".wav"
            return self.config.in_path.with_name(f"slice_{ft}{ext}")
        return self.config.in_path.with_name(f"audio_{ft}_48k.wav")

    @staticmethod
    def _annotate(base: Path, freq: float) -> Path:
        freq_tag = int(round(freq))
        return base.with_name(f"{base.stem}_{freq_tag}{base.suffix}")

    def _channel_paths(self, freqs: list[float], base: Path | None) -> list[Path]:
        """Per-channel output paths (mirrors reference cli annotate_path)."""
        paths: list[Path] = []
        extras = self.config.extra_output_paths
        multi = len(freqs) > 1
        for i, freq in enumerate(freqs):
            explicit = extras[i - 1] if i > 0 and i - 1 < len(extras) else None
            if explicit is not None:
                paths.append(explicit)  # per-channel override: verbatim
            elif base is not None:
                # shared --out hint: suffix with _<freq> when batching, like
                # the reference CLI (reference cli.py annotate_path)
                paths.append(self._annotate(base, freq) if multi else base)
            else:
                paths.append(self._default_output_path(freq))
        return paths

    # -- main entry ----------------------------------------------------------

    def run(self, progress_sink: ProgressSink | None = None) -> ProcessingResult:
        tracker = ProgressTracker(progress_sink)
        cfg = self.config
        if self._input_spec is None:
            spec, source = resolve_input_format(
                cfg.in_path, requested=cfg.input_format, container_hint=cfg.input_container
            )
            self._input_spec = spec
            if not cfg.input_format_source:
                cfg.input_format_source = source
            if not cfg.input_container:
                cfg.input_container = spec.container
            if not cfg.input_format:
                cfg.input_format = spec.codec
        input_spec = self._input_spec
        pass_through = self._is_pass_through_mode()

        output_paths: list[Path] = []
        cancel_logged = False
        last_status: str | None = None

        def _request_cancel() -> None:
            self._cancelled = True
            tracker.cancel()
            tracker.status("Cancelling…")

        def _check_cancel(stage: str = "") -> None:
            nonlocal cancel_logged
            if self._cancelled or tracker.cancelled:
                self._cancelled = True
                if not tracker.cancelled:
                    tracker.cancel()
                    tracker.status("Cancelling…")
                if not cancel_logged:
                    if stage:
                        LOG.info("Processing cancelled during %s.", stage)
                    else:
                        LOG.info("Processing cancelled by user.")
                    cancel_logged = True
                raise ProcessingCancelled("Processing cancelled by user.")

        def report(message: str) -> None:
            nonlocal last_status
            tracker.status(message)
            if message != last_status:
                LOG.info(message)
                last_status = message

        if progress_sink is not None:
            with contextlib.suppress(AttributeError):
                progress_sink.set_cancel_callback(_request_cancel)

        manual_rate = cfg.input_sample_rate
        if manual_rate is not None and manual_rate <= 0:
            raise ValueError("Input sample rate override must be positive.")

        #: every writer opened by this run — closed (idempotently) on ALL
        #: exit paths so cancel/error never unlinks a still-open output
        #: (Windows refuses that) or leaks fds in a long-lived GUI process
        all_writers: list = []

        def _close_writers_quietly() -> None:
            for w in all_writers:
                with contextlib.suppress(Exception):
                    w.close()

        try:
            # --- probing ---------------------------------------------------
            if input_spec.container == "raw":
                if manual_rate is None:
                    raise ValueError(
                        "Raw IQ inputs require --input-sample-rate (CLI) or a "
                        "manual entry in the GUI."
                    )
                sample_rate = float(manual_rate)
                probe = SampleRateProbe(override=sample_rate)
            else:
                probe = probe_sample_rate(cfg.in_path)
                if manual_rate is not None:
                    sample_rate = float(manual_rate)
                    probe = dataclasses.replace(probe, override=sample_rate)
                else:
                    try:
                        sample_rate = probe.value
                    except RuntimeError as exc:
                        raise RuntimeError(
                            "Unable to determine input sample rate automatically. "
                            "Provide --input-sample-rate or enter it manually."
                        ) from exc

            preview_seconds = cfg.max_input_seconds
            if preview_seconds is not None and preview_seconds <= 0:
                preview_seconds = None
            max_input_samples: int | None = None
            if preview_seconds is not None and sample_rate > 0:
                max_input_samples = max(1, int(math.floor(preview_seconds * sample_rate)))
            # segmented/burst mode: a sample-precise input window
            # (:mod:`.segmented` plans frame-aligned windows per worker)
            seg_start = int(cfg.input_start_sample or 0)
            if cfg.input_num_samples is not None:
                seg_n = max(1, int(cfg.input_num_samples))
                max_input_samples = (
                    seg_n if max_input_samples is None
                    else min(max_input_samples, seg_n)
                )

            if cfg.target_freq <= 0 and not cfg.probe_only:
                raise ValueError(
                    "Target frequency must be positive. Provide --ft or use --interactive."
                )
            if cfg.bandwidth <= 0:
                raise ValueError("Bandwidth must be positive.")

            center_freq = cfg.center_freq
            center_source = (
                cfg.center_freq_source
                if cfg.center_freq_source
                else ("config" if center_freq is not None else "unavailable")
            )
            if center_freq is None:
                detection = detect_center_frequency(cfg.in_path)
                if detection.value is None:
                    raise ValueError(
                        "Center frequency not supplied and could not be determined "
                        "from metadata or filename. Use --fc to provide it explicitly."
                    )
                center_freq = detection.value
                center_source = detection.source
                cfg.center_freq = center_freq
                cfg.center_freq_source = center_source
                LOG.info("Center frequency detected via %s.", center_source)

            freqs = self._target_freqs()
            if not freqs:
                freqs = [center_freq]
            if len(freqs) > 5:
                raise ValueError("At most five target frequencies are supported per run.")
            offsets = [f - center_freq for f in freqs]
            target_freq = freqs[0]
            freq_offset = offsets[0]

            decimation, fs_channel = compute_decimation(sample_rate, cfg.fs_ch_target)

            LOG.info(
                "Input sample rate %.2f Hz (header=%s, wave=%s).",
                sample_rate,
                f"{probe.header:.2f}" if probe.header else "n/a",
                f"{probe.wave:.2f}" if probe.wave else "n/a",
            )
            LOG.info(
                "Center frequency %.0f Hz, target(s) %s, offset(s) %s Hz.",
                center_freq,
                "/".join(f"{f:.0f}" for f in freqs),
                "/".join(f"{o:.0f}" for o in offsets),
            )
            LOG.info(
                "Channel decimation factor %d -> %.2f Hz complex rate.", decimation, fs_channel
            )
            LOG.info("Using %s demodulator.", cfg.demod_mode.upper())
            LOG.info("AGC %s.", "enabled" if cfg.agc_enabled else "disabled")

            # --- geometry / plans -------------------------------------------
            taps = design_channel_filter(sample_rate, cfg.bandwidth, decimation)
            LOG.info("Designed FIR channel filter with %d taps.", len(taps))

            target_chunk = tune_chunk_size(sample_rate, cfg.chunk_size)
            max_chunk = 1 << 22
            if jax.default_backend() != "cpu" and cfg.chunk_size >= 1_048_576:
                # accelerators amortise per-chunk host-interaction latency:
                # prefer the 4Mi cap unless the user asked for less
                target_chunk = max(target_chunk, 1 << 22)
            rs_align = 1
            if not pass_through:
                rate_plan = ResamplePlan.create(fs_channel, _OUTPUT_RATE, 1)
                if not rate_plan.identity:
                    # aligning the decimated chunk to the resampler block
                    # keeps its geometry identical every chunk
                    rs_align = rate_plan.down
            ddc_plan = DDCPlan.create(
                len(taps),
                decimation,
                target_chunk=target_chunk,
                out_align=rs_align,
                max_chunk=max_chunk,
            )
            chunk_size = ddc_plan.chunk_size
            n_dec = ddc_plan.out_size
            rs_plan = None
            if not pass_through:
                rs_plan = ResamplePlan.create(fs_channel, _OUTPUT_RATE, n_dec)

            # --- checkpoint/resume (SURVEY §5: carried state + input offset) --
            resume_data = None
            ckpt_path: Path | None = None
            ckpt_requested = (
                (cfg.checkpoint_secs or cfg.resume) and not cfg.probe_only
            )
            if ckpt_requested and pass_through:
                # the slice output would need codec-exact truncation on
                # resume; not supported — say so instead of silently
                # paying the checkpoint costs and never writing one
                LOG.warning(
                    "Checkpoint/resume is not supported in pass-through "
                    "(--demod none) runs; continuing without checkpoints."
                )
                ckpt_requested = False
            if ckpt_requested:
                paths_for_ckpt = self._channel_paths(freqs, cfg.output_path)
                ckpt_path = Path(str(paths_for_ckpt[0]) + ".ckpt")
            if cfg.resume and ckpt_path is not None and ckpt_path.exists():
                import pickle

                with ckpt_path.open("rb") as f:
                    resume_data = pickle.load(f)
                LOG.info(
                    "Resuming from %s (%.2f s of input already processed).",
                    ckpt_path,
                    resume_data["counters"]["processed_samples"] / sample_rate,
                )
            resume_frames = (
                resume_data["counters"]["processed_samples"] if resume_data else 0
            )
            if max_input_samples is not None and resume_frames:
                # the reader seeks past the already-processed samples, so the
                # remaining window budget shrinks by the same amount (else a
                # resumed preview/segment run would overread its window)
                max_input_samples = max(0, max_input_samples - resume_frames)

            # --- totals for progress ----------------------------------------
            reader = IQReader(
                cfg.in_path,
                chunk_size,
                cfg.iq_order,
                input_spec,
                sample_rate=sample_rate if input_spec.container == "raw" else None,
                start_frame=seg_start + resume_frames,
                # synchronous reads: page-cache reads are cheap and a busy
                # Python thread interferes with accelerator dispatch latency
                prefetch_depth=0 if jax.default_backend() != "cpu" else 2,
            )
            phases: list[PhaseState] = []
            with reader:
                total_input_samples = float(reader.total_frames)
                if max_input_samples is not None:
                    if total_input_samples > 0:
                        total_input_samples = float(
                            min(total_input_samples, max_input_samples)
                        )
                    else:
                        total_input_samples = float(max_input_samples)
                estimated_channel_samples = total_input_samples / max(decimation, 1)
                duration_seconds = (
                    total_input_samples / sample_rate if sample_rate > 0 else 0.0
                )
                estimated_chunks = (
                    int(math.ceil(total_input_samples / chunk_size))
                    if total_input_samples > 0
                    else 0
                )
                estimated_audio_samples = max(duration_seconds * _OUTPUT_RATE, 0.0)
                if estimated_chunks > 0:
                    LOG.info(
                        "Expecting approximately %d processing chunks "
                        "(chunk size %d samples, %.2f s of IQ).",
                        estimated_chunks,
                        chunk_size,
                        duration_seconds,
                    )
                if chunk_size != cfg.chunk_size:
                    LOG.info(
                        "Adjusted chunk size from %d to %d samples (~%.3f s) for "
                        "decimation-aligned device frames.",
                        cfg.chunk_size,
                        chunk_size,
                        chunk_size / sample_rate if sample_rate > 0 else 0.0,
                    )

                phases = [
                    PhaseState("ingest", "Ingest IQ", total_input_samples, unit="samples"),
                    PhaseState(
                        "channel", "Channelize", estimated_channel_samples, unit="samples"
                    ),
                    PhaseState(
                        "demod", "Demodulate", estimated_channel_samples, unit="samples"
                    ),
                    PhaseState("encode", "Encode Audio", estimated_audio_samples, unit="samples"),
                ]
                if cfg.dump_iq_path:
                    phases.insert(
                        3,
                        PhaseState(
                            "dump_iq",
                            "Write IQ Dump",
                            estimated_channel_samples,
                            unit="samples",
                        ),
                    )
                tracker.start(phases)
                report("design filter")
                _check_cancel("initialization")

                # --- warm-up: first block + mixer sign ----------------------
                report("init dsp")
                raw_first = reader.read_block_raw()
                if raw_first is None or raw_first.size == 0:
                    raise RuntimeError("Input stream produced no samples.")
                _check_cancel("warm-up")

                if resume_data is not None:
                    mix_sign = resume_data["mix_sign"]
                elif cfg.mix_sign_override in (1, -1):
                    mix_sign = cfg.mix_sign_override
                else:
                    probe_len = min(
                        raw_first.size // 2,
                        max(int(sample_rate * 0.05), len(taps) * 4, 131_072),
                    )
                    warm = convert_to_complex(
                        raw_first[: 2 * probe_len], input_spec.codec, cfg.iq_order
                    )
                    mix_sign = choose_mix_sign(
                        warm, sample_rate, freq_offset, taps, decimation
                    )
                LOG.info("Selected mixer sign %d based on warm-up snippet.", mix_sign)
                report("warm-up")
                _check_cancel("warm-up")

                if cfg.probe_only:
                    tracker.advance("ingest", raw_first.size // 2)
                    report("Probe-only inspection complete")
                    return ProcessingResult(
                        sample_rate_probe=probe,
                        center_freq=center_freq,
                        target_freq=target_freq,
                        freq_offset=freq_offset,
                        decimation=decimation,
                        fs_channel=fs_channel,
                        mix_sign=mix_sign,
                        audio_peak=0.0,
                    )

                # --- writers -------------------------------------------------
                output_paths = self._channel_paths(freqs, cfg.output_path)
                for p in output_paths:
                    p.parent.mkdir(parents=True, exist_ok=True)
                dump_paths: list[Path | None] = [None] * len(freqs)
                if cfg.dump_iq_path:
                    base_dump = cfg.dump_iq_path
                    dump_paths = [
                        self._annotate(base_dump, f) if len(freqs) > 1 else base_dump
                        for f in freqs
                    ]

                appending = resume_data is not None
                if appending:
                    # outputs may contain windows flushed AFTER the last
                    # checkpoint: truncate back to the checkpointed position
                    # (resume implies audio mode — pass-through runs never
                    # write a checkpoint, see the ckpt_requested gate)
                    ctr = resume_data["counters"]
                    for p in output_paths:
                        _truncate_payload(p, ctr["rs_emitted"] * 2)  # mono s16
                    for p in dump_paths:
                        if p is not None and Path(p).exists():
                            with Path(p).open("r+b") as f:
                                f.truncate(ctr["dec_emitted"] * 8)  # cf32 pairs
                audio_writers: list[AudioWriter] = []
                slice_writers: list[IQSliceWriter] = []
                iq_writers = [
                    IQDebugWriter(p, fs_channel, append=appending) for p in dump_paths
                ]
                if pass_through:
                    slice_writers = [
                        IQSliceWriter(p, fs_channel, input_spec, append=appending)
                        for p in output_paths
                    ]
                else:
                    audio_writers = [
                        AudioWriter(p, append=appending)
                        for p in output_paths
                    ]
                    if appending:
                        rms_states = resume_data.get("rms")
                        if rms_states is None:
                            LOG.warning(
                                "Checkpoint predates RMS accumulation: the "
                                "reported RMS will cover post-resume samples "
                                "only."
                            )
                        else:
                            for w, st in zip(audio_writers, rms_states):
                                w.seed_rms(*st)
                all_writers.extend(iq_writers)
                all_writers.extend(slice_writers)
                all_writers.extend(audio_writers)

                # --- build the device step -----------------------------------
                incs = [
                    nco_increment_fixed(off, sample_rate, sign=mix_sign) for off in offsets
                ]
                ddc_kernel_np = bandpass_kernel(taps, incs)
                rs_kernel_np = None
                if rs_plan is not None and not rs_plan.identity:
                    rs_kernel_np = design_resampler_kernel(rs_plan.up, rs_plan.down)
                decoder = None
                if not pass_through:
                    decoder = create_decoder(
                        cfg.demod_mode,
                        deemph_us=cfg.deemph_us,
                        agc_enabled=cfg.agc_enabled,
                    )
                    decoder.setup(fs_channel)
                acc_cap = None
                if ckpt_path is not None and cfg.checkpoint_secs and sample_rate > 0:
                    # checkpoints land on window boundaries: keep windows
                    # no longer than the checkpoint cadence
                    acc_cap = max(
                        1, int(cfg.checkpoint_secs * sample_rate // chunk_size)
                    )
                # supersteps require a constant per-chunk resampler geometry
                # and are pointless for stage-snapshot runs
                rs_aligned = (
                    rs_plan is None
                    or rs_plan.identity
                    or n_dec % rs_plan.down == 0
                )
                super_req = None if rs_aligned and not cfg.plot_stages_path else 1
                # H2D/compute overlap schedule (see the hot-loop comment).
                # IQ2A_OVERLAP: "1"/"on" pins the overlapped schedule,
                # "0"/"off"/"phased" pins the strict phases, "auto"
                # (default) overlaps and self-calibrates on long captures.
                # Checkpointed runs stay phased — the phased drain point is
                # the only place the carried state handle is both flushed
                # and not yet donated to the next dispatch.
                overlap_env = os.environ.get("IQ2A_OVERLAP", "auto").lower()
                if overlap_env in {"0", "off", "phased"}:
                    sched_mode = "phased"
                elif overlap_env in {"auto", ""}:
                    sched_mode = "auto"
                else:
                    sched_mode = "overlap"
                if cfg.checkpoint_secs and ckpt_path is not None:
                    if sched_mode == "overlap":
                        LOG.info(
                            "IQ2A_OVERLAP ignored: checkpointed runs use the "
                            "phased schedule (the drain point is the only "
                            "spot where the carried state is fetchable)."
                        )
                    sched_mode = "phased"
                step = build_chunk_step(
                    ddc_plan=ddc_plan,
                    rs_plan=rs_plan,
                    ddc_kernel_np=ddc_kernel_np,
                    rs_kernel_np=rs_kernel_np,
                    incs_fixed=incs,
                    codec=input_spec.codec,
                    iq_order=cfg.iq_order,
                    decoder=decoder,
                    pass_through=pass_through,
                    dump_iq=cfg.dump_iq_path is not None,
                    acc_chunks_cap=acc_cap,
                    super_chunks=super_req,
                    # fixed geometry: size the accumulator/superstep as for
                    # an unbounded capture so every input-window length
                    # shares ONE compiled executable (segmented/burst runs
                    # claim variable-length windows; executable churn is
                    # expensive on tunneled runtimes)
                    est_total_chunks=(
                        None if cfg.fixed_device_geometry
                        else (estimated_chunks or None)
                    ),
                    want_stages=cfg.plot_stages_path is not None,
                    taps_np=np.asarray(taps),
                )
                state = step.init_state(seg_start)
                accs = step.init_accs()

                import hashlib

                fingerprint = {
                    # input identity + window: a resume against a different
                    # capture (or a shifted --input-start-sample window)
                    # must be rejected, not silently spliced
                    "in_path": str(Path(cfg.in_path).resolve()),
                    "in_size": os.stat(cfg.in_path).st_size,
                    "in_start": int(cfg.input_start_sample or 0),
                    "in_num": cfg.input_num_samples,
                    "deemph_us": cfg.deemph_us,
                    "chunk": chunk_size,
                    "decimation": decimation,
                    "sample_rate": sample_rate,
                    "bandwidth": cfg.bandwidth,
                    "taps_sha": hashlib.sha1(taps.tobytes()).hexdigest(),
                    "mode": cfg.demod_mode.lower(),
                    "agc": cfg.agc_enabled,
                    "incs": tuple(incs),
                    "codec": input_spec.codec,
                    "iq_order": cfg.iq_order,
                    "acc_chunks": step.acc_chunks,
                    # the fft channelizer carries a differently-shaped
                    # state pytree ((2, L-1) pair) than conv/native (the
                    # interleaved 2(L-1) raw tail) — a resume must use the
                    # same LAYOUT family; conv and native interchange
                    "channelizer": (
                        "fft" if step.channelizer == "fft" else "conv"
                    ),
                }
                stage_snapshots: dict[str, tuple[np.ndarray, float]] = {}
                want_stages = cfg.plot_stages_path is not None

                # --- chunk loop ----------------------------------------------
                # exact host mirrors of the resampler stream position
                rs_in_device = 0  # decimated samples consumed by the device
                rs_in_valid = 0  # decimated samples that were real (not pad)
                rs_emitted = 0  # 48 kHz samples written so far
                processed_samples = 0
                dec_emitted = 0
                if resume_data is not None:
                    if resume_data.get("version") != _CKPT_VERSION:
                        raise ValueError(
                            f"Checkpoint {ckpt_path} was written by an "
                            "incompatible engine version (state layout "
                            "changed); remove it or rerun without --resume."
                        )
                    if resume_data["fingerprint"] != fingerprint:
                        raise ValueError(
                            f"Checkpoint {ckpt_path} does not match this "
                            "configuration; remove it or rerun without --resume."
                        )
                    # the running pre-clip peak rides in the state pytree
                    state = jax.tree_util.tree_map(jnp.asarray, resume_data["state"])
                    ctr = resume_data["counters"]
                    rs_in_device = ctr["rs_in_device"]
                    rs_in_valid = ctr["rs_in_valid"]
                    rs_emitted = ctr["rs_emitted"]
                    processed_samples = ctr["processed_samples"]
                    dec_emitted = ctr["dec_emitted"]
                next_ckpt_at = None
                if cfg.checkpoint_secs and sample_rate > 0 and not pass_through:
                    next_ckpt_at = processed_samples + int(
                        cfg.checkpoint_secs * sample_rate
                    )

                def _save_checkpoint(st):
                    import pickle

                    payload = {
                        "version": _CKPT_VERSION,
                        "fingerprint": fingerprint,
                        "mix_sign": mix_sign,
                        # incl. the running pre-clip peak (state["peak"])
                        "state": jax.tree_util.tree_map(np.asarray, st),
                        # per-channel RMS accumulation so a resumed run still
                        # reports the CAPTURE-level RMS, not post-resume only
                        "rms": [w.rms_state for w in audio_writers],
                        "counters": {
                            "processed_samples": processed_samples,
                            "dec_emitted": dec_emitted,
                            "rs_in_device": rs_in_device,
                            "rs_in_valid": rs_in_valid,
                            "rs_emitted": rs_emitted,
                        },
                    }
                    tmp = ckpt_path.with_suffix(".ckpt.tmp")
                    with tmp.open("wb") as f:
                        pickle.dump(payload, f)
                    tmp.replace(ckpt_path)
                    LOG.info(
                        "Checkpoint written at %.2f s of input (%s).",
                        processed_samples / sample_rate,
                        ckpt_path,
                    )
                limit_exhausted = False
                window: list[tuple[int, int]] = []  # (dec_valid, audio_count) per slot
                pending_flush = None  # (accs handle, counts) fetched one window later
                free_accs = None  # flushed window buffers, reusable (donation)
                last_audio = {}  # final fetched accumulator for the EOF flush
                acc_chunks = step.acc_chunks
                audio_cap = step.audio_capacity
                n_dec_cap = ddc_plan.out_size
                if cfg.profile_dir:
                    # TPU-native observability: xprof trace of the chunk loop
                    jax.profiler.start_trace(str(cfg.profile_dir))
                    self._profiling = True
                loop_start = time.perf_counter()

                feed_state = {"limit_exhausted": False}
                super_chunks = step.super_chunks

                # raw-domain pad value decoding to 0.0 on device: u8 is
                # offset-binary, so raw 0 would decode to full-scale -1.0
                # DC and corrupt the EOF resampler flush (the float64 twin
                # pads the COMPLEX domain with zeros)
                raw_zero = 128 if input_spec.codec == "pcm_u8" else 0

                def _raw_blocks():
                    """Valid-sliced, silence-padded raw blocks (owned arrays)."""
                    consumed = 0
                    block = raw_first
                    while True:
                        valid = block.size // 2
                        if max_input_samples is not None:
                            remaining = max_input_samples - consumed
                            if remaining <= 0:
                                feed_state["limit_exhausted"] = True
                                return
                            if valid > remaining:
                                block = block[: 2 * remaining]
                                valid = remaining
                                feed_state["limit_exhausted"] = True
                        if valid:
                            if block.size < 2 * chunk_size:
                                padded = np.full(
                                    2 * chunk_size, raw_zero, dtype=block.dtype
                                )
                                padded[: block.size] = block
                                block = padded
                            consumed += valid
                            yield valid, block
                        if feed_state["limit_exhausted"]:
                            return  # don't read (and discard) one more block
                        nxt = reader.read_block_raw()
                        if nxt is None or nxt.size == 0:
                            return
                        block = nxt

                def _groups():
                    """Groups of ``super_chunks`` blocks per dispatch.  A
                    partial FINAL group is zero-padded to the superstep
                    length so ONE compiled executable serves every dispatch
                    (pad chunks carry valid=0, count nothing and write
                    nothing; they only advance the device stream state past
                    EOF, where it is never used again)."""
                    group: list[tuple[int, np.ndarray]] = []
                    for item in _raw_blocks():
                        group.append(item)
                        if len(group) == super_chunks:
                            yield group
                            group = []
                    if group:
                        if super_chunks > 1:
                            pad = np.full(
                                2 * chunk_size, raw_zero, dtype=group[0][1].dtype
                            )
                            while len(group) < super_chunks:
                                group.append((0, pad))
                        yield group

                def _windows():
                    """Window-sized batches of groups (acc_chunks chunks)."""
                    batch: list[list[tuple[int, np.ndarray]]] = []
                    count = 0
                    for group in _groups():
                        batch.append(group)
                        count += len(group)
                        if count == acc_chunks:
                            yield batch
                            batch, count = [], 0
                    if batch:
                        yield batch

                timing = {"fetch": 0.0, "write": 0.0, "dispatch": 0.0, "feed": 0.0}
                want_timing = bool(os.environ.get("IQ2A_TIMING"))

                def _start_fetch(handle):
                    """Begin the accumulator D2H without blocking: the copy
                    drains behind the window's queued compute while the host
                    stages the next window (measured: async submit ~0.2 ms;
                    the later np.asarray then returns from the landed copy).
                    IQ2A_SYNC_FETCH=1 disables the async start (on some
                    relay runtimes copy_to_host_async routes the transfer
                    down a slower path than a plain blocking fetch)."""
                    if self.warm_no_fetch or (
                        os.environ.get("IQ2A_SYNC_FETCH", "0") != "0"
                    ):
                        return
                    for arr in handle.values():
                        fn = getattr(arr, "copy_to_host_async", None)
                        if fn is not None:
                            fn()

                def _write_flush(handle, counts):
                    """Fetch one completed accumulation window (a single D2H
                    round-trip, overlapped with the following window's
                    compute) and write every chunk's valid region."""
                    if not counts or self.warm_no_fetch:
                        return
                    t0 = time.perf_counter()
                    if pass_through or cfg.dump_iq_path:
                        iq_np = np.asarray(handle["iq_r"]) + 1j * np.asarray(
                            handle["iq_i"]
                        )
                    if not pass_through:
                        audio_np = np.asarray(handle["audio"])  # (C, K*cap) int16
                    timing["fetch"] += time.perf_counter() - t0
                    t0 = time.perf_counter()
                    for s, (dec_valid, audio_count) in enumerate(counts):
                        if pass_through:
                            for c, w in enumerate(slice_writers):
                                w.write(iq_np[c, s * n_dec_cap : s * n_dec_cap + dec_valid])
                        else:
                            if cfg.dump_iq_path:
                                for c, w in enumerate(iq_writers):
                                    if w.fd:
                                        w.write(
                                            iq_np[c, s * n_dec_cap : s * n_dec_cap + dec_valid]
                                        )
                            lo = s * audio_cap
                            for c, w in enumerate(audio_writers):
                                w.write_s16(audio_np[c, lo : lo + audio_count])
                    if not pass_through:
                        last_audio["buf"] = audio_np
                        last_audio["slot"] = len(counts) - 1
                        last_audio["count"] = counts[-1][1]
                    timing["write"] += time.perf_counter() - t0

                idx = 0  # global chunk counter (device-consumed chunks)

                def _upload_group(group):
                    """Stage one dispatch group on device (async H2D)."""
                    t0 = time.perf_counter()
                    if len(group) == super_chunks and super_chunks > 1:
                        stack = np.empty(
                            (super_chunks, 2 * chunk_size), dtype=group[0][1].dtype
                        )
                        for s, (_v, blk) in enumerate(group):
                            stack[s] = blk
                        dev = jax.device_put(stack)
                    else:
                        dev = [jax.device_put(blk) for _v, blk in group]
                    timing["feed"] += time.perf_counter() - t0
                    return dev

                def _dispatch_group(group, raw_dev):
                    """Exact host bookkeeping + one async device dispatch."""
                    nonlocal idx, state, accs
                    nonlocal processed_samples, dec_emitted
                    nonlocal rs_in_device, rs_in_valid, rs_emitted
                    t0 = time.perf_counter()
                    slot_base = idx % acc_chunks
                    n_real = len(group)
                    rs_offset = 0
                    if rs_plan is not None and not rs_plan.identity:
                        rs_offset = rs_plan.chunk_offset(rs_in_device)
                    group_valid = 0
                    for valid_frames, _blk in group:
                        # exact host bookkeeping (Python ints, no syncs)
                        processed_samples += valid_frames
                        group_valid += valid_frames
                        dec_total = -(-processed_samples // decimation)  # ceil
                        dec_valid = dec_total - dec_emitted
                        dec_emitted = dec_total
                        if rs_plan is not None and not rs_plan.identity:
                            audio_count = rs_plan.out_count(rs_in_device, dec_valid)
                            rs_in_device += n_dec
                            rs_in_valid += dec_valid
                            rs_emitted += audio_count
                        elif rs_plan is not None:
                            audio_count = dec_valid
                        else:
                            audio_count = 0
                        window.append((dec_valid, audio_count))

                    report(f"C{idx + 1} channel")
                    if n_real == super_chunks and super_chunks > 1:
                        state, accs = step.fn_super(
                            state, accs, raw_dev, rs_offset, slot_base
                        )
                    else:
                        # final partial group (or S==1): per-chunk steps
                        for s, blk_dev in enumerate(raw_dev):
                            if want_stages and idx + s == 0:
                                state, accs, out = step.fn_stages(
                                    state, accs, blk_dev, rs_offset, slot_base + s
                                )
                                stages = out.pop("stages")
                                for name, buf in stages.items():
                                    rate = (
                                        sample_rate
                                        if name in {"input", "mixed", "filtered"}
                                        else fs_channel
                                    )
                                    if isinstance(buf, tuple):  # (re, im)
                                        arr = np.asarray(buf[0]) + 1j * np.asarray(
                                            buf[1]
                                        )
                                    else:
                                        arr = np.asarray(buf)
                                    stage_snapshots[name] = (arr, rate)
                            else:
                                state, accs, _out = step.fn(
                                    state, accs, blk_dev, rs_offset, slot_base + s
                                )
                    idx += n_real

                    tracker.advance("ingest", float(group_valid))
                    group_dec = sum(d for d, _ in window[-n_real:])
                    # downstream progress is host-known without syncs
                    tracker.advance("channel", float(group_dec))
                    if not pass_through:
                        if cfg.dump_iq_path:
                            tracker.advance("dump_iq", float(group_dec))
                        tracker.advance("demod", float(group_dec))
                        tracker.advance(
                            "encode",
                            float(group_dec) / max(fs_channel, 1e-9) * _OUTPUT_RATE,
                        )
                    else:
                        tracker.advance("demod", float(group_dec))
                    timing["dispatch"] += time.perf_counter() - t0

                def _drain_and_checkpoint():
                    nonlocal pending_flush, next_ckpt_at, free_accs
                    if pending_flush is None:
                        return
                    handle = pending_flush[0]
                    _write_flush(*pending_flush)
                    pending_flush = None
                    if handle is not accs:
                        # overlapped schedule: the flushed window's buffers
                        # are free — recycle them as the NEXT window's
                        # donated accumulator (the phased schedule keeps
                        # dispatching into the live handle directly)
                        free_accs = handle
                    if next_ckpt_at is not None and processed_samples >= next_ckpt_at:
                        _save_checkpoint(state)
                        next_ckpt_at = processed_samples + int(
                            cfg.checkpoint_secs * sample_rate
                        )

                # ------------------------------------------------------------
                # Hot loop: two schedules over the same dispatch groups (and
                # therefore the same compiled executable).
                #
                # OVERLAPPED (default): per group, issue the async
                # ``device_put`` and immediately submit the dispatch, so
                # group k+1's upload streams over the wire while group k
                # computes; the previous window's accumulator (whose D2H was
                # started async behind its own compute) is drained AFTER this
                # window's dispatches, so file writes also ride behind device
                # compute.  Steady-state wall per window ~ max(H2D, exec)
                # instead of their sum.
                #
                # PHASED (IQ2A_OVERLAP=0, checkpointed runs, or auto-
                # calibration fallback): strict phases — drain, upload the
                # whole window back-to-back, submit all dispatches, start
                # the fetch.  This is the safe shape for relay runtimes that
                # penalise uploads arriving behind an in-flight dispatch
                # (measured in an earlier campaign: a 32 MiB put that takes
                # ~22 ms idle took ~1 s behind a dispatch —
                # docs/probes/perf_probe3.py; later campaigns showed no such
                # penalty, hence measure-don't-assume).
                #
                # AUTO calibration: captures spanning >=4 windows run
                # windows 0-1 phased and window 2 overlapped, compare
                # per-chunk wall time, and keep the winner; shorter captures
                # (incl. the single-window headline bench, which A/Bs at the
                # bench level across passes) go straight to overlapped.
                # ------------------------------------------------------------
                est_windows = None
                if estimated_chunks:
                    est_windows = -(-estimated_chunks // acc_chunks)
                ab_calibrating = (
                    sched_mode == "auto"
                    and est_windows is not None
                    and est_windows >= 4
                )
                ab: dict[str, float | bool] = {}

                def _use_overlap(w_index: int) -> bool:
                    if sched_mode == "phased":
                        return False
                    if sched_mode == "overlap" or not ab_calibrating:
                        return True
                    if w_index <= 1:
                        return False  # warm-up + phased measurement
                    if w_index == 2:
                        return True  # overlapped measurement
                    return bool(ab.get("overlap_wins", True))

                w_index = 0
                for wgroups in _windows():
                    _check_cancel(f"chunk {idx + 1}")
                    t_win = time.perf_counter()
                    window = []
                    overlapped = _use_overlap(w_index)

                    if pending_flush is not None and pending_flush[0] is accs:
                        # the live handle is parked for a deferred flush:
                        # donating it to this window's first dispatch would
                        # overwrite the un-fetched window.  Swap to the
                        # recycled buffer (double-buffering; the second
                        # buffer allocates exactly once)
                        accs = (
                            free_accs if free_accs is not None
                            else step.init_accs()
                        )
                        free_accs = None

                    if overlapped:
                        for group in wgroups:
                            _dispatch_group(group, _upload_group(group))
                        _start_fetch(accs)
                        _drain_and_checkpoint()
                    else:
                        _drain_and_checkpoint()
                        dev_groups = [_upload_group(g) for g in wgroups]
                        for group, raw_dev in zip(wgroups, dev_groups):
                            _dispatch_group(group, raw_dev)
                        if os.environ.get("IQ2A_TIMING") == "2":
                            t0 = time.perf_counter()
                            jax.block_until_ready(
                                accs["audio" if not pass_through else "iq_r"]
                            )
                            LOG.info(
                                "window @%d exec %.1f ms",
                                idx,
                                1e3 * (time.perf_counter() - t0),
                            )
                        _start_fetch(accs)

                    pending_flush = (accs, window)
                    if ab_calibrating and 1 <= w_index <= 2:
                        # steady-state per-chunk wall (window 0 absorbed the
                        # compile); the drain inside the iteration means each
                        # measurement carries its schedule's true cost
                        per_chunk = (time.perf_counter() - t_win) / max(
                            1, sum(len(g) for g in wgroups)
                        )
                        if w_index == 1:
                            ab["phased_pc"] = per_chunk
                        else:
                            phased_pc = float(ab.get("phased_pc", float("inf")))
                            ab["overlap_wins"] = per_chunk <= phased_pc * 1.05
                            LOG.info(
                                "overlap auto-calibration: phased %.1f ms/chunk, "
                                "overlapped %.1f ms/chunk -> %s schedule",
                                1e3 * phased_pc,
                                1e3 * per_chunk,
                                "overlapped" if ab["overlap_wins"] else "phased",
                            )
                    w_index += 1
                    _check_cancel(f"chunk {idx} encode")
                limit_exhausted = limit_exhausted or feed_state["limit_exhausted"]

                if pending_flush is not None:
                    _write_flush(*pending_flush)
                    pending_flush = None
                if (
                    rs_plan is not None
                    and not rs_plan.identity
                    and not pass_through
                    and "buf" in last_audio
                ):
                    # EOF flush: outputs of the final (incomplete) resampler
                    # block exist in the last padded accumulator slot
                    extra = rs_plan.final_flush_count(rs_in_valid, rs_emitted)
                    if extra > 0:
                        buf = last_audio["buf"]
                        if n_dec % rs_plan.down == 0:
                            # aligned geometry: every full chunk emits exactly
                            # per_chunk_out samples, locating the completing
                            # block's slot directly
                            per_chunk_out = (n_dec // rs_plan.down) * rs_plan.up
                            j = rs_emitted // per_chunk_out
                            slot = j % acc_chunks
                            lo = slot * audio_cap + (rs_emitted % per_chunk_out)
                            hi = min(lo + extra, (slot + 1) * audio_cap)
                        else:
                            lo = last_audio["slot"] * audio_cap + last_audio["count"]
                            hi = min(lo + extra, (last_audio["slot"] + 1) * audio_cap)
                        for c, w in enumerate(audio_writers):
                            w.write_s16(buf[c, lo:hi])
                        rs_emitted += hi - lo
                if (
                    not pass_through
                    and not self.warm_no_fetch
                    and "buf" in last_audio
                ):
                    # The device-carried float peak (state["peak"]) covers
                    # every sample INCLUDING the final chunk's zero-padding,
                    # whose real->pad boundary puts a discriminator transient
                    # in samples that are never written.  The writers already
                    # track the exact peak of the valid (written) samples, so
                    # the device value is only consulted where it carries
                    # information the quantised stream lost: pre-clip
                    # amplitude once the +-0.99 clipper engaged.
                    # quantised value of a just-clipped sample: only consult
                    # the device peak when the +-0.99 clipper actually engaged
                    clip_q = round(0.99 * 32767.0) / 32767.0 - 1e-6
                    if any(w.peak >= clip_q for w in audio_writers):
                        peaks_np = np.asarray(state["peak"])  # tiny EOF fetch
                        for c, w in enumerate(audio_writers):
                            if w.peak >= clip_q:
                                w.peak = max(w.peak, float(peaks_np[c]))
                loop_seconds = time.perf_counter() - loop_start
                if want_timing:
                    LOG.info(
                        "timing: loop=%.3fs dispatch=%.3fs flush_fetch=%.3fs "
                        "flush_write=%.3fs h2d=%.3fs",
                        loop_seconds,
                        timing["dispatch"],
                        timing["fetch"],
                        timing["write"],
                        timing["feed"],
                    )
                if self._profiling:
                    jax.profiler.stop_trace()
                    self._profiling = False
                    LOG.info("Profiler trace written to %s", cfg.profile_dir)
                if ckpt_path is not None and ckpt_path.exists() and not limit_exhausted:
                    ckpt_path.unlink(missing_ok=True)  # run completed: drop ckpt

                report("flush outputs")
                if decoder is not None:
                    decoder.finalize()
                for w in iq_writers:
                    w.close()
                for w in audio_writers:
                    w.close()
                for w in slice_writers:
                    w.close()

            if limit_exhausted and preview_seconds is not None:
                processed_duration = (
                    processed_samples / sample_rate if sample_rate > 0 else 0.0
                )
                LOG.info(
                    "Stopped after %.2f s due to preview limit (processed %.3f M "
                    "complex samples).",
                    processed_duration if processed_duration > 0 else preview_seconds,
                    processed_samples / 1e6,
                )

            if cfg.plot_stages_path and not cfg.probe_only and stage_snapshots:
                try:
                    from ..analysis.visualize import save_stage_psd

                    for c, freq in enumerate(freqs):
                        path = (
                            cfg.plot_stages_path
                            if len(freqs) == 1
                            else self._annotate(cfg.plot_stages_path, freq)
                        )
                        per_channel = {
                            name: (
                                buf[c] if buf.ndim > 1 else buf,
                                rate,
                            )
                            for name, (buf, rate) in stage_snapshots.items()
                        }
                        save_stage_psd(per_channel, path, center_freq)
                    LOG.info("Saved stage PSD plots to %s", cfg.plot_stages_path)
                except Exception as exc:  # pragma: no cover - plotting best-effort
                    LOG.warning("Failed to save stage plots: %s", exc)

            rms_list: list[float] = []
            if pass_through:
                peaks = [w.peak for w in slice_writers]
                for freq, pk in zip(freqs, peaks):
                    LOG.info(
                        "[%d] IQ slice peak magnitude %.2f dBFS (complex).",
                        int(freq),
                        20.0 * math.log10(max(pk, 1e-6)),
                    )
            else:
                peaks = [w.peak for w in audio_writers]
                rms_list = [w.rms_dbfs for w in audio_writers]
                for freq, pk, rms in zip(freqs, peaks, rms_list):
                    LOG.info(
                        "[%d] Audio peak level %.2f dBFS, RMS %.2f dBFS.",
                        int(freq),
                        20.0 * math.log10(max(pk, 1e-6)),
                        rms,
                    )
            report("Processing complete")

            return ProcessingResult(
                sample_rate_probe=probe,
                center_freq=center_freq,
                target_freq=target_freq,
                freq_offset=freq_offset,
                decimation=decimation,
                fs_channel=fs_channel,
                mix_sign=mix_sign,
                audio_peak=peaks[0] if peaks else 0.0,
                audio_peaks=peaks,
                stats=[DecoderStats(rms_dbfs=r) for r in rms_list],
                output_paths=list(output_paths),
                loop_seconds=loop_seconds,
                input_samples=processed_samples,
            )
        except ProcessingCancelled:
            # reference semantics: delete partial outputs on cancel
            # (processing.py:1205-1211) — unless checkpointing is on, in
            # which case the partial output + checkpoint enable --resume
            _close_writers_quietly()  # before unlink: Windows refuses open files
            if not cfg.probe_only and not (cfg.checkpoint_secs and not pass_through):
                for p in output_paths:
                    try:
                        Path(p).unlink(missing_ok=True)
                    except OSError:
                        LOG.debug("Failed to remove cancelled output %s", p)
            raise
        finally:
            _close_writers_quietly()
            if self._profiling:
                with contextlib.suppress(Exception):
                    jax.profiler.stop_trace()
                self._profiling = False
            tracker.close()
