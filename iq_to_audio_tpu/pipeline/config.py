"""Run configuration — the single source of truth for one processing run.

Field-for-field capability match with the reference ``ProcessingConfig``
(reference ``processing.py:38-62``), with TPU-framework additions at the end
(device/batching knobs).  ``fft_workers`` is retained for CLI compatibility
but is a no-op: XLA owns intra-op parallelism on TPU (reference
``processing.py:697-732`` is subsumed).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class ProcessingConfig:
    in_path: Path
    target_freq: float = 0.0
    bandwidth: float = 12_500.0
    center_freq: float | None = None
    center_freq_source: str | None = None
    demod_mode: str = "nfm"
    fs_ch_target: float = 96_000.0
    deemph_us: float = 300.0
    agc_enabled: bool = True
    output_path: Path | None = None
    dump_iq_path: Path | None = None
    chunk_size: int = 1_048_576  # requested complex samples per chunk
    filter_block: int = 65_536  # FFT-size hint for the overlap-save filter
    iq_order: str = "iq"
    probe_only: bool = False
    mix_sign_override: int | None = None
    plot_stages_path: Path | None = None
    fft_workers: int | None = None  # accepted, ignored (XLA owns threading)
    max_input_seconds: float | None = None
    input_container: str | None = None
    input_format: str | None = None
    input_format_source: str | None = None
    input_sample_rate: float | None = None

    # --- TPU-framework extensions -------------------------------------------------
    #: additional target frequencies batched through the same channelizer
    #: pass (leading channel axis).  ``target_freq`` is channel 0.
    extra_target_freqs: list[float] = field(default_factory=list)
    #: per-extra-channel output paths (parallel to extra_target_freqs)
    extra_output_paths: list[Path | None] = field(default_factory=list)
    #: let the planner auto-pick the FFT size instead of honoring
    #: ``filter_block`` verbatim (default True; set False for strict parity)
    auto_filter_block: bool = True
    #: device platform override (e.g. "cpu" for tests); None = default
    device: str | None = None
    #: write a jax.profiler trace of the chunk loop to this directory
    #: (view with TensorBoard / xprof) — the reference has no tracer;
    #: this is the TPU-native observability hook (SURVEY §5)
    profile_dir: Path | None = None
    #: checkpoint the carried stream state every N seconds of input to
    #: <output>.ckpt.npz so an interrupted run can --resume (None = off)
    checkpoint_secs: float | None = None
    #: resume from a checkpoint written by an earlier interrupted run
    resume: bool = False
    #: process only the input window starting at this absolute complex-sample
    #: index (segmented/burst mode — :mod:`.segmented`).  The caller must
    #: align it to a "frame" (``decimation * resampler_down`` samples) so a
    #: fresh decimator/resampler state is stream-position-exact; the NCO is
    #: phase-seeded from the absolute index.  None = start of capture.
    input_start_sample: int | None = None
    #: process at most this many complex samples from ``input_start_sample``
    #: (sample-precise counterpart of ``max_input_seconds``; both may be set,
    #: the tighter bound wins).  None = to EOF.
    input_num_samples: int | None = None
    #: size the device accumulator/superstep as for an unbounded capture so
    #: every input-window length shares one compiled executable (set by the
    #: burst-mode executor, whose work-stealing claims vary in length;
    #: slightly more per-window fetch for short windows in exchange for
    #: zero executable churn)
    fixed_device_geometry: bool = False

    def all_target_freqs(self) -> list[float]:
        return [self.target_freq, *self.extra_target_freqs]
