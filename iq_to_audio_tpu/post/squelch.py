"""Batch audio squelch and silence trimming.

Feature parity with the reference post-processor (reference
``squelch.py``): static, adaptive and transient gating, hold-time
opening of the mask, fade ramps at gate edges, lead/trail trimming,
and per-file plus batch summaries. Everything is plain vectorised
NumPy — audio-rate gating is host-trivial compared to the IQ pipeline,
so nothing here touches the accelerator.

IO: WAV containers go through the first-party reader/writer (primary
path, no external dependency).  Anything else libsndfile handles
(flac/ogg/aiff/..., reference ``squelch.py:272-289``) is read and
written through the optional ``soundfile`` package when it is
importable; without it such files are skipped with a LOUD per-file log
line naming the missing dependency, never silently.
"""

from __future__ import annotations

import logging
from collections.abc import Callable, Iterable, Sequence
from dataclasses import dataclass
from pathlib import Path
from typing import Literal

import numpy as np

from ..io.riff import WavStreamWriter, parse_wav_header
from ..io.writer import read_wav

LOG = logging.getLogger(__name__)

SquelchMethod = Literal["adaptive", "static", "transient"]

_DB_FLOOR = -160.0
_TINY = 1e-10
_GATE_OPEN_EPS = 1e-3  # gain above this counts as "gate open" for trimming


# --------------------------------------------------------------------------
# configuration / results
# --------------------------------------------------------------------------


@dataclass(slots=True)
class SquelchConfig:
    """Gate tuning knobs; defaults mirror the reference CLI defaults."""

    method: SquelchMethod = "adaptive"
    auto_noise_floor: bool = True
    manual_noise_floor_db: float | None = None
    noise_floor_percentile: float = 0.2
    threshold_margin_db: float = 6.0
    window_seconds: float = 0.04
    transient_window_seconds: float = 0.012
    transient_margin_db: float = 8.0
    hold_seconds: float = 0.12
    fade_seconds: float = 0.01
    trim_silence: bool = True
    trim_lead_seconds: float = 0.15
    trim_trail_seconds: float = 0.35

    def resolve_noise_floor(self, envelope_db: np.ndarray) -> float:
        """Noise floor in dBFS: auto (envelope percentile) or manual."""
        if self.auto_noise_floor:
            q = 100.0 * float(np.clip(self.noise_floor_percentile, 0.0, 1.0))
            return float(np.percentile(envelope_db, q))
        if self.manual_noise_floor_db is None:
            raise ValueError(
                "manual_noise_floor_db must be provided when auto_noise_floor=False."
            )
        return float(self.manual_noise_floor_db)


# formats the optional soundfile (libsndfile) fallback can read
_SOUNDFILE_SUFFIXES = (
    ".flac", ".ogg", ".oga", ".opus", ".aiff", ".aif", ".aifc",
    ".au", ".snd", ".caf", ".w64", ".rf64", ".voc", ".mp3",
)


def _soundfile():
    """The optional ``soundfile`` module, or None when not installed."""
    try:
        import soundfile
    except ImportError:
        return None
    return soundfile


def supported_suffixes() -> tuple[str, ...]:
    """Suffixes the current environment can actually process."""
    if _soundfile() is not None:
        return (".wav", *_SOUNDFILE_SUFFIXES)
    return (".wav",)


@dataclass(slots=True)
class AudioPostOptions:
    config: SquelchConfig
    overwrite: bool = False
    cleaned_suffix: str = "-cleaned"
    # empty = everything the environment supports (see supported_suffixes)
    allowed_suffixes: Sequence[str] = ()


@dataclass(slots=True)
class SquelchFileResult:
    input_path: Path
    output_path: Path
    samples_in: int
    samples_out: int
    duration_in: float
    duration_out: float
    bytes_in: int
    bytes_out: int
    noise_floor_db: float
    threshold_db: float
    method: SquelchMethod
    retained_ratio: float


@dataclass(slots=True)
class SquelchSummary:
    results: list[SquelchFileResult]
    errors: list[tuple[Path, Exception]]

    @property
    def processed(self) -> int:
        return len(self.results)

    @property
    def failed(self) -> int:
        return len(self.errors)

    @property
    def total(self) -> int:
        return self.processed + self.failed

    def aggregate_duration_delta(self) -> float:
        return float(sum(r.duration_out - r.duration_in for r in self.results))

    def aggregate_size_delta(self) -> int:
        return int(sum(r.bytes_out - r.bytes_in for r in self.results))


# --------------------------------------------------------------------------
# envelope + mask construction
# --------------------------------------------------------------------------


def _as_frames(audio: np.ndarray) -> np.ndarray:
    """Coerce to (frames, channels) float32."""
    x = np.asarray(audio, dtype=np.float32)
    if x.ndim == 1:
        return x[:, None]
    if x.ndim == 2:
        return x
    raise ValueError(f"Expected mono/stereo audio, received shape {x.shape!r}.")


def _box_mean(x: np.ndarray, width: int) -> np.ndarray:
    """Sliding mean with ``np.convolve(mode="same")`` zero-pad semantics,
    evaluated in O(N) via a float64 cumulative sum — the direct convolution
    is O(N*width) and a 10-minute 48 kHz capture with the ~1920-tap window
    would cost ~5e10 multiply-adds per envelope."""
    x = np.asarray(x, dtype=np.float32)
    # cap at the signal length: convolve(mode="same") returns max(len, width)
    # values, and a gain vector longer than the frames breaks broadcasting
    # for sub-window-length clips
    width = min(max(int(width), 1), max(x.size, 1))
    if width == 1:
        return x
    # mode="same" keeps output sample i = mean of x[i-((width-1)//2+?) ...];
    # precisely: out[i] = sum_{j} x[i + j - (width-1)//2 ... } — implement by
    # padded cumsum so indices outside [0, N) contribute zero, matching
    # convolve's zero extension
    lead = (width - 1) // 2  # np.convolve("same") centre offset
    cs = np.zeros(x.size + 1, dtype=np.float64)
    np.cumsum(x, dtype=np.float64, out=cs[1:])
    hi = np.minimum(np.arange(x.size) + lead + 1, x.size)
    lo = np.maximum(np.arange(x.size) + lead + 1 - width, 0)
    out = (cs[hi] - cs[lo]) * (1.0 / width)
    return out.astype(np.float32)


def _envelope(frames: np.ndarray, width: int) -> np.ndarray:
    """Smoothed channel-mean magnitude envelope."""
    mag = np.mean(np.abs(frames), axis=1, dtype=np.float64)
    return _box_mean(mag.astype(np.float32), width)


def _to_db(x: np.ndarray) -> np.ndarray:
    lvl = 20.0 * np.log10(np.maximum(np.asarray(x, dtype=np.float64), _TINY))
    return np.maximum(lvl, _DB_FLOOR).astype(np.float32)


def _mask_static(env_db, threshold_db, frames, fs, cfg):
    return env_db >= threshold_db


def _mask_adaptive(env_db, threshold_db, frames, fs, cfg):
    coarse = env_db >= threshold_db
    if not coarse.any():
        return coarse
    # score each sample by how far the envelope sits above its running
    # minimum, normalised to the 5th..95th percentile span, then let the
    # threshold breathe ±6 dB against that score
    rel = env_db - np.minimum.accumulate(env_db)
    lo, hi = (np.percentile(rel, q) for q in (5.0, 95.0))
    score = (rel - lo) / max(hi - lo, 1e-6)
    local_thr = np.clip(
        threshold_db + 6.0 * (1.0 - score), threshold_db - 6.0, threshold_db + 6.0
    )
    return env_db >= local_thr.astype(np.float32)


def _mask_transient(env_db, threshold_db, frames, fs, cfg):
    fast_w = max(1, round(cfg.transient_window_seconds * fs))
    slow_w = max(fast_w * 4, round(cfg.window_seconds * fs))
    fast_db = _to_db(_envelope(frames, fast_w))
    slow_db = _to_db(_envelope(frames, slow_w) + _TINY)
    return np.asarray(fast_db - slow_db >= cfg.transient_margin_db, dtype=bool)


_MASK_BUILDERS = {
    "static": _mask_static,
    "adaptive": _mask_adaptive,
    "transient": _mask_transient,
}


# --------------------------------------------------------------------------
# gating
# --------------------------------------------------------------------------


def _hold_open(mask: np.ndarray, before: int, after: int) -> np.ndarray:
    """Keep the gate open ``before``/``after`` samples around every active
    sample (morphological dilation via an interval difference array)."""
    if (before <= 0 and after <= 0) or not mask.any():
        return mask
    active = np.flatnonzero(mask)
    bumps = np.zeros(mask.size + 1, dtype=np.int64)
    np.add.at(bumps, np.maximum(active - before, 0), 1)
    np.add.at(bumps, np.minimum(active + after + 1, mask.size), -1)
    return np.cumsum(bumps[:-1]) > 0


def _fade_gain(mask: np.ndarray, fade: int) -> np.ndarray:
    """Boolean mask -> float gain with triangular ramps at gate edges.

    Parity note: like the reference (``squelch.py:85-96``, same
    max-normalised kernel + clip), the effective ramp saturates in
    ~sqrt(2*fade) samples rather than ``fade`` — the clip of an
    unnormalised triangular convolution IS the documented gate shape, so
    it is kept bit-for-bit rather than "fixed" into a different curve."""
    gate = mask.astype(np.float32, copy=False)
    if fade <= 0:
        return gate
    up = np.linspace(0.0, 1.0, fade + 1, dtype=np.float32)
    tri = np.concatenate((up[:-1], [np.float32(1.0)], up[1:][::-1]))
    tri /= float(tri.max(initial=1.0))
    half = tri.size // 2
    padded = np.pad(gate, half, mode="edge")
    ramped = np.convolve(padded, tri, mode="same")
    if half > 0:
        ramped = ramped[half:-half]
    return np.clip(ramped, 0.0, 1.0).astype(np.float32, copy=False)


def _trim_to_activity(
    frames: np.ndarray, gain: np.ndarray, fs: float, lead_s: float, trail_s: float
) -> np.ndarray:
    open_idx = np.flatnonzero(gain > _GATE_OPEN_EPS)
    if open_idx.size == 0:
        return frames[:0].copy()
    first = max(0, int(open_idx[0]) - max(0, round(fs * lead_s)))
    last = min(frames.shape[0], int(open_idx[-1]) + max(0, round(fs * trail_s)) + 1)
    return frames[first:last].copy()


def apply_squelch(
    audio: np.ndarray,
    sample_rate: float,
    config: SquelchConfig,
) -> tuple[np.ndarray, float, float]:
    """Gate + (optionally) trim ``audio``.

    Returns ``(cleaned_frames, noise_floor_db, threshold_db)``.
    """
    frames = _as_frames(audio)
    if frames.shape[0] == 0:
        # empty input (e.g. a previous run trimmed everything): nothing to
        # gate, and np.percentile on an empty envelope would raise
        return frames.astype(np.float32, copy=False), _DB_FLOOR, _DB_FLOOR
    env_db = _to_db(_envelope(frames, max(1, round(config.window_seconds * sample_rate))))
    floor_db = config.resolve_noise_floor(env_db)
    threshold_db = floor_db + config.threshold_margin_db

    try:
        build = _MASK_BUILDERS[config.method]
    except KeyError:
        raise ValueError(f"Unsupported squelch method: {config.method}") from None
    mask = build(env_db, threshold_db, frames, sample_rate, config)

    hold = round(sample_rate * config.hold_seconds)
    gain = _fade_gain(
        _hold_open(mask, hold, hold), round(sample_rate * config.fade_seconds)
    )
    gated = frames * gain[:, None]

    if config.trim_silence:
        gated = _trim_to_activity(
            gated, gain, sample_rate, config.trim_lead_seconds, config.trim_trail_seconds
        )
    else:
        gated = gated.copy()
    if gated.size == 0:
        gated = np.zeros((0, frames.shape[1]), dtype=np.float32)
    return gated.astype(np.float32, copy=False), floor_db, threshold_db


# --------------------------------------------------------------------------
# batch driver
# --------------------------------------------------------------------------


def gather_audio_targets(path: Path, options: AudioPostOptions) -> list[Path]:
    """Expand a file or directory into the list of processable inputs.

    Every file that is passed over gets a logged reason — in particular a
    WARNING naming the missing optional ``soundfile`` dependency for
    formats the reference would have processed via libsndfile."""
    if path.is_file():
        candidates: Iterable[Path] = [path]
    elif path.is_dir():
        candidates = sorted(path.iterdir())
    else:
        raise FileNotFoundError(f"No such file or directory: {path}")
    allowed = tuple(s.lower() for s in options.allowed_suffixes) or supported_suffixes()
    targets: list[Path] = []
    cleaned_tag = (options.cleaned_suffix or "-cleaned").lower()
    for p in candidates:
        if not p.is_file():
            continue
        if path.is_dir() and p.stem.lower().endswith(cleaned_tag):
            # a directory re-run must not reprocess its own outputs (the
            # batch would double with x-cleaned-cleaned.wav every pass);
            # an explicitly-passed file is honoured verbatim.  Deliberate
            # improvement over the reference, which re-gathers them.
            LOG.info("Skipping %s: already carries the %r output suffix.",
                     p, cleaned_tag)
            continue
        suffix = p.suffix.lower()
        if suffix in allowed:
            targets.append(p)
        elif suffix in _SOUNDFILE_SUFFIXES and _soundfile() is None:
            LOG.warning(
                "Skipping %s: reading %s needs the optional 'soundfile' "
                "package (pip install soundfile).",
                p,
                suffix,
            )
        elif suffix in (".wav", *_SOUNDFILE_SUFFIXES):
            LOG.warning("Skipping %s: %s not in the allowed set %s.", p, suffix, allowed)
        else:
            LOG.debug("Ignoring non-audio file %s", p)
    return targets


def _read_audio(path: Path) -> tuple[np.ndarray, float, str | None]:
    """(frames, rate, wav_codec_or_None) via the first-party WAV path or
    the optional soundfile fallback."""
    if path.suffix.lower() == ".wav":
        data, sample_rate = read_wav(path)
        codec = parse_wav_header(path).codec or "pcm_s16le"
        if codec not in {"pcm_u8", "pcm_s16le", "pcm_f32le"}:
            # s32/f64 inputs are readable but the streaming writer cannot
            # produce them: write float32 (lossless for the float32 frames
            # in hand — a silent s16 coercion would downconvert bit depth,
            # destructively so in overwrite mode) and say so
            LOG.warning(
                "%s: %s output is not supported; writing pcm_f32le.",
                path, codec,
            )
            codec = "pcm_f32le"
        return data, float(sample_rate), codec
    sf = _soundfile()
    if sf is None:
        raise RuntimeError(
            f"Reading {path.suffix} requires the optional 'soundfile' package."
        )
    data, rate = sf.read(str(path), always_2d=True, dtype="float32")
    return np.asarray(data), float(rate), None


def _write_audio(path: Path, frames: np.ndarray, rate: float, codec: str | None) -> None:
    if path.suffix.lower() == ".wav":
        with WavStreamWriter(
            path, int(rate), frames.shape[1], codec or "pcm_s16le"
        ) as writer:
            writer.write_float(frames)
        return
    sf = _soundfile()
    if sf is None:
        raise RuntimeError(
            f"Writing {path.suffix} requires the optional 'soundfile' package."
        )
    sf.write(str(path), frames, int(round(rate)))


def process_audio_file(path: Path, options: AudioPostOptions) -> SquelchFileResult:
    bytes_in = path.stat().st_size  # BEFORE overwrite mode rewrites the file
    data, sample_rate, codec = _read_audio(path)
    cleaned, floor_db, threshold_db = apply_squelch(
        data, float(sample_rate), options.config
    )

    if options.overwrite:
        out_path = path
    else:
        out_path = path.with_name(
            path.stem + (options.cleaned_suffix or "-cleaned") + path.suffix
        )
    _write_audio(out_path, cleaned, sample_rate, codec)

    n_in, n_out = int(data.shape[0]), int(cleaned.shape[0])
    return SquelchFileResult(
        input_path=path,
        output_path=out_path,
        samples_in=n_in,
        samples_out=n_out,
        duration_in=n_in / float(sample_rate),
        duration_out=n_out / float(sample_rate),
        bytes_in=bytes_in,
        bytes_out=out_path.stat().st_size,
        noise_floor_db=floor_db,
        threshold_db=threshold_db,
        method=options.config.method,
        retained_ratio=n_out / n_in if n_in else 0.0,
    )


def process_audio_batch(
    targets: Sequence[Path],
    options: AudioPostOptions,
    *,
    progress_cb: Callable[[int, int, Path], None] | None = None,
) -> SquelchSummary:
    """Run every target through :func:`process_audio_file`, collecting
    failures instead of aborting the batch."""
    done: list[SquelchFileResult] = []
    failed: list[tuple[Path, Exception]] = []
    for i, path in enumerate(targets):
        if progress_cb:
            progress_cb(i, len(targets), path)
        try:
            done.append(process_audio_file(path, options))
        except Exception as exc:  # pragma: no cover - surfaced to UI/CLI
            LOG.error("Audio post-processing failed for %s: %s", path, exc)
            failed.append((path, exc))
            continue
        if progress_cb:
            progress_cb(i + 1, len(targets), path)
    return SquelchSummary(results=done, errors=failed)
