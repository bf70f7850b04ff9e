"""Seeded random-configuration differential sweep.

The golden tests in test_pipeline.py pin specific mode/codec combinations;
this sweep samples the *interaction space* (sample rate x codec x IQ order
x demod mode x AGC x bandwidth x offset sign) with a seeded rng and checks
every draw end-to-end against the float64 reference twin.  The twin reads
the capture back through the same raw-byte conversion the pipeline uses,
so codec quantisation cancels and the comparison isolates the device
chain's numerics (the reference's test strategy tier 2 with randomised
geometry — reference tests/conftest.py hypothesis strategies).

``IQ2A_SWEEP_N`` scales the number of draws (default 3 — each draw costs a
fresh XLA compile on CPU).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from conftest import error_db, make_am_iq, make_nfm_iq, make_tone_iq

from iq_to_audio_tpu import ProcessingConfig, ProcessingPipeline
from iq_to_audio_tpu.io.formats import get_format
from iq_to_audio_tpu.io.reader import IQReader, convert_to_complex
from iq_to_audio_tpu.io.writer import read_wav, write_stereo_wav
from iq_to_audio_tpu.ops.resample import ResamplePlan
from iq_to_audio_tpu.pipeline.filters import compute_decimation, design_channel_filter
from iq_to_audio_tpu.ref.chain import RefResampler, ref_demod_chain

CENTER = 145_000_000.0

_CODECS = ["pcm_s16le", "pcm_u8", "pcm_f32le"]
_ORDERS = ["iq", "qi", "iq_inv", "qi_inv"]
_MODES = ["nfm", "am", "usb", "lsb"]
_RATES = [250_000.0, 384_000.0]


def _draw(rng: np.random.Generator) -> dict:
    mode = _MODES[rng.integers(len(_MODES))]
    return {
        "fs": _RATES[rng.integers(len(_RATES))],
        "mode": mode,
        "agc": bool(rng.integers(2)) if mode in ("usb", "lsb") else False,
        "codec": _CODECS[rng.integers(len(_CODECS))],
        "order": _ORDERS[rng.integers(len(_ORDERS))],
        "offset": float(rng.choice([-22_000.0, 18_000.0, 25_000.0])),
        "bandwidth": float(rng.choice([8_000.0, 12_500.0])),
    }


def _make_signal(draw: dict) -> np.ndarray:
    fs, off = draw["fs"], draw["offset"]
    if draw["mode"] == "nfm":
        return make_nfm_iq(fs, 0.6, off)
    if draw["mode"] == "am":
        return make_am_iq(fs, 0.6, off)
    tone = off + (1_000.0 if draw["mode"] == "usb" else -1_000.0)
    return make_tone_iq(fs, 0.6, tone, amplitude=0.4)


def _capture_as_seen(path, codec: str, order: str) -> np.ndarray:
    """The complex64 stream exactly as the pipeline will interpret the
    written file (codec quantisation + IQ-order reinterpretation)."""
    spec = get_format("wav", codec)
    with IQReader(path, 1 << 20, order, spec, prefetch_depth=0) as reader:
        blocks = [
            convert_to_complex(raw, codec, order) for raw in reader.iter_raw()
        ]
    return np.concatenate(blocks)


@pytest.mark.parametrize(
    "seed", range(int(os.environ.get("IQ2A_SWEEP_N", "3")))
)
def test_random_config_matches_float64_twin(tmp_path, seed):
    rng = np.random.default_rng(1234 + seed)
    draw = _draw(rng)
    fs = draw["fs"]
    iq = _make_signal(draw)
    path = tmp_path / f"baseband_{int(CENTER)}Hz_sweep{seed}.wav"
    write_stereo_wav(
        path, np.column_stack([iq.real, iq.imag]), int(fs), codec=draw["codec"]
    )
    out = tmp_path / f"audio{seed}.wav"
    dump = tmp_path / f"chan{seed}.cf32"
    cfg = ProcessingConfig(
        in_path=path,
        target_freq=CENTER + draw["offset"],
        bandwidth=draw["bandwidth"],
        demod_mode=draw["mode"],
        agc_enabled=draw["agc"],
        iq_order=draw["order"],
        output_path=out,
        dump_iq_path=dump if draw["agc"] else None,
    )
    result = ProcessingPipeline(cfg).run()

    got, rate = read_wav(out)
    got = got[:, 0]
    assert rate == 48_000

    decim, fs_ch = compute_decimation(fs, 96_000.0)
    if draw["agc"]:
        # the feedback AGC amplifies upstream f32-vs-f64 ulps by 25-40 dB
        # (see test_pipeline.test_golden_ssb_agc_on), so AGC draws pin the
        # twin to the device's own dumped channel stream — same technique,
        # randomised geometry
        from iq_to_audio_tpu.ref.chain import RefAGC, RefDCBlocker

        raw_ch = np.fromfile(dump, dtype=np.complex64)
        analytic = np.conj(raw_ch) if draw["mode"] == "lsb" else raw_ch
        audio_ch = RefDCBlocker().process(analytic.real.astype(np.float64))
        audio_ch = RefAGC().process(audio_ch)
    else:
        taps = design_channel_filter(fs, draw["bandwidth"], decim)
        seen = _capture_as_seen(path, draw["codec"], draw["order"])
        audio_ch, _ = ref_demod_chain(
            seen.astype(np.complex128),
            sample_rate=fs,
            freq_offset=draw["offset"],
            taps=taps,
            decimation=decim,
            mode=draw["mode"],
            agc_enabled=False,
            mix_sign=result.mix_sign,
        )
    plan = ResamplePlan.create(fs_ch, 48_000.0, 1)
    ref = np.clip(RefResampler(plan.up, plan.down).resample_all(audio_ch), -0.99, 0.99)

    n = min(got.size, ref.size)
    assert abs(got.size - ref.size) <= 2, draw
    assert n > int(0.5 * 48_000), draw
    err = error_db(got[:n], ref[:n])
    assert err < -55.0, f"{draw} -> {err:.1f} dB"
