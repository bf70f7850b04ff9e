"""Qt GUI tests (reference tests/test_interactive_qt.py analogue).

Skipped automatically when PySide6 is unavailable (headless CI without the
gui extra); run under offscreen/xvfb where it is installed.
"""

from __future__ import annotations

import numpy as np
import pytest

PySide6 = pytest.importorskip("PySide6")

import os

os.environ.setdefault("QT_QPA_PLATFORM", "offscreen")

from PySide6.QtWidgets import QApplication  # noqa: E402

from conftest import make_tone_iq, write_wav_iq  # noqa: E402


@pytest.fixture(scope="session")
def qapp():
    app = QApplication.instance() or QApplication([])
    yield app


@pytest.fixture
def window(qapp):
    from iq_to_audio_tpu.interactive.app import InteractiveWindow

    win = InteractiveWindow(base_kwargs={"bandwidth": 12_500.0, "demod_mode": "nfm"})
    yield win
    win.close()


class TestWindowConstruction:
    def test_pages_and_panels(self, window):
        assert window.pages.count() == 3
        assert window.state.bandwidth == 12_500.0
        assert window.state.demod_mode == "nfm"

    def test_status_routing(self, window):
        window._status("hello status")
        assert window.status_panel.status_label.text() == "hello status"

    def test_demod_agc_constraint(self, window):
        panel = window.demod_panel
        panel.combo.setCurrentIndex(2)  # usb
        assert window.state.demod_mode == "usb"
        assert panel.agc_check.isEnabled()
        panel.agc_check.setChecked(False)
        panel.combo.setCurrentIndex(0)  # nfm: AGC not applicable
        assert not panel.agc_check.isEnabled()
        panel.combo.setCurrentIndex(3)  # lsb: preference restored
        assert window.state.demod_mode == "lsb"
        assert not window.state.agc_enabled

    def test_targets_panel_roundtrip(self, window):
        window.state.add_target(145_000_000.0)
        window.state.add_target(146_000_000.0)
        window.targets_panel.refresh()
        assert "145.000000" in window.targets_panel._rows[0][0].text()
        window.targets_panel._remove(0)
        assert window.state.targets == [146_000_000.0]

    def test_confirm_without_file_keeps_empty_result(self, window):
        window._confirm_run()
        assert window.result.configs == []


class TestFileFlow:
    def test_load_file_detects_everything(self, qapp, tmp_path):
        from iq_to_audio_tpu.interactive.app import InteractiveWindow

        fs = 96_000.0
        iq = make_tone_iq(fs, 0.2, 10_000.0)
        path = write_wav_iq(tmp_path / "baseband_145000000Hz_t.wav", iq, int(fs))
        win = InteractiveWindow()
        try:
            win._load_file(path)
            assert win.state.sample_rate == fs
            assert win.state.center_freq == 145_000_000.0
            assert win.state.center_freq_source == "filename:sdrpp"
            assert win._input_spec is not None
        finally:
            win.close()

    def test_confirm_run_builds_configs(self, qapp, tmp_path):
        from iq_to_audio_tpu.interactive.app import InteractiveWindow

        fs = 96_000.0
        iq = make_tone_iq(fs, 0.2, 10_000.0)
        path = write_wav_iq(tmp_path / "baseband_145000000Hz_c.wav", iq, int(fs))
        win = InteractiveWindow()
        try:
            win._load_file(path)
            win.state.add_target(145_010_000.0)
            win._confirm_run()
            assert len(win.result.configs) == 1
            cfg = win.result.configs[0]
            assert cfg.target_freq == 145_010_000.0
            assert cfg.center_freq == 145_000_000.0
        finally:
            win.close()
