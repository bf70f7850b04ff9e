"""Qt stylesheet and palette for the interactive UI (reference
``interactive/styles.py``)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ColorPalette:
    window: str = "#1e222a"
    surface: str = "#262b35"
    surface_alt: str = "#2d333f"
    border: str = "#3a4150"
    text: str = "#e8eaf0"
    text_dim: str = "#9aa3b5"
    accent: str = "#4f9dff"
    accent_dim: str = "#2d5f9e"
    warning: str = "#e0b04c"
    error: str = "#e06c75"
    success: str = "#7cc379"


PALETTE = ColorPalette()

DARK_STYLESHEET = f"""
QWidget {{
    background-color: {PALETTE.window};
    color: {PALETTE.text};
    font-size: 13px;
}}
QMainWindow::separator {{ background: {PALETTE.border}; width: 2px; }}
QGroupBox {{
    background-color: {PALETTE.surface};
    border: 1px solid {PALETTE.border};
    border-radius: 6px;
    margin-top: 14px;
    padding: 8px 6px 6px 6px;
    font-weight: 600;
}}
QGroupBox::title {{
    subcontrol-origin: margin;
    left: 10px;
    padding: 0 4px;
    color: {PALETTE.text_dim};
}}
QPushButton {{
    background-color: {PALETTE.surface_alt};
    border: 1px solid {PALETTE.border};
    border-radius: 4px;
    padding: 5px 14px;
}}
QPushButton:hover {{ border-color: {PALETTE.accent}; }}
QPushButton:pressed {{ background-color: {PALETTE.accent_dim}; }}
QPushButton:disabled {{ color: {PALETTE.text_dim}; }}
QLineEdit, QComboBox, QSpinBox, QDoubleSpinBox {{
    background-color: {PALETTE.surface_alt};
    border: 1px solid {PALETTE.border};
    border-radius: 4px;
    padding: 3px 6px;
    selection-background-color: {PALETTE.accent_dim};
}}
QComboBox::drop-down {{ border: none; width: 18px; }}
QProgressBar {{
    background-color: {PALETTE.surface_alt};
    border: 1px solid {PALETTE.border};
    border-radius: 4px;
    text-align: center;
    height: 16px;
}}
QProgressBar::chunk {{ background-color: {PALETTE.accent_dim}; border-radius: 3px; }}
QTableWidget {{
    background-color: {PALETTE.surface};
    gridline-color: {PALETTE.border};
    border: 1px solid {PALETTE.border};
}}
QHeaderView::section {{
    background-color: {PALETTE.surface_alt};
    border: none;
    border-right: 1px solid {PALETTE.border};
    padding: 4px;
}}
QToolBar {{ background: {PALETTE.surface}; border-bottom: 1px solid {PALETTE.border}; spacing: 6px; }}
QStatusBar {{ background: {PALETTE.surface}; border-top: 1px solid {PALETTE.border}; }}
QLabel[dim="true"] {{ color: {PALETTE.text_dim}; }}
QCheckBox::indicator {{ width: 14px; height: 14px; }}
QPlainTextEdit, QTextEdit {{
    background-color: #14171d;
    border: 1px solid {PALETTE.border};
    font-family: monospace;
}}
QTabBar::tab {{
    background: {PALETTE.surface_alt};
    border: 1px solid {PALETTE.border};
    padding: 6px 16px;
    border-top-left-radius: 4px;
    border-top-right-radius: 4px;
}}
QTabBar::tab:selected {{ background: {PALETTE.surface}; border-bottom-color: {PALETTE.surface}; }}
"""
