"""Base-14 standard font metrics (public Adobe Core 14 AFM data).

Fallback widths for fonts that ship no /Widths array — the reference loads
the full AFM files from its resource dir (page_font.h:313-366 falls back to
base-14 metrics; docling_parse/pdf_resources/fonts/standard/). We embed the
standard-encoding width tables for the printable ASCII range (codes 32-126)
of the four families; Courier is fixed-pitch 600. Widths are 1/1000 em.

Source: Adobe Core 14 AFM files (public, redistributable metrics).
"""

from __future__ import annotations

# codes 32..126 in order
_HELVETICA = [
    278, 278, 355, 556, 556, 889, 667, 191, 333, 333, 389, 584, 278, 333,
    278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 278, 278,
    584, 584, 584, 556, 1015, 667, 667, 722, 722, 667, 611, 778, 722, 278,
    500, 667, 556, 833, 722, 778, 667, 778, 722, 667, 611, 722, 667, 944,
    667, 667, 611, 278, 278, 278, 469, 556, 333, 556, 556, 500, 556, 556,
    278, 556, 556, 222, 222, 500, 222, 833, 556, 556, 556, 556, 333, 500,
    278, 556, 500, 722, 500, 500, 500, 334, 260, 334, 584,
]
_HELVETICA_BOLD = [
    278, 333, 474, 556, 556, 889, 722, 238, 333, 333, 389, 584, 278, 333,
    278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 333, 333,
    584, 584, 584, 611, 975, 722, 722, 722, 722, 667, 611, 778, 722, 278,
    556, 722, 611, 833, 722, 778, 667, 778, 722, 667, 611, 722, 667, 944,
    667, 667, 611, 333, 278, 333, 584, 556, 333, 556, 611, 556, 611, 556,
    333, 611, 611, 278, 278, 556, 278, 889, 611, 611, 611, 611, 389, 556,
    333, 611, 556, 778, 556, 556, 500, 389, 280, 389, 584,
]
_TIMES_ROMAN = [
    250, 333, 408, 500, 500, 833, 778, 180, 333, 333, 500, 564, 250, 333,
    250, 278, 500, 500, 500, 500, 500, 500, 500, 500, 500, 500, 278, 278,
    564, 564, 564, 444, 921, 722, 667, 667, 722, 611, 556, 722, 722, 333,
    389, 722, 611, 889, 722, 722, 556, 722, 667, 556, 611, 722, 722, 944,
    722, 722, 611, 333, 278, 333, 469, 500, 333, 444, 500, 444, 500, 444,
    333, 500, 500, 278, 278, 500, 278, 778, 500, 500, 500, 500, 333, 389,
    278, 500, 500, 722, 500, 500, 444, 480, 200, 480, 541,
]
_TIMES_BOLD = [
    250, 333, 555, 500, 500, 1000, 833, 278, 333, 333, 500, 570, 250, 333,
    250, 278, 500, 500, 500, 500, 500, 500, 500, 500, 500, 500, 333, 333,
    570, 570, 570, 500, 930, 722, 667, 722, 722, 667, 611, 778, 778, 389,
    500, 778, 667, 944, 722, 778, 611, 778, 722, 556, 667, 722, 722, 1000,
    722, 722, 667, 333, 278, 333, 581, 500, 333, 500, 556, 444, 556, 444,
    333, 500, 556, 278, 333, 556, 278, 833, 556, 500, 556, 556, 444, 389,
    333, 556, 500, 722, 500, 500, 444, 394, 220, 394, 520,
]

BASE14_WIDTHS: dict[str, dict[int, float]] = {}


def _register(names: list[str], table: list[float] | float) -> None:
    for name in names:
        if isinstance(table, (int, float)):
            BASE14_WIDTHS[name] = {c: float(table) for c in range(32, 127)}
        else:
            BASE14_WIDTHS[name] = {32 + i: float(w) for i, w in enumerate(table)}


_register(["Helvetica", "Arial", "Helvetica-Oblique", "Arial-Italic"], _HELVETICA)
_register(["Helvetica-Bold", "Arial-Bold", "Helvetica-BoldOblique", "Arial-BoldItalic"], _HELVETICA_BOLD)
_register(["Times-Roman", "TimesNewRoman", "Times-Italic", "Times"], _TIMES_ROMAN)
_register(["Times-Bold", "Times-BoldItalic", "TimesNewRoman-Bold"], _TIMES_BOLD)
_register(["Courier", "Courier-Bold", "Courier-Oblique", "Courier-BoldOblique", "CourierNew"], 600.0)
_register(["Symbol"], 500.0)
_register(["ZapfDingbats"], 700.0)


def base14_width(base_font: str, code: int) -> float | None:
    """Width for a base-14 font (subset-tag and style-suffix tolerant)."""
    if not isinstance(base_font, str):
        return None
    name = base_font.split("+")[-1]  # strip 'ABCDEF+' subset tags
    table = BASE14_WIDTHS.get(name)
    if table is None:
        stem = name.split(",")[0]
        table = BASE14_WIDTHS.get(stem)
    if table is None:
        return None
    return table.get(code)
