"""Minimal stdlib .xlsx writer (zip of SpreadsheetML parts).

openpyxl is not installable in this sandbox, but an xlsx workbook is
just a zip of small XML documents — this module writes the subset the
Excel exporters (pipelines.excel, S7-S9 parity) need: multiple named
sheets, inline strings, numeric cells, and column widths. Files open
in Excel/LibreOffice and are round-trippable with zipfile +
ElementTree (which is how the tests read them back).
"""
from __future__ import annotations

import re
import zipfile
from typing import Any, Iterable, Optional
from xml.sax.saxutils import escape

# XML 1.0 forbids these outright — escape() does NOT handle them, and
# one raw control char corrupts the whole workbook. PDF-extracted text
# routinely carries \x0c form feeds.
_XML_INVALID_RE = re.compile(
    "[\x00-\x08\x0b\x0c\x0e-\x1f]")


def _xml_text(value: str) -> str:
    return escape(_XML_INVALID_RE.sub("", value))

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

# style index 1 = bold (section/header rows, S7-S9 visual parity with
# the reference's openpyxl Font(bold=True) usage, ref main.py:189-368)
_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<fonts count="2"><font><sz val="11"/><name val="Calibri"/></font>
<font><b/><sz val="11"/><name val="Calibri"/></font></fonts>
<fills count="1"><fill><patternFill patternType="none"/></fill></fills>
<borders count="1"><border/></borders>
<cellStyleXfs count="1"><xf/></cellStyleXfs>
<cellXfs count="2"><xf/><xf fontId="1" applyFont="1"/></cellXfs>
</styleSheet>"""

INVALID_SHEET_CHARS = set("[]:*?/\\")
MAX_SHEET_NAME = 31


def sanitize_sheet_name(name: str, max_length: int = MAX_SHEET_NAME) -> str:
    """Excel sheet-name rules: strip []:*?/\\ plus XML-invalid control
    chars and cap at 31 chars."""
    cleaned = "".join(ch for ch in _XML_INVALID_RE.sub("", name)
                      if ch not in INVALID_SHEET_CHARS).strip()
    return (cleaned or "Sheet")[:max_length]


def _col_letter(idx: int) -> str:
    """0-based column index -> A1-style letters."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, value: Any, bold: bool = False) -> str:
    if value is None or value == "":
        return ""
    s = ' s="1"' if bold else ""
    if isinstance(value, bool):
        return f'<c r="{ref}"{s} t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"{s} t="n"><v>{value}</v></c>'
    text = _xml_text(str(value))
    return (f'<c r="{ref}"{s} t="inlineStr"><is>'
            f'<t xml:space="preserve">{text}</t></is></c>')


class Workbook:
    """append-only workbook: add_sheet(...) then save(path)."""

    def __init__(self) -> None:
        self._sheets: list[tuple[str, list[list[Any]], Optional[list[float]],
                                 frozenset[int]]] = []

    def add_sheet(self, name: str, rows: list[list[Any]],
                  col_widths: Optional[list[float]] = None,
                  bold_rows: Optional[Iterable[int]] = None) -> str:
        """Add a sheet; the name is sanitized and uniqued. Returns the
        final sheet name (callers reference it from TOC sheets).
        ``bold_rows``: 0-based indices of rows rendered in the bold
        style (headers / section rows)."""
        base = sanitize_sheet_name(name)
        # Excel compares sheet names case-insensitively: 'ABC' vs 'abc'
        # is an illegal duplicate, so unique on the casefold
        existing = {n.casefold() for n, _, _, _ in self._sheets}
        final = base
        suffix = 1
        while final.casefold() in existing:
            tail = f"~{suffix}"
            final = base[:MAX_SHEET_NAME - len(tail)] + tail
            suffix += 1
        self._sheets.append((final, rows, col_widths,
                             frozenset(bold_rows or ())))
        return final

    @staticmethod
    def _sheet_xml(rows: list[list[Any]],
                   col_widths: Optional[list[float]],
                   bold_rows: frozenset[int] = frozenset()) -> str:
        parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
                 '<worksheet xmlns="http://schemas.openxmlformats.org/'
                 'spreadsheetml/2006/main">']
        if col_widths:
            cols = "".join(
                f'<col min="{i + 1}" max="{i + 1}" width="{w}" customWidth="1"/>'
                for i, w in enumerate(col_widths))
            parts.append(f"<cols>{cols}</cols>")
        parts.append("<sheetData>")
        for r, row in enumerate(rows, start=1):
            bold = (r - 1) in bold_rows
            cells = "".join(_cell_xml(f"{_col_letter(c)}{r}", v, bold)
                            for c, v in enumerate(row))
            parts.append(f'<row r="{r}">{cells}</row>')
        parts.append("</sheetData></worksheet>")
        return "".join(parts)

    def save(self, path: str) -> None:
        if not self._sheets:
            raise ValueError("workbook has no sheets")
        n = len(self._sheets)
        overrides = "\n".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
            'worksheet+xml"/>' for i in range(n))
        # attribute context: double quotes must be escaped too (escape()
        # alone leaves them, corrupting the workbook XML)
        sheets_xml = "".join(
            f'<sheet name="{escape(name, {chr(34): "&quot;"})}" '
            f'sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, (name, _, _, _) in enumerate(self._sheets))
        workbook_xml = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
            ' xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{sheets_xml}</sheets></workbook>")
        rels = "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>' for i in range(n))
        rels += (f'<Relationship Id="rId{n + 1}" Type="http://schemas.openxmlformats.'
                 'org/officeDocument/2006/relationships/styles" Target="styles.xml"/>')
        workbook_rels = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
            f'relationships">{rels}</Relationships>')

        with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr("[Content_Types].xml",
                       _CONTENT_TYPES.format(sheet_overrides=overrides))
            z.writestr("_rels/.rels", _ROOT_RELS)
            z.writestr("xl/workbook.xml", workbook_xml)
            z.writestr("xl/_rels/workbook.xml.rels", workbook_rels)
            z.writestr("xl/styles.xml", _STYLES)
            for i, (_, rows, widths, bold) in enumerate(self._sheets):
                z.writestr(f"xl/worksheets/sheet{i + 1}.xml",
                           self._sheet_xml(rows, widths, bold))
