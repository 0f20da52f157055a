"""Excel exporters (S7-S9): workbook structure, ordering contract,
sheet-name rules, numeric cells — read back with stdlib zipfile +
ElementTree (no openpyxl in this sandbox)."""
import zipfile
import xml.etree.ElementTree as ET

import pytest

from pdf_context_extractor_agent_ray.oracle.extractor import extract_doc_dict
from pdf_context_extractor_agent_ray.pipelines.excel import (
    STATEMENT_HEADER,
    statement_sheet_rows,
    write_multi_statement_workbook,
    write_notes_workbook,
    write_statement_workbook,
)
from pdf_context_extractor_agent_ray.synth import generate_doc
from pdf_context_extractor_agent_ray.xlsxlite import Workbook, sanitize_sheet_name

NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _read_workbook(path):
    """{sheet_name: [[cell, ...], ...]} with numeric cells as floats."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        names = [s.get("name") for s in wb.iter(f"{NS}sheet")]
        out = {}
        for i, name in enumerate(names):
            root = ET.fromstring(z.read(f"xl/worksheets/sheet{i + 1}.xml"))
            rows = []
            for row in root.iter(f"{NS}row"):
                cells = []
                for c in row.iter(f"{NS}c"):
                    col = 0
                    for ch in c.get("r"):
                        if ch.isalpha():
                            col = col * 26 + ord(ch) - ord("A") + 1
                    while len(cells) < col - 1:
                        cells.append("")  # writer omits empty cells
                    if c.get("t") == "inlineStr":
                        t = c.find(f"{NS}is/{NS}t")
                        cells.append(t.text or "")
                    elif c.get("t") == "b":
                        cells.append(bool(int(c.find(f"{NS}v").text)))
                    else:
                        cells.append(float(c.find(f"{NS}v").text))
                rows.append(cells)
            out[name] = rows
    return out


def _row_dict(doc):
    r = extract_doc_dict(doc)
    r["spans"] = [{"kind": k, "text": t, "media_ref": m, "offset": o}
                  for (k, t, m, o) in r["spans"]]
    return r


@pytest.fixture(scope="module")
def bs_row():
    return _row_dict(generate_doc("xlsx-001", family="bs_simple"))


@pytest.fixture(scope="module")
def notes_row():
    return _row_dict(generate_doc("xlsx-notes-01", family="notes_only"))


def test_sanitize_sheet_name():
    assert sanitize_sheet_name("a[b]c:d*e?f/g\\h") == "abcdefgh"
    assert len(sanitize_sheet_name("x" * 99)) == 31
    assert sanitize_sheet_name("   ") == "Sheet"


def test_sheet_name_with_quotes_survives(tmp_path):
    """Sheet names land in an XML attribute: double quotes must be
    escaped or the whole workbook is corrupt (model-provided note
    titles can contain anything sanitize doesn't strip)."""
    wb = Workbook()
    name = wb.add_sheet('9_Series "A" <notes>', [["x"]])
    path = str(tmp_path / "q.xlsx")
    wb.save(path)
    sheets = _read_workbook(path)
    assert sheets[name] == [["x"]]


def test_workbook_roundtrip_and_name_uniquing(tmp_path):
    wb = Workbook()
    n1 = wb.add_sheet("Data", [["a", 1.5], ["b", True]])
    n2 = wb.add_sheet("Data", [["dup"]])
    path = str(tmp_path / "t.xlsx")
    wb.save(path)
    sheets = _read_workbook(path)
    assert n1 == "Data" and n2 == "Data~1"
    assert sheets["Data"] == [["a", 1.5], ["b", True]]
    assert sheets["Data~1"] == [["dup"]]


def test_statement_workbook_s7(tmp_path, bs_row):
    path = str(tmp_path / "s7.xlsx")
    write_statement_workbook(bs_row, path)
    sheets = _read_workbook(path)
    assert set(sheets) == {"Summary", "合并资产负债表"}
    body = sheets["合并资产负债表"]
    assert body[0][0] == "合并资产负债表"
    assert body[2] == STATEMENT_HEADER
    # section transition rows appear in statement order
    sections = [r[0] for r in body if r and r[0] in ("资产", "负债", "所有者权益")]
    assert sections == ["资产", "负债", "所有者权益"]
    # item rows keep the statement's original order and numeric amounts
    item_rows = [r for r in body[3:] if len(r) >= 5 and r[2]]
    assert item_rows, "no item rows"
    assert all(isinstance(r[4], float) for r in item_rows if r[4] != "")
    expected_names = [s["text"].split("|")[1] for s in bs_row["spans"]
                      if s["kind"] in ("item", "subtotal", "total")]
    assert [r[2] for r in item_rows] == expected_names
    # summary carries the verdict
    assert sheets["Summary"][0][0] == "doc_id"
    assert sheets["Summary"][1][0] == bs_row["doc_id"]


def test_multi_statement_workbook_s8(tmp_path):
    rows = [_row_dict(generate_doc("xlsx-m1", family="bs_simple")),
            _row_dict(generate_doc("xlsx-m2", family="income")),
            _row_dict(generate_doc("xlsx-m3", family="no_statement"))]
    path = str(tmp_path / "s8.xlsx")
    write_multi_statement_workbook(rows, path)
    sheets = _read_workbook(path)
    # summary lists all docs; only statement docs get sheets
    assert len(sheets["Summary"]) == 4
    assert "xlsx-m1" in sheets and "xlsx-m2" in sheets
    assert "xlsx-m3" not in sheets
    assert sheets["xlsx-m2"][0][0] == "合并利润表"


def test_notes_workbook_s9(tmp_path, notes_row):
    path = str(tmp_path / "s9.xlsx")
    assert write_notes_workbook(notes_row, path)
    sheets = _read_workbook(path)
    toc = sheets["目录"]
    assert toc[0] == ["编号", "标题", "级别", "页码", "Sheet"]
    n_titles = sum(1 for s in notes_row["spans"] if s["kind"] == "note_title")
    assert len(toc) == n_titles + 1
    # every TOC entry points at an existing sheet whose title matches
    for number, title, level, page, sheet in toc[1:]:
        assert sheet in sheets
        assert sheets[sheet][0][0].startswith(str(number))
    # a doc with no notes writes nothing
    empty = _row_dict(generate_doc("xlsx-nonotes", family="no_statement"))
    assert not write_notes_workbook(empty, str(tmp_path / "none.xlsx"))


def test_statement_rows_no_statement():
    row = _row_dict(generate_doc("xlsx-empty", family="no_statement"))
    rows = statement_sheet_rows(row)
    assert rows[0][0] == "财务报表" and len(rows) == 3  # title/blank/header only


def test_bold_styles_written(tmp_path, bs_row):
    """S7 styling parity (minimal): styles.xml declares a bold font +
    cellXf, and the title/header/section rows carry s="1" while item
    rows do not (unzip-and-grep, no openpyxl)."""
    path = str(tmp_path / "styled.xlsx")
    write_statement_workbook(bs_row, path)
    with zipfile.ZipFile(path) as z:
        styles = z.read("xl/styles.xml").decode()
        assert "<b/>" in styles and 'fontId="1"' in styles
        sheet2 = z.read("xl/worksheets/sheet2.xml").decode()
    root = ET.fromstring(sheet2)
    rows = {int(r.get("r")): r for r in root.iter(f"{NS}row")}
    def styled(r):
        return [c.get("s") for c in rows[r].iter(f"{NS}c")]
    assert all(s == "1" for s in styled(1)), "title row bold"
    assert all(s == "1" for s in styled(3)), "header row bold"
    # an item row (cols 2+ populated) must NOT be bold
    body = statement_sheet_rows(bs_row)
    item_idx = next(i for i, row in enumerate(body[3:], start=3)
                    if any(row[2:]))
    assert all(s is None for s in styled(item_idx + 1)), "item row plain"
    # at least one section transition row is bold
    sec_idx = next(i for i, row in enumerate(body[3:], start=3)
                   if (row[0] or row[1]) and not any(row[2:]))
    assert all(s == "1" for s in styled(sec_idx + 1)), "section row bold"


def test_notes_workbook_bold_toc_and_table_labels(tmp_path, notes_row):
    path = str(tmp_path / "notes_styled.xlsx")
    assert write_notes_workbook(notes_row, path)
    with zipfile.ZipFile(path) as z:
        toc = z.read("xl/worksheets/sheet1.xml").decode()
    root = ET.fromstring(toc)
    first = next(r for r in root.iter(f"{NS}row") if r.get("r") == "1")
    assert all(c.get("s") == "1" for c in first.iter(f"{NS}c"))
