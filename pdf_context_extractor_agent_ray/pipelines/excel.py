"""Excel export sinks (S7-S9 parity over the span model).

The reference writes three workbook shapes:
- S7 per-document statement workbook: Summary sheet + an ordered
  statement sheet with 部分/类别 transition rows
  (main.py:144-390);
- S8 multi-statement workbook: one statement sheet per document plus a
  summary index (tools/export_all_statements.py);
- S9 notes workbook: a TOC sheet linking one content sheet per note,
  tables written with numeric cells where the value parses
  (tools/export_notes_to_excel.py:33-458).

Here these are DRIVER-SIDE sinks over the extraction output Dataset:
xlsx is a human-scale report format (one workbook per document /
per selection), so the exporters stream ``iter_rows`` up to an
explicit ``limit`` — they are deliberately not distributed sinks; the
at-scale columnar exports are the parquet/CSV/JSON writers in
``pipelines.export``.
"""
from __future__ import annotations

import os
from typing import Any, Iterable, Optional

from ..patterns import CELL_SEP, ROW_SEP
from ..xlsxlite import Workbook, sanitize_sheet_name

EXCEL_EXPORT_LIMIT = 100  # workbooks per export call unless overridden

_ITEM_KINDS = {"item", "subtotal", "total"}

STATEMENT_TITLES = {
    "balance_sheet": "合并资产负债表",
    "income_statement": "合并利润表",
    "cash_flow": "合并现金流量表",
}

STATEMENT_HEADER = ["部分", "类别", "项目名称", "原始名称",
                    "本期末金额", "上期末金额", "附注"]
STATEMENT_COL_WIDTHS = [15, 15, 20, 20, 15, 15, 10]

_SECTION_CN = {
    "assets": "资产", "liabilities": "负债", "equity": "所有者权益",
    "liabilities_and_equity_total": "",
    "revenue": "营业总收入", "costs": "营业总成本", "profit": "利润",
    "eps": "每股收益", "comprehensive_income": "综合收益",
    "operating_activities": "经营活动", "investing_activities": "投资活动",
    "financing_activities": "筹资活动", "other_items": "其他",
}

_CATEGORY_CN = {
    "current_assets": "流动资产", "non_current_assets": "非流动资产",
    "current_liabilities": "流动负债", "non_current_liabilities": "非流动负债",
    "items": "",
}


import re as _re

# strict decimal shape: float() alone would also accept 'nan', 'inf'
# (non-finite <v> corrupts the sheet) and '1_000' (silent misparse)
_NUM_RE = _re.compile(r"-?\d+(\.\d+)?")


def _is_numeric(value: Any) -> bool:
    if value is None or value == "":
        return False
    if isinstance(value, (int, float)):
        import math
        return math.isfinite(value)
    return bool(_NUM_RE.fullmatch(str(value).replace(",", "")))


def _safe_filename(doc_id: str) -> str:
    """doc_ids come from arbitrary user parquet: a '/' would target a
    subdirectory (crash) and '..' could escape out_dir — keep the
    workbook strictly inside the export dir."""
    cleaned = _re.sub(r"[^\w.\-一-鿿]", "_", str(doc_id))
    return cleaned.lstrip(".") or "doc"


def _as_cell(value: str) -> Any:
    """Amount strings become numeric cells when they parse (the notes
    writer's behavior); everything else stays text."""
    if _is_numeric(value):
        return float(str(value).replace(",", ""))
    return value


def _doc_items(row: dict[str, Any]) -> list[tuple[str, str, str, str, str, str, str]]:
    """(kind, section, standard, original, current, previous, note)
    tuples for the doc's statement spans, in span order."""
    from ..docproc import decode_item_text
    out = []
    for s in row["spans"]:
        if s["kind"] in _ITEM_KINDS:
            dec = decode_item_text(s["text"])
            if dec is not None:
                out.append((s["kind"], *dec))
    return out


def statement_sheet_rows(row: dict[str, Any]) -> list[list[Any]]:
    """S7 sheet body: title, blank, header, then items in the original
    order with 部分/类别 transition rows exactly when the section path
    changes scope."""
    title = STATEMENT_TITLES.get(row.get("statement_type", ""), "财务报表")
    rows: list[list[Any]] = [[title, "", "", "", "", "", ""],
                             ["", "", "", "", "", "", ""],
                             STATEMENT_HEADER[:]]
    cur_section: Optional[str] = None
    cur_category: Optional[str] = None
    for _kind, section, standard, orig, cur, prev, note in _doc_items(row):
        head, _, tail = section.partition(".")
        sec_cn = _SECTION_CN.get(head, head)
        cat_cn = _CATEGORY_CN.get(tail, "") if tail and not tail.endswith("_total") else ""
        if sec_cn and sec_cn != cur_section:
            cur_section = sec_cn
            cur_category = None
            rows.append([sec_cn, "", "", "", "", "", ""])
        if cat_cn and cat_cn != cur_category:
            cur_category = cat_cn
            rows.append(["", cat_cn, "", "", "", "", ""])
        rows.append(["", "", standard, orig, _as_cell(cur), _as_cell(prev), note])
    return rows


def statement_bold_rows(rows: list[list[Any]]) -> set[int]:
    """Row indices rendered bold in a statement sheet: the title (0),
    the column header (2), and every 部分/类别 transition row (only
    cols 0-1 populated) — visual parity with the reference's
    Font(bold=True) on those rows (ref main.py:189-368)."""
    bold = {0, 2}
    for i, row in enumerate(rows[3:], start=3):
        if (row[0] or row[1]) and not any(row[2:]):
            bold.add(i)
    return bold


def _summary_rows(rows: Iterable[dict[str, Any]]) -> list[list[Any]]:
    out = [["doc_id", "statement_type", "valid", "confidence", "n_spans", "errors"]]
    for r in rows:
        out.append([r["doc_id"], r.get("statement_type", ""),
                    bool(r.get("valid")), float(r.get("confidence") or 0.0),
                    len(r["spans"]), "; ".join(r.get("errors") or [])])
    return out


def write_statement_workbook(row: dict[str, Any], path: str) -> None:
    """S7: one document -> Summary + statement sheet."""
    wb = Workbook()
    wb.add_sheet("Summary", _summary_rows([row]), bold_rows={0})
    body = statement_sheet_rows(row)
    wb.add_sheet(STATEMENT_TITLES.get(row.get("statement_type", ""), "报表"),
                 body, col_widths=STATEMENT_COL_WIDTHS,
                 bold_rows=statement_bold_rows(body))
    wb.save(path)


def write_multi_statement_workbook(rows: list[dict[str, Any]], path: str) -> None:
    """S8: many documents -> one workbook; a Summary index sheet plus
    one statement sheet per document that parsed a statement."""
    wb = Workbook()
    with_statement = [r for r in rows if r.get("statement_type")]
    wb.add_sheet("Summary", _summary_rows(rows), bold_rows={0})
    for r in with_statement:
        body = statement_sheet_rows(r)
        wb.add_sheet(r["doc_id"], body, col_widths=STATEMENT_COL_WIDTHS,
                     bold_rows=statement_bold_rows(body))
    wb.save(path)


def _doc_notes(row: dict[str, Any]) -> list[dict[str, Any]]:
    """Group note_title / note_text / note_table spans into note dicts
    (number, level, title, page, text, tables)."""
    notes: list[dict[str, Any]] = []
    for s in row["spans"]:
        if s["kind"] == "note_title":
            number, level, title = s["text"].split("|", 2)
            notes.append({"number": number, "level": int(level), "title": title,
                          "page": s["media_ref"], "text": "", "tables": []})
        elif s["kind"] == "note_text" and notes:
            notes[-1]["text"] = s["text"]
        elif s["kind"] == "note_table" and notes:
            tab = [r.split(CELL_SEP) for r in s["text"].split(ROW_SEP)]
            notes[-1]["tables"].append({"ref": s["media_ref"], "rows": tab})
    return notes


def write_notes_workbook(row: dict[str, Any], path: str) -> bool:
    """S9: one document -> TOC sheet + one content sheet per note.
    Returns False (and writes nothing) when the doc has no notes."""
    notes = _doc_notes(row)
    if not notes:
        return False
    wb = Workbook()
    toc = [["编号", "标题", "级别", "页码", "Sheet"]]
    planned: list[tuple[str, list[list[Any]], set[int]]] = []
    for note in notes:
        body: list[list[Any]] = [[f"{note['number']} {note['title']}"],
                                 [f"级别: {note['level']}  页码: {note['page']}"],
                                 []]
        bold = {0}  # note title row
        if note["text"]:
            body.append([note["text"]])
            body.append([])
        for tab in note["tables"]:
            bold.add(len(body))  # 表格 label row
            body.append([f"表格 {tab['ref']}"])
            for tr in tab["rows"]:
                body.append([_as_cell(c) for c in tr])
            body.append([])
        planned.append((f"{note['number']}_{note['title']}", body, bold))
    # TOC first; content sheet names are uniqued by the workbook
    toc_rows = toc
    wb.add_sheet("目录", toc_rows, bold_rows={0})
    for (name, body, bold), note in zip(planned, notes):
        final = wb.add_sheet(name, body, col_widths=[20, 18, 18, 12],
                             bold_rows=bold)
        toc_rows.append([note["number"], note["title"], note["level"],
                         note["page"], final])
    wb.save(path)
    return True


# ---------------------------------------------------------------------------
# Dataset-level sinks
# ---------------------------------------------------------------------------

def export_statement_workbooks(out_ds, out_dir: str,
                               limit: int = EXCEL_EXPORT_LIMIT) -> int:
    """One S7 workbook per document (streamed, capped at ``limit``).
    Returns the number of workbooks written."""
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for row in out_ds.iter_rows():
        if n >= limit:
            break
        if not row.get("statement_type"):
            continue
        write_statement_workbook(
            row, os.path.join(out_dir, f"{_safe_filename(row['doc_id'])}.xlsx"))
        n += 1
    return n


def export_multi_statement_workbook(out_ds, path: str,
                                    limit: int = EXCEL_EXPORT_LIMIT) -> int:
    """S8 workbook over the first ``limit`` documents. Returns the
    number of summary rows written."""
    rows = list(out_ds.limit(limit).iter_rows())
    write_multi_statement_workbook(rows, path)
    return len(rows)


def export_notes_workbooks(out_ds, out_dir: str,
                           limit: int = EXCEL_EXPORT_LIMIT) -> int:
    """One S9 notes workbook per document that has notes (streamed,
    capped). Returns the number of workbooks written."""
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for row in out_ds.iter_rows():
        if n >= limit:
            break
        if write_notes_workbook(row, os.path.join(
                out_dir, f"{_safe_filename(row['doc_id'])}_notes.xlsx")):
            n += 1
    return n
