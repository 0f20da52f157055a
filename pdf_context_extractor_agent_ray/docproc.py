"""Per-document extraction core.

Pure functions implementing the reference extractor's per-document
semantics over one document's ordered span list. This module is the
SINGLE implementation used by both the sequential oracle
(``oracle/extractor.py``) and the distributed Ray stages
(``stages/extract.py``): the correctness contract is that running it
per document inside a parallel ``map_batches`` pipeline yields
span-for-span the same result as the sequential oracle loop.

Semantics reproduced (reference = cuiqinsain-cloud/pdf_context_extractor_agent):
- page-boundary grouping of spans             (src/pdf_reader.py:37-59)
- balance-sheet boundary detection            (src/table_extractor.py:66-115)
- boundary table filtering / row truncation   (src/table_extractor.py:194-273)
- cross-page table merge with header dedup    (src/table_extractor.py:275-318)
- cell cleaning                               (src/table_extractor.py:320-354)
- structure identification                    (src/parsers/statement_structure_identifier.py:103-372)
- dynamic column analysis incl. cache,
  offset recovery, numeric cleaning           (src/parsers/column_analyzer.py:22-470)
- row classification w/ keep-first dedup      (src/parsers/balance_sheet.py:279-427,
                                               income_statement.py:235-271, cash_flow.py:202-238)
- 3-level arithmetic validation               (balance_sheet.py:429-806,
                                               income_statement.py:273-471, cash_flow.py:240-481)
- notes extraction: title filter, deterministic
  title model (LLM replacement), interval table
  assignment, 10-line text cap, continuity     (src/parsers/notes_extractor.py:286-303,
                                               batch_notes_extractor.py:131-144, 283-342,
                                               413-556, 558-597)

Span model (per BASELINE.json input_hint): a document is
``(doc_id, spans:list<struct<kind,text,media_ref,offset>>)``. Input
kinds: ``page_break | text | table_row | media``; ``table_row`` cells
are joined with CELL_SEP and carry ``media_ref="p{page}:t{idx}"``.
Output kinds: ``item | subtotal | total | unmatched | note_title |
note_text | note_table | media``.
"""
from __future__ import annotations

from typing import Any, Optional

from .patterns import (
    CELL_SEP,
    ROW_SEP,
    COL_CURRENT,
    COL_ITEM_NAME,
    COL_NOTE,
    COL_PREVIOUS,
    DEDUCTION_KEYWORDS,
    ESSENTIAL_ITEMS,
    HEADER_KEYWORD_PAIRS,
    SUBTOTAL_NAMES,
    TOTAL_NAMES,
    banks,
)

STATEMENT_TYPES = ("balance_sheet", "income_statement", "cash_flow")


# ---------------------------------------------------------------------------
# Pagination
# ---------------------------------------------------------------------------

def paginate(kinds: list[str], texts: list[str], refs: list[str],
             offsets: list[int]) -> list[dict[str, Any]]:
    """Group a document's ordered spans into pages.

    A ``page_break`` span closes the current page; pages are numbered from
    1 (mirrors the reference's 1-based page handling, src/pdf_reader.py:37-59).
    Each page records its spans in order and its tables grouped by
    ``media_ref`` in first-appearance order (src/table_extractor.py:34-64).
    """
    pages: list[dict[str, Any]] = []
    cur: dict[str, Any] = {"num": 1, "items": []}
    for i in range(len(kinds)):
        k = kinds[i]
        if k == "page_break":
            if cur["items"]:
                pages.append(cur)
            cur = {"num": cur["num"] + (1 if cur["items"] else 0), "items": []}
            continue
        cur["items"].append((k, texts[i], refs[i], offsets[i]))
    if cur["items"]:
        pages.append(cur)
    # renumber densely
    for n, p in enumerate(pages):
        p["num"] = n + 1
        tables: dict[str, dict[str, Any]] = {}
        for (k, t, r, off) in p["items"]:
            if k == "table_row":
                tab = tables.setdefault(r, {"ref": r, "rows": [], "top": off, "bottom": off})
                tab["rows"].append(t.split(CELL_SEP))
                tab["bottom"] = off
        p["tables"] = list(tables.values())
    return pages


def page_text_lines(page: dict[str, Any]) -> list[str]:
    """A page's text content, one line per span in order.

    Models pdfplumber's ``extract_text`` which interleaves table content
    with prose (src/pdf_reader.py:61-79): table rows render as
    space-joined cells.
    """
    lines = []
    for (k, t, _r, _o) in page["items"]:
        if k == "text":
            lines.append(t)
        elif k == "table_row":
            lines.append(" ".join(c for c in t.split(CELL_SEP)))
    return lines


# ---------------------------------------------------------------------------
# Balance-sheet boundary detection (src/table_extractor.py:66-160)
# ---------------------------------------------------------------------------

def find_bs_boundary(pages: list[dict[str, Any]]) -> dict[str, Any]:
    b = banks()
    result = {"start_page": None, "end_page": None}
    for page in pages:
        text = "\n".join(page_text_lines(page))
        if result["start_page"] is None:
            for pat in b.bs_start:
                if pat.search(text):
                    result["start_page"] = page["num"]
                    break
        # end marker: LAST page containing an end marker wins (reference
        # keeps overwriting end_page, src/table_extractor.py:99-105)
        for pat in b.bs_end:
            if pat.search(text):
                result["end_page"] = page["num"]
                break
        if result["end_page"] is None:
            for pat in b.next_table:
                if pat.search(text):
                    result["end_page"] = page["num"]
                    break
    return result


def _row_join(row: list[str], sep: str = " ") -> str:
    return sep.join("" if c is None else str(c) for c in row)


def filter_tables_by_boundary(tables: list[list[list[str]]]) -> list[list[list[str]]]:
    """End-page table filter: include tables with the consolidated end
    marker, exclude the parent-company table, split a combined table at
    the marker rows (src/table_extractor.py:194-273)."""
    b = banks()
    out = []
    for table in tables:
        table_text = " ".join(_row_join(row) for row in table if row)
        has_end = any(p.search(table_text) for p in b.bs_end)
        has_next = any(p.search(table_text) for p in b.next_table)
        if has_next:
            if has_end:
                kept: list[list[str]] = []
                for row in table:
                    row_text = _row_join(row) if row else ""
                    if any(p.search(row_text) for p in b.next_table):
                        break
                    kept.append(row)
                    if any(p.search(row_text) for p in b.bs_end):
                        break
                if kept:
                    out.append(kept)
            # next-marker only: drop entirely
        else:
            out.append(table)
    return out


def collect_statement_tables(pages: list[dict[str, Any]],
                             boundary: dict[str, Any]) -> list[list[list[str]]]:
    """Tables between the boundary pages; the end page goes through the
    boundary filter (src/table_extractor.py:117-160)."""
    if boundary["start_page"] is None:
        return []
    tables: list[list[list[str]]] = []
    for page in pages:
        if page["num"] < boundary["start_page"]:
            continue
        if boundary["end_page"] is not None and page["num"] > boundary["end_page"]:
            break
        page_tables = [t["rows"] for t in page["tables"]]
        if not page_tables:
            continue
        if page["num"] == boundary["end_page"]:
            tables.extend(filter_tables_by_boundary(page_tables))
        else:
            tables.extend(page_tables)
    return tables


def merge_cross_page_tables(tables: list[list[list[str]]]) -> list[list[str]]:
    """Concat tables, skipping repeated header rows detected by the
    keyword-pair heuristic (src/table_extractor.py:275-318)."""
    merged: list[list[str]] = []
    for table in tables:
        if not table:
            continue
        if not merged:
            merged.extend(table)
            continue
        start_row = 0
        first_row_text = _row_join(table[0]) if table[0] else ""
        if any(a in first_row_text and bk in first_row_text for a, bk in HEADER_KEYWORD_PAIRS):
            start_row = 1
        merged.extend(table[start_row:])
    return merged


def clean_table_data(table: list[list[str]]) -> list[list[str]]:
    """Drop empty rows; per cell: None->"", strip, collapse whitespace
    (src/table_extractor.py:320-354)."""
    b = banks()
    cleaned = []
    for row in table:
        if not row:
            continue
        crow = []
        for cell in row:
            if cell is None:
                crow.append("")
            else:
                crow.append(b.ws_collapse.sub(" ", str(cell).strip()))
        if any(c.strip() for c in crow):
            cleaned.append(crow)
    return cleaned


# ---------------------------------------------------------------------------
# Column analysis (src/parsers/column_analyzer.py)
# ---------------------------------------------------------------------------

def is_note_format(text: str) -> bool:
    b = banks()
    for pat in b.note_format:
        if pat.search(text):
            return True
    if b.pure_digits.match(text) and len(text) <= 3:
        return True
    return False


def is_numeric_format(text: str) -> bool:
    return banks().numeric_format.match(text) is not None


def clean_numeric_value(value: Optional[str]) -> Optional[str]:
    if not value:
        return None
    b = banks()
    cleaned = b.clean_numeric_keep.sub("", str(value)).replace(",", "")
    if not cleaned or cleaned in ("-", "--", "—"):
        return None
    return cleaned


class ColumnAnalyzer:
    """Per-document dynamic column-structure analyzer with a row-validated
    pattern cache (src/parsers/column_analyzer.py:22-316). One instance per
    document — the cache is document-scoped state and must never cross
    documents (reset at parse start, balance_sheet.py:127)."""

    def __init__(self) -> None:
        self.cache: Optional[dict[str, int]] = None

    def reset_cache(self) -> None:
        self.cache = None

    def analyze_row_structure(self, row: list[str], use_cache: bool = True) -> dict[str, int]:
        if not row:
            return {}
        if use_cache and self.cache and self._validate_cached(row, self.cache):
            return self.cache
        column_map = self._analyze(row)
        if column_map:
            self.cache = column_map
        return column_map

    def _analyze(self, row: list[str]) -> dict[str, int]:
        kw = self._match_keywords(row)
        feat = self._infer_features(row, kw)
        column_map = dict(kw)
        # inferred entries overwrite keyword matches on key collision —
        # the reference merges in this order too (column_analyzer.py:51-52
        # update(keyword) then update(feature))
        column_map.update(feat)
        return self._validate_and_fix(column_map)

    def _match_keywords(self, row: list[str]) -> dict[str, int]:
        b = banks()
        matches: dict[str, int] = {}
        for idx, cell in enumerate(row):
            if not cell:
                continue
            cell_text = str(cell).strip()
            for col_type, pats in b.column_keywords.items():
                if col_type in matches:
                    continue
                for pat in pats:
                    if pat.search(cell_text):
                        matches[col_type] = idx
                        break
        return matches

    def _infer_features(self, row: list[str], kw: dict[str, int]) -> dict[str, int]:
        inferred: dict[str, int] = {}
        claimed = set(kw.values())
        for idx, cell in enumerate(row):
            if idx in claimed or not cell:
                continue
            cell_text = str(cell).strip()
            if is_note_format(cell_text):
                if COL_NOTE not in inferred:
                    inferred[COL_NOTE] = idx
                continue
            if is_numeric_format(cell_text):
                if COL_CURRENT not in kw and COL_CURRENT not in inferred:
                    inferred[COL_CURRENT] = idx
                elif COL_PREVIOUS not in kw and COL_PREVIOUS not in inferred:
                    inferred[COL_PREVIOUS] = idx
                continue
        if COL_ITEM_NAME not in kw and COL_ITEM_NAME not in inferred:
            if len(row) > 0 and row[0]:
                inferred[COL_ITEM_NAME] = 0
        return inferred

    @staticmethod
    def _validate_and_fix(column_map: dict[str, int]) -> dict[str, int]:
        # current-period column must precede previous-period column
        # (column_analyzer.py:256-265)
        if COL_CURRENT in column_map and COL_PREVIOUS in column_map:
            cur, prev = column_map[COL_CURRENT], column_map[COL_PREVIOUS]
            if cur > prev:
                column_map[COL_CURRENT], column_map[COL_PREVIOUS] = prev, cur
        return column_map

    def _validate_cached(self, row: list[str], cached: dict[str, int]) -> bool:
        max_idx = max(cached.values()) if cached else -1
        if max_idx >= len(row):
            return False
        for col_type, idx in cached.items():
            if idx >= len(row):
                continue
            cell = row[idx]
            if not cell:
                continue
            cell_text = str(cell).strip()
            if col_type in (COL_CURRENT, COL_PREVIOUS):
                if not is_numeric_format(cell_text) and cell_text:
                    return False
            if col_type == COL_NOTE:
                if not is_note_format(cell_text) and cell_text:
                    return False
        return True

    def extract_values(self, row: list[str], column_map: dict[str, int]) -> dict[str, str]:
        values: dict[str, str] = {}
        if COL_ITEM_NAME in column_map:
            v = self._extract_with_offset(row, column_map[COL_ITEM_NAME], None)
            if v:
                values["item_name"] = str(v).strip()
        if COL_CURRENT in column_map:
            v = self._extract_with_offset(row, column_map[COL_CURRENT], "numeric")
            if v:
                cv = clean_numeric_value(v)
                if cv:
                    values["current_period"] = cv
        if COL_PREVIOUS in column_map:
            v = self._extract_with_offset(row, column_map[COL_PREVIOUS], "numeric")
            if v:
                cv = clean_numeric_value(v)
                if cv:
                    values["previous_period"] = cv
        if COL_NOTE in column_map:
            v = self._extract_with_offset(row, column_map[COL_NOTE], "note")
            if v:
                nv = str(v).strip()
                if is_note_format(nv):
                    values["note"] = nv
        return values

    @staticmethod
    def _extract_with_offset(row: list[str], base_idx: int,
                             value_type: Optional[str], max_offset: int = 3) -> Optional[str]:
        # merged-cell column-shift recovery: numeric values recover only
        # LEFT (-1,-2) to avoid stealing the next period's column;
        # names/notes recover both ways (column_analyzer.py:365-440)
        if 0 <= base_idx < len(row):
            cell = row[base_idx]
            if cell is not None and (not isinstance(cell, str) or cell.strip()):
                cell_text = str(cell).strip()
                if value_type is None:
                    return cell
                if value_type == "numeric" and is_numeric_format(cell_text):
                    return cell
                if value_type == "note" and is_note_format(cell_text):
                    return cell
        offsets = [-1, -2] if value_type == "numeric" else [-1, 1, -2, 2]
        for off in offsets:
            if abs(off) > max_offset:
                continue
            idx = base_idx + off
            if idx < 0 or idx >= len(row):
                continue
            cell = row[idx]
            if cell is None or (isinstance(cell, str) and not cell.strip()):
                continue
            cell_text = str(cell).strip()
            if value_type is None:
                return cell
            if value_type == "numeric" and is_numeric_format(cell_text):
                return cell
            if value_type == "note" and is_note_format(cell_text):
                return cell
        return None


# ---------------------------------------------------------------------------
# Structure identification (src/parsers/statement_structure_identifier.py)
# ---------------------------------------------------------------------------

def _clean_name(cell: Optional[str]) -> str:
    if not cell:
        return ""
    return str(cell).strip().replace("\n", "").replace("\r", "").strip()


def _row_names(table: list[list[str]]) -> list[tuple[str, str]]:
    """Cleaned (col0, col1) names per row, computed once per table —
    identify_structure is the hot path (3 statement types × anchors ×
    rows) and must not re-clean cells per key."""
    out = []
    for row in table:
        n0 = _clean_name(row[0]) if row else ""
        n1 = _clean_name(row[1]) if row and len(row) > 1 else ""
        out.append((n0, n1))
    return out


def identify_structure(table: list[list[str]], st_type: str,
                       row_names: Optional[list[tuple[str, str]]] = None) -> dict[str, Any]:
    b = banks()
    structures = b.key_structures[st_type]
    if row_names is None:
        row_names = _row_names(table)
    key_positions: dict[str, int] = {}
    for key_name, pats, _req in structures:
        for row_idx, names in enumerate(row_names):
            found = False
            for name in names:
                if not name:
                    continue
                for pat in pats:
                    if pat.search(name):
                        key_positions[key_name] = row_idx
                        found = True
                        break
                if found:
                    break
            if found:
                break

    required = [name for name, _p, req in structures if req]
    found_keys = list(key_positions.keys())
    missing = [k for k in required if k not in found_keys]
    if missing:
        # found/required can exceed 1.0 when optional anchors are found —
        # reference formula verbatim (statement_structure_identifier.py:233)
        conf = len(found_keys) / len(required) if required else 0.0
        return {"is_valid": False, "key_positions": key_positions, "header_row": None,
                "start_row": None, "end_row": None, "confidence": conf, "missing_keys": missing}

    key_order = [name for name, _p, _r in structures]
    found_sorted = sorted(key_positions.items(), key=lambda kv: kv[1])
    for i in range(len(found_sorted) - 1):
        if key_order.index(found_sorted[i][0]) >= key_order.index(found_sorted[i + 1][0]):
            return {"is_valid": False, "key_positions": key_positions, "header_row": None,
                    "start_row": None, "end_row": None, "confidence": 0.5, "missing_keys": []}

    confidence = len(found_keys) / len(structures)

    # header: scan up to 20 rows above the first anchor for 项目 + period kw
    first_key_row = min(key_positions.values())
    header_row = None
    search_start = max(0, first_key_row - 20)
    for row_idx in range(first_key_row - 1, search_start - 1, -1):
        if row_idx < 0 or row_idx >= len(table):
            continue
        row = table[row_idx]
        if not row:
            continue
        row_text = " ".join(str(c) for c in row if c)
        if b.header_kw.search(row_text) and b.header_period_kw.search(row_text):
            header_row = row_idx
            break
    if header_row is None and first_key_row - 1 >= 0:
        header_row = first_key_row - 1

    start_row = first_key_row
    last_key_row = max(key_positions.values())
    end_row = None
    for row_idx in range(last_key_row, min(len(table), last_key_row + 50)):
        row = table[row_idx]
        if not row:
            continue
        name = _clean_name(row[0] if row else "")
        if not name:
            continue
        if any(p.search(name) for p in b.end_patterns[st_type]):
            end_row = row_idx
            break
    if end_row is None:
        end_row = min(len(table) - 1, last_key_row + 30)

    return {"is_valid": True, "key_positions": key_positions, "header_row": header_row,
            "start_row": start_row, "end_row": end_row, "confidence": confidence,
            "missing_keys": missing}


# ---------------------------------------------------------------------------
# Statement parsing (base_statement_parser.py + per-type parsers)
# ---------------------------------------------------------------------------

def get_header_info(table: list[list[str]], structure: dict[str, Any],
                    analyzer: ColumnAnalyzer) -> dict[str, Optional[int]]:
    header_info: dict[str, Optional[int]] = {
        "item_name_col": 0, "current_period_col": None,
        "previous_period_col": None, "note_col": None,
    }
    if not structure["is_valid"]:
        return header_info
    hr = structure["header_row"]
    if hr is None or hr >= len(table):
        return header_info
    cmap = analyzer.analyze_row_structure(table[hr], use_cache=False)
    if COL_ITEM_NAME in cmap:
        header_info["item_name_col"] = cmap[COL_ITEM_NAME]
    if COL_CURRENT in cmap:
        header_info["current_period_col"] = cmap[COL_CURRENT]
    if COL_PREVIOUS in cmap:
        header_info["previous_period_col"] = cmap[COL_PREVIOUS]
    if COL_NOTE in cmap:
        header_info["note_col"] = cmap[COL_NOTE]
    return header_info


def get_item_name(row: list[str], header_info: dict[str, Optional[int]]) -> str:
    # name may sit in col 0 or col 1 (base_statement_parser.py:173-194)
    for col_idx in (header_info.get("item_name_col", 0), 0, 1):
        if col_idx is not None and col_idx < len(row) and row[col_idx]:
            name = str(row[col_idx]).strip().replace("\n", "").replace("\r", "").strip()
            if name:
                return name
    return ""


def extract_row_values(row: list[str], header_info: dict[str, Optional[int]],
                       analyzer: ColumnAnalyzer) -> dict[str, str]:
    # width-mismatch rule, asymmetric on purpose: ANY narrower row, or a
    # row more than +1 wider, forces dynamic per-row re-analysis — the
    # reference's exact condition (base_statement_parser.py:135-137
    # `row_col_count < expected or abs(...) > 1`); only +1-wide rows take
    # the static header-map path
    row_cols = len(row)
    expected = max(header_info.get("current_period_col") or 0,
                   header_info.get("previous_period_col") or 0) + 1
    if (header_info["current_period_col"] is None or row_cols < expected
            or abs(row_cols - expected) > 1):
        cmap = analyzer.analyze_row_structure(row, use_cache=False)
        vals = analyzer.extract_values(row, cmap)
    else:
        cmap = {}
        if header_info.get("item_name_col") is not None:
            cmap[COL_ITEM_NAME] = header_info["item_name_col"]
        if header_info.get("current_period_col") is not None:
            cmap[COL_CURRENT] = header_info["current_period_col"]
        if header_info.get("previous_period_col") is not None:
            cmap[COL_PREVIOUS] = header_info["previous_period_col"]
        if header_info.get("note_col") is not None:
            cmap[COL_NOTE] = header_info["note_col"]
        vals = analyzer.extract_values(row, cmap)
    return {k: v for k, v in vals.items()
            if k in ("current_period", "previous_period", "note")}


_CLASSIFY_MEMO: dict[tuple[str, str], Optional[tuple[str, str]]] = {}


def classify_item(st_type: str, item_name: str) -> Optional[tuple[str, str]]:
    """First-match-wins classification of a row name against the
    statement's pattern bank (+ the balance-sheet total router).

    Pure function of (st_type, item_name) — memoized per worker process
    because item names repeat across millions of documents; the memo is
    a transparent cache, never a semantic change.
    """
    key = (st_type, item_name)
    memo = _CLASSIFY_MEMO
    if key in memo:
        return memo[key]
    b = banks()
    hit: Optional[tuple[str, str]] = None
    for sec, std_name, pats in b.item_banks[st_type]:
        if any(pat.search(item_name) for pat in pats):
            hit = (sec, std_name)
            break
    if hit is None and st_type == "balance_sheet":
        for sec, std_name, pat in b.bs_totals:
            if pat.search(item_name):
                hit = (sec, std_name)
                break
    if len(memo) < 200_000:
        memo[key] = hit
    return hit


def parse_statement(table: list[list[str]], st_type: str,
                    structure: Optional[dict[str, Any]] = None) -> dict[str, Any]:
    """Classify rows into ordered standardized items (the reference's
    ``ordered_items`` contract, balance_sheet.py:114-277). ``structure``
    may be passed in when already identified (extract_document computes
    it during statement-type detection)."""
    b = banks()
    analyzer = ColumnAnalyzer()
    result: dict[str, Any] = {
        "statement_type": st_type,
        "sections": {},          # section_path -> {standard_name: data}
        "ordered_items": [],     # [{'section','standard_name','data'}] in row order
        "unmatched": [],         # [{'row_index','item_name','values'}]
        "structure_info": {},
        "total_rows": len(table),
        "matched_items": 0,
    }
    if not table:
        result["structure_info"] = {"is_valid": False, "confidence": 0.0}
        return result

    if structure is None:
        structure = identify_structure(table, st_type)
    result["structure_info"] = structure

    # cash-flow parser bails out entirely on invalid structure
    # (cash_flow.py:123-126); balance-sheet / income fall back to the
    # whole table (balance_sheet.py:187-192)
    if not structure["is_valid"] and st_type == "cash_flow":
        return result

    if structure["is_valid"]:
        data = table[structure["start_row"]: structure["end_row"] + 1]
        row_offset = structure["start_row"]
    else:
        data = table
        row_offset = 0

    header_info = get_header_info(table, structure, analyzer)
    sections = result["sections"]

    for row_idx, row in enumerate(data):
        if not row:
            continue
        item_name = get_item_name(row, header_info)
        if not item_name:
            continue
        values = extract_row_values(row, header_info, analyzer)

        hit = classify_item(st_type, item_name)
        matched = hit is not None
        if matched:
            sec, std_name = hit
            storage = sections.setdefault(sec, {})
            if std_name not in storage:   # keep-first dedup (balance_sheet.py:299-301)
                item_data = {"original_name": item_name, **values}
                storage[std_name] = item_data
                result["ordered_items"].append(
                    {"section": sec, "standard_name": std_name, "data": item_data})
            result["matched_items"] += 1
        else:
            result["unmatched"].append(
                {"row_index": row_idx + row_offset, "item_name": item_name, "values": values})

    return result


# ---------------------------------------------------------------------------
# Validation (A1-A5)
# ---------------------------------------------------------------------------

def _num(value: Optional[str]) -> Optional[float]:
    if not value:
        return None
    cleaned = banks().numeric_strip.sub("", str(value))
    if cleaned and cleaned not in ("-", "--"):
        try:
            return float(cleaned)
        except ValueError:
            return None
    return None


def _sec(parsed: dict[str, Any], path: str) -> dict[str, Any]:
    return parsed["sections"].get(path, {})


def _cur(parsed: dict[str, Any], path: str, name: str) -> Optional[float]:
    return _num(_sec(parsed, path).get(name, {}).get("current_period"))


def _check(name: str, calculated: Optional[float], reported: Optional[float],
           tol_rate: float) -> Optional[dict[str, Any]]:
    if calculated is None or reported is None:
        return None
    diff = abs(calculated - reported)
    tol = max(abs(calculated), abs(reported)) * tol_rate
    return {"name": name, "passed": diff <= tol, "calculated": calculated,
            "reported": reported, "difference": diff}


def _validate_subtotal(items: dict[str, Any], subtotal: Optional[dict[str, Any]],
                       name: str, tol_rate: float) -> dict[str, Any]:
    # sign-aware: 减： items subtract (balance_sheet.py:698-806)
    if not subtotal:
        return {"name": name, "passed": False, "skipped": True}
    reported = _num(subtotal.get("current_period"))
    if reported is None:
        return {"name": name, "passed": False, "skipped": True}
    calc = 0.0
    count = 0
    for item_name, data in items.items():
        if "合计" in item_name:
            continue
        v = _num(data.get("current_period"))
        if v is not None:
            if any(k in item_name for k in DEDUCTION_KEYWORDS):
                calc -= v
            else:
                calc += v
            count += 1
    if count == 0:
        return {"name": name, "passed": True, "skipped": True}
    diff = abs(calc - reported)
    tol = max(abs(calc), abs(reported)) * tol_rate
    return {"name": name, "passed": diff <= tol, "calculated": calc,
            "reported": reported, "difference": diff}


def validate_statement(parsed: dict[str, Any]) -> dict[str, Any]:
    st = parsed["statement_type"]
    if st == "balance_sheet":
        return _validate_balance_sheet(parsed)
    if st == "income_statement":
        return _validate_income_statement(parsed)
    return _validate_cash_flow(parsed)


def _validate_balance_sheet(parsed: dict[str, Any]) -> dict[str, Any]:
    tol = 0.001
    errors: list[str] = []
    warnings: list[str] = []
    is_valid = True

    for items_path, total_path, total_name, label, warn_only in [
        ("assets.current_assets", "assets.current_assets_total", "current_assets_total",
         "current_assets_subtotal", False),
        ("assets.non_current_assets", "assets.non_current_assets_total",
         "non_current_assets_total", "non_current_assets_subtotal", False),
        ("liabilities.current_liabilities", "liabilities.current_liabilities_total",
         "current_liabilities_total", "current_liabilities_subtotal", False),
        ("liabilities.non_current_liabilities", "liabilities.non_current_liabilities_total",
         "non_current_liabilities_total", "non_current_liabilities_subtotal", False),
    ]:
        r = _validate_subtotal(_sec(parsed, items_path),
                               _sec(parsed, total_path).get(total_name), label, tol)
        if not r["passed"] and not r.get("skipped"):
            errors.append(f"{label}_mismatch:{r['difference']:.2f}")
            is_valid = False
        elif not r["passed"]:
            errors.append(f"{label}_missing")
            is_valid = False

    equity_sub = (_sec(parsed, "equity.equity_total").get("equity_total")
                  or _sec(parsed, "equity.parent_equity_total").get("parent_equity_total"))
    r = _validate_subtotal(_sec(parsed, "equity.items"), equity_sub, "equity_subtotal", tol)
    if not r["passed"]:
        warnings.append("equity_subtotal_mismatch" if not r.get("skipped") else "equity_subtotal_missing")

    cat = _cur(parsed, "assets.current_assets_total", "current_assets_total")
    ncat = _cur(parsed, "assets.non_current_assets_total", "non_current_assets_total")
    at = _cur(parsed, "assets.assets_total", "assets_total")
    c = _check("assets_total", None if cat is None or ncat is None else cat + ncat, at, tol)
    if c and not c["passed"]:
        errors.append(f"assets_total_mismatch:{c['difference']:.2f}")
        is_valid = False

    clt = _cur(parsed, "liabilities.current_liabilities_total", "current_liabilities_total")
    nclt = _cur(parsed, "liabilities.non_current_liabilities_total", "non_current_liabilities_total")
    lt = _cur(parsed, "liabilities.liabilities_total", "liabilities_total")
    c = _check("liabilities_total", None if clt is None or nclt is None else clt + nclt, lt, tol)
    if c and not c["passed"]:
        errors.append(f"liabilities_total_mismatch:{c['difference']:.2f}")
        is_valid = False

    # `or` (not `is None`) — a reported equity_total of exactly 0 falls
    # through to the parent total, mirroring the reference's own idiom
    # (balance_sheet.py:590-594 `_get_numeric_value(...) or ...`)
    et = (_cur(parsed, "equity.equity_total", "equity_total")
          or _cur(parsed, "equity.parent_equity_total", "parent_equity_total"))
    let = _cur(parsed, "liabilities_and_equity_total", "liabilities_and_equity_total")
    c = _check("liabilities_and_equity_total",
               None if lt is None or et is None else lt + et, let, tol)
    if c and not c["passed"]:
        errors.append(f"liabilities_and_equity_total_mismatch:{c['difference']:.2f}")
        is_valid = False

    c = _check("level3_balance", at, let, tol)
    if c and not c["passed"]:
        errors.append(f"level3_balance_mismatch:{c['difference']:.2f}")
        is_valid = False

    all_items: dict[str, Any] = {}
    for cat_path in ("assets.current_assets", "assets.non_current_assets",
                     "liabilities.current_liabilities", "liabilities.non_current_liabilities",
                     "equity.items"):
        all_items.update(_sec(parsed, cat_path))
    essential = ESSENTIAL_ITEMS["balance_sheet"]
    found = sum(1 for item in essential if any(item in key for key in all_items))
    completeness = found / len(essential)
    if completeness < 0.7:
        warnings.append(f"low_completeness:{completeness:.2f}")
    if parsed["total_rows"] and len(parsed["unmatched"]) / max(parsed["total_rows"], 1) > 0.3:
        warnings.append("high_unmatched_ratio")

    return {"is_valid": is_valid, "errors": errors, "warnings": warnings,
            "completeness_score": completeness}


def _validate_income_statement(parsed: dict[str, Any]) -> dict[str, Any]:
    tol = 0.01
    errors: list[str] = []
    warnings: list[str] = []
    is_valid = True

    oc = _cur(parsed, "costs", "operating_cost")
    tc = _cur(parsed, "costs", "operating_total_cost")
    if oc is not None and tc is not None:
        calc = oc
        for extra in ("taxes_and_surcharges", "selling_expenses", "administrative_expenses",
                      "rd_expenses", "financial_expenses"):
            v = _cur(parsed, "costs", extra)
            if v is not None:
                calc += v
        c = _check("total_cost", calc, tc, tol)
        if c and not c["passed"]:
            warnings.append(f"total_cost_mismatch:{c['difference']:.2f}")

    tp = _cur(parsed, "profit", "total_profit")
    tax = _cur(parsed, "profit", "income_tax")
    np_ = _cur(parsed, "profit", "net_profit")
    if tp is not None and tax is not None and np_ is not None:
        c = _check("net_profit", tp - tax, np_, tol)
        if c and not c["passed"]:
            errors.append(f"net_profit_mismatch:{c['difference']:.2f}")
            is_valid = False

    pp = _cur(parsed, "profit", "parent_net_profit")
    mp = _cur(parsed, "profit", "minority_profit")
    if np_ is not None and pp is not None and mp is not None:
        c = _check("profit_attribution", pp + mp, np_, tol)
        if c and not c["passed"]:
            errors.append(f"profit_attribution_mismatch:{c['difference']:.2f}")
            is_valid = False

    all_items: dict[str, Any] = {}
    for path in ("revenue", "costs", "profit"):
        all_items.update(_sec(parsed, path))
    essential = ESSENTIAL_ITEMS["income_statement"]
    found = sum(1 for item in essential
                if item in all_items and all_items[item].get("current_period") is not None)
    completeness = found / len(essential)
    if completeness < 0.7:
        warnings.append(f"low_completeness:{completeness:.2f}")

    return {"is_valid": is_valid, "errors": errors, "warnings": warnings,
            "completeness_score": completeness}


def _validate_cash_flow(parsed: dict[str, Any]) -> dict[str, Any]:
    tol = 0.01
    errors: list[str] = []
    warnings: list[str] = []
    is_valid = True
    nets = {}
    for act in ("operating", "investing", "financing"):
        path = f"{act}_activities"
        inflow = _cur(parsed, path, f"{act}_inflow_subtotal")
        outflow = _cur(parsed, path, f"{act}_outflow_subtotal")
        net = _cur(parsed, path, f"{act}_net_cash_flow")
        nets[act] = net
        if inflow is not None and outflow is not None and net is not None:
            c = _check(f"{act}_net", inflow - outflow, net, tol)
            if c and not c["passed"]:
                errors.append(f"{act}_net_mismatch:{c['difference']:.2f}")
                is_valid = False

    fx = _cur(parsed, "other_items", "exchange_rate_effect")
    ni = _cur(parsed, "other_items", "net_increase_cash")
    if all(v is not None for v in (nets["operating"], nets["investing"], nets["financing"], ni)):
        calc = nets["operating"] + nets["investing"] + nets["financing"]
        if fx is not None:
            calc += fx
        c = _check("net_increase", calc, ni, tol)
        if c and not c["passed"]:
            errors.append(f"net_increase_mismatch:{c['difference']:.2f}")
            is_valid = False

    beg = _cur(parsed, "other_items", "beginning_cash_balance")
    end = _cur(parsed, "other_items", "ending_cash_balance")
    if beg is not None and ni is not None and end is not None:
        c = _check("ending_balance", beg + ni, end, tol)
        if c and not c["passed"]:
            errors.append(f"ending_balance_mismatch:{c['difference']:.2f}")
            is_valid = False

    all_items: dict[str, Any] = {}
    for path in ("operating_activities", "investing_activities",
                 "financing_activities", "other_items"):
        all_items.update(_sec(parsed, path))
    essential = ESSENTIAL_ITEMS["cash_flow"]
    found = sum(1 for item in essential
                if item in all_items and all_items[item].get("current_period") is not None)
    completeness = found / len(essential)
    if completeness < 0.7:
        warnings.append(f"low_completeness:{completeness:.2f}")

    return {"is_valid": is_valid, "errors": errors, "warnings": warnings,
            "completeness_score": completeness}


# ---------------------------------------------------------------------------
# Notes extraction (ST3-ST5 with a deterministic title model)
# ---------------------------------------------------------------------------

_DIGITSY = __import__("re").compile(r"^[\d\s.,，。%\-–—]+$")


def classify_title(line: str) -> Optional[tuple[int, str, str]]:
    """Deterministic TitleModel: reproduces the LLM prompt contract
    (notes_extractor.py:253-263): main titles ``数字、``, sub-titles
    ``(数字)`` / ``（数字）``. Rejects candidates whose 'title' text is
    purely numeric/punctuation (the prompt's 'titles don't contain many
    numbers'). Returns (level, number, title_text) or None.
    """
    b = banks()
    line = line.strip()
    m = b.note_l1.match(line)
    if m:
        title = m.group(2).strip()
        if title and not _DIGITSY.match(title):
            return (1, m.group(1), title)
        return None
    m = b.note_l2.match(line)
    if m:
        title = m.group(2).strip()
        if title and not _DIGITSY.match(title):
            return (2, m.group(1), title)
    return None


def candidate_title_lines(page: dict[str, Any]) -> list[tuple[str, int]]:
    """Title-line pre-filter (M13): among the first 100 lines keep those
    starting with a digit / ``(digit`` / ``（digit``, cap 30; if fewer
    than 5 survive, fall back to scanning all of the page's lines
    (the reference's first-1500-chars fallback,
    notes_extractor.py:286-303, batch_notes_extractor.py:131-144)."""
    lines: list[tuple[str, int]] = []
    for (k, t, _r, off) in page["items"]:
        if k == "text":
            lines.append((t, off))
        elif k == "table_row":
            lines.append((" ".join(t.split(CELL_SEP)), off))
    filtered = []
    for text, off in lines[:100]:
        s = text.strip()
        if s and (s[0].isdigit()
                  or (s.startswith("(") and len(s) > 2 and s[1].isdigit())
                  or (s.startswith("（") and len(s) > 2 and s[1].isdigit())):
            filtered.append((s, off))
    if len(filtered) < 5:
        return [(t.strip(), o) for t, o in lines]
    return filtered[:30]


def extract_note_text(page: dict[str, Any], title_offset: int) -> str:
    """Up to 10 non-empty lines after the title line, page-local
    (the 10-line cap is part of the semantics,
    batch_notes_extractor.py:558-597)."""
    lines = []
    for (k, t, _r, off) in page["items"]:
        if off <= title_offset:
            continue
        text = t if k == "text" else " ".join(t.split(CELL_SEP)) if k == "table_row" else ""
        if text.strip():
            lines.append(text.strip())
            if len(lines) >= 10:
                break
    return "\n".join(lines)


# Title-model seam (ST3): the default classifies with the deterministic
# rule model; EngineConfig/stages may install a provider-backed model
# via set_title_model (same contract as config.TitleModel.classify_lines).
_TITLE_MODEL = None


def set_title_model(model) -> None:
    """Install a TitleModel (or None to restore the rule default) for
    this worker process."""
    global _TITLE_MODEL
    _TITLE_MODEL = model


def _classify_lines(lines: list[tuple[str, int]]) -> list[dict[str, Any]]:
    if _TITLE_MODEL is not None:
        return _TITLE_MODEL.classify_lines(lines)
    out = []
    for text, off in lines:
        t = classify_title(text)
        if t:
            level, number, title = t
            out.append({"level": level, "number": number, "title": title,
                        "full_title": text.strip(), "offset": off})
    return out


def extract_notes(pages: list[dict[str, Any]],
                  start_after_page: Optional[int]) -> tuple[list[dict[str, Any]], list[str]]:
    """Per-page title detection + interval table assignment + page-to-page
    continuity threading (notes_extractor.py:450-518,
    batch_notes_extractor.py:264-411). Ordering-sensitive per-document
    fold — runs inside one per-doc call, never across Ray tasks. Title
    classification goes through the installed TitleModel (ST3 seam)."""
    notes: list[dict[str, Any]] = []
    warnings: list[str] = []
    last_number: Optional[int] = None

    for page in pages:
        if start_after_page is not None and page["num"] <= start_after_page:
            continue
        candidates = candidate_title_lines(page)
        titles = [{**t, "page": page["num"]} for t in _classify_lines(candidates)]
        if not titles:
            continue

        level1 = sorted([t for t in titles if t["level"] == 1], key=lambda t: t["offset"])
        level2 = [t for t in titles if t["level"] == 2]
        tables = page["tables"]

        for i, note in enumerate(level1):
            # continuity check: numbering should increase by 1
            # (notes_extractor.py:482-518)
            try:
                n = int(note["number"])
                if last_number is not None and n != last_number + 1:
                    warnings.append(f"note_continuity_break:p{page['num']}:{last_number}->{n}")
                last_number = n
            except ValueError:
                pass

            cur_pos = note["offset"]
            next_pos = level1[i + 1]["offset"] if i < len(level1) - 1 else None
            children = sorted(
                [t for t in level2
                 if t["offset"] > cur_pos and (next_pos is None or t["offset"] < next_pos)],
                key=lambda t: t["offset"])

            if children:
                # L1 with children: no tables; children claim them
                # (batch_notes_extractor.py:283-342)
                notes.append({**note, "tables": [], "text": extract_note_text(page, cur_pos)})
                for j, child in enumerate(children):
                    child_next = (children[j + 1]["offset"] if j < len(children) - 1
                                  else next_pos)
                    child_tables = [
                        t for t in tables
                        if t["top"] >= child["offset"]
                        and (child_next is None or t["top"] < child_next)]
                    notes.append({**child, "tables": child_tables,
                                  "text": extract_note_text(page, child["offset"])})
            else:
                note_tables = [
                    t for t in tables
                    if t["top"] >= cur_pos and (next_pos is None or t["top"] < next_pos)]
                notes.append({**note, "tables": note_tables,
                              "text": extract_note_text(page, cur_pos)})
    return notes, warnings


# ---------------------------------------------------------------------------
# Full per-document extraction
# ---------------------------------------------------------------------------

def _span_kind_for(st_type: str, standard_name: str) -> str:
    if standard_name in TOTAL_NAMES[st_type]:
        return "total"
    if standard_name in SUBTOTAL_NAMES[st_type]:
        return "subtotal"
    return "item"


# The item/unmatched span-text wire format (encoded below in
# extract_document; decoded by pipelines/export.py and
# pipelines/excel.py — ONE decoder pair so the sinks cannot drift).
# Only the name field is document-controlled and may itself contain
# '|'; the greedy middle absorbs it. section/standard come from
# controlled vocab, current/previous are cleaned numerics, note refs
# carry no '|' by construction.

def decode_item_text(text: str):
    """'section|standard|orig|cur|prev|note' -> 6-tuple, or None if
    the text is not a well-formed item encoding."""
    parts = text.split("|")
    if len(parts) < 6:
        return None
    return (parts[0], parts[1], "|".join(parts[2:-3]),
            parts[-3], parts[-2], parts[-1])


def decode_unmatched_text(text: str):
    """'rowN|item_name|cur|prev|note' -> 5-tuple, or None."""
    parts = text.split("|")
    if len(parts) < 5:
        return None
    return (parts[0], "|".join(parts[1:-3]),
            parts[-3], parts[-2], parts[-1])


def extract_document(kinds: list[str], texts: list[str], refs: list[str],
                     offsets: list[int]) -> dict[str, Any]:
    """Extract one document: ordered output spans + validation verdict.

    Returns dict with keys: kinds, texts, media_refs, offsets (parallel
    lists), valid (bool), confidence (float), errors (list[str]).
    """
    out_k: list[str] = []
    out_t: list[str] = []
    out_r: list[str] = []
    errors: list[str] = []

    pages = paginate(kinds, texts, refs, offsets)
    boundary = find_bs_boundary(pages)

    # --- statement tables -------------------------------------------------
    if boundary["start_page"] is not None:
        raw_tables = collect_statement_tables(pages, boundary)
    else:
        raw_tables = [t["rows"] for p in pages for t in p["tables"]]

    merged = merge_cross_page_tables(raw_tables)
    cleaned = clean_table_data(merged)

    parsed = None
    validation = None
    confidence = 0.0
    if cleaned:
        # statement-type detection: run structure ID for all three types,
        # pick the valid one with the highest confidence (ties resolve in
        # BS > IS > CF order); if none valid, fall back to the
        # balance-sheet whole-table parse (balance_sheet.py:187-192).
        # Short-circuit: a valid type at confidence 1.0 cannot be beaten
        # (confidence <= 1.0 and ties resolve to the earlier type), so
        # evaluation stops there — identical outcome, 3x less regex work
        # for the common single-statement document.
        row_names = _row_names(cleaned)
        structures: dict[str, dict[str, Any]] = {}
        st_type = None
        for st in STATEMENT_TYPES:
            structures[st] = identify_structure(cleaned, st, row_names)
            if structures[st]["is_valid"] and structures[st]["confidence"] >= 1.0:
                st_type = st
                break
        if st_type is None:
            valid_types = [st for st in structures if structures[st]["is_valid"]]
            if valid_types:
                st_type = max(valid_types, key=lambda s: (structures[s]["confidence"],
                                                          -STATEMENT_TYPES.index(s)))
            else:
                st_type = "balance_sheet"
        parsed = parse_statement(cleaned, st_type, structure=structures[st_type])
        confidence = parsed["structure_info"].get("confidence", 0.0) or 0.0
        validation = validate_statement(parsed)
        errors.extend(validation["errors"])

        for entry in parsed["ordered_items"]:
            data = entry["data"]
            out_k.append(_span_kind_for(st_type, entry["standard_name"]))
            out_t.append("|".join([
                entry["section"], entry["standard_name"], data.get("original_name", ""),
                data.get("current_period") or "", data.get("previous_period") or "",
                data.get("note") or ""]))
            out_r.append("")
        for um in parsed["unmatched"]:
            vals = um["values"]
            out_k.append("unmatched")
            out_t.append("|".join([
                f"row{um['row_index']}", um["item_name"],
                vals.get("current_period") or "", vals.get("previous_period") or "",
                vals.get("note") or ""]))
            out_r.append("")
    else:
        errors.append("no_statement_table")

    # --- notes ------------------------------------------------------------
    notes_start_after = boundary["end_page"] if boundary["start_page"] is not None else None
    notes, warnings = extract_notes(pages, notes_start_after)
    errors.extend(warnings)
    for note in notes:
        out_k.append("note_title")
        out_t.append(f"{note['number']}|{note['level']}|{note['title']}")
        out_r.append(f"p{note['page']}")
        if note["text"]:
            out_k.append("note_text")
            out_t.append(note["text"])
            out_r.append(f"p{note['page']}")
        for tab in note["tables"]:
            out_k.append("note_table")
            out_t.append(ROW_SEP.join(CELL_SEP.join(row) for row in tab["rows"]))
            out_r.append(tab["ref"])

    # --- media passthrough (untouched, in document order) -----------------
    for i in range(len(kinds)):
        if kinds[i] == "media":
            out_k.append("media")
            out_t.append(texts[i])
            out_r.append(refs[i])

    valid = bool(parsed) and bool(validation) and validation["is_valid"] \
        and parsed["structure_info"].get("is_valid", False)

    return {
        "kinds": out_k,
        "texts": out_t,
        "media_refs": out_r,
        "offsets": list(range(len(out_k))),
        "valid": valid,
        "confidence": float(confidence),
        "statement_type": (parsed["statement_type"] if parsed else ""),
        "errors": errors,
    }
