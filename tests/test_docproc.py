"""Unit tests for the per-document extraction core, porting the
reference's deterministic test vectors (tests/test_column_analyzer.py,
tests/test_integration.py, balance_sheet.py:832-866)."""
from pdf_context_extractor_agent_ray import docproc
from pdf_context_extractor_agent_ray.docproc import (
    ColumnAnalyzer,
    clean_numeric_value,
    clean_table_data,
    filter_tables_by_boundary,
    identify_structure,
    is_note_format,
    is_numeric_format,
    merge_cross_page_tables,
    parse_statement,
    validate_statement,
)
from pdf_context_extractor_agent_ray.patterns import COL_CURRENT, COL_ITEM_NAME, COL_NOTE, COL_PREVIOUS


# --- cell classifiers (reference truth tables, test_column_analyzer.py:152-203)

def test_numeric_format():
    for good in ["1,234,567.89", "1234567.89", "-1234.5", "100", "0.01", " 42 "]:
        assert is_numeric_format(good), good
    for bad in ["abc", "1,23", "货币资金", "", "1.2.3", "六、1"]:
        assert not is_numeric_format(bad), bad


def test_note_format():
    for good in ["七、1", "六、2", "七(1)", "六(2)", "七、(1)", "1", "12", "123"]:
        assert is_note_format(good), good
    for bad in ["1234", "abc", "货币资金", "1,234.00"]:
        assert not is_note_format(bad), bad


def test_clean_numeric_value():
    assert clean_numeric_value("1,234,567.89") == "1234567.89"
    assert clean_numeric_value("－") is None or clean_numeric_value("—") is None
    assert clean_numeric_value("-") is None
    assert clean_numeric_value("--") is None
    assert clean_numeric_value("") is None
    assert clean_numeric_value("¥1,000.00元") == "1000.00"


# --- header formats (test_column_analyzer.py:106-150)

def test_header_variants():
    a = ColumnAnalyzer()
    for header in [
        ["项目", "期末余额", "期初余额", "附注"],
        ["项目", "本期末", "上期末", "附注"],
        ["项目", "本年末", "上年末", "附注"],
        ["项目", "2024年期末", "2023年期末", "附注"],
        ["项目", "2024 年12月 31日", "2023 年12月 31日", "附注"],
    ]:
        cmap = a.analyze_row_structure(header, use_cache=False)
        assert cmap[COL_ITEM_NAME] == 0, header
        assert cmap[COL_CURRENT] == 1, header
        assert cmap[COL_PREVIOUS] == 2, header
        assert cmap[COL_NOTE] == 3, header


def test_header_note_before_amounts():
    a = ColumnAnalyzer()
    cmap = a.analyze_row_structure(["项目", "附注", "期末余额", "期初余额"], use_cache=False)
    assert cmap[COL_NOTE] == 1
    assert cmap[COL_CURRENT] == 2
    assert cmap[COL_PREVIOUS] == 3


def test_current_previous_swap_fix():
    # current-period column must precede previous (column_analyzer.py:256-265)
    a = ColumnAnalyzer()
    cmap = a.analyze_row_structure(["项目", "期初余额", "期末余额"], use_cache=False)
    assert cmap[COL_CURRENT] < cmap[COL_PREVIOUS]


# --- cache semantics (test_column_analyzer.py:68-104,205-243)

def test_cache_hit_and_invalidate():
    a = ColumnAnalyzer()
    header = ["项目", "本期末", "上期末", "附注"]
    cmap = a.analyze_row_structure(header, use_cache=False)
    assert a.cache == cmap
    # data row consistent with cache -> cache reused
    row = ["货币资金", "1,000.00", "900.00", "六、1"]
    assert a.analyze_row_structure(row, use_cache=True) == cmap
    # narrower row invalidates (column count mismatch)
    narrow = ["货币资金", "1,000.00", "900.00"]
    cmap2 = a.analyze_row_structure(narrow, use_cache=True)
    assert cmap2[COL_CURRENT] == 1 and cmap2[COL_PREVIOUS] == 2
    assert COL_NOTE not in cmap2


# --- merged-cell offset recovery (column_analyzer.py:365-440)

def test_numeric_left_only_offset():
    a = ColumnAnalyzer()
    cmap = {COL_ITEM_NAME: 0, COL_CURRENT: 1, COL_PREVIOUS: 2, COL_NOTE: 3}
    # empty current slot must NOT steal the previous-period value (right)
    vals = a.extract_values(["货币资金", "", "900.00", ""], cmap)
    assert "current_period" not in vals
    assert vals["previous_period"] == "900.00"
    # note recovers bidirectionally
    vals = a.extract_values(["货币资金", "1,000.00", "900.00", "", "六、1"],
                            {**cmap, COL_NOTE: 3})
    assert vals["note"] == "六、1"


# --- boundary filtering (table_extractor.py:194-273)

def test_filter_tables_by_boundary_split():
    table = [
        ["货币资金", "100.00", "90.00"],
        ["负债和所有者权益总计", "100.00", "90.00"],
        ["母公司资产负债表", "", ""],
        ["货币资金", "50.00", "40.00"],
    ]
    out = filter_tables_by_boundary([table])
    assert len(out) == 1
    assert [r[0] for r in out[0]] == ["货币资金", "负债和所有者权益总计"]


def test_filter_excludes_parent_only_table():
    parent = [["母公司资产负债表", "", ""], ["货币资金", "1.00", "2.00"]]
    assert filter_tables_by_boundary([parent]) == []


# --- cross-page merge header dedup (table_extractor.py:275-318)

def test_merge_header_dedup():
    t1 = [["项目", "本期末", "上期末", "附注"], ["货币资金", "1.00", "2.00", ""]]
    t2 = [["项目", "本期末", "上期末", "附注"], ["存货", "3.00", "4.00", ""]]
    merged = merge_cross_page_tables([t1, t2])
    assert [r[0] for r in merged] == ["项目", "货币资金", "存货"]
    # a data row is NOT mistaken for a header
    t3 = [["资产总计", "9.00", "9.00", ""]]
    merged = merge_cross_page_tables([t1, t3])
    assert [r[0] for r in merged] == ["项目", "货币资金", "资产总计"]


def test_clean_table_data():
    table = [[" 货币资金 \n", None, "1,000.00  "], [], [None, "", "  "]]
    cleaned = clean_table_data(table)
    assert cleaned == [["货币资金", "", "1,000.00"]]


# --- golden mini statement (balance_sheet.py:832-866)

GOLDEN = [
    ["项目", "本期末", "上期末", "附注"],
    ["流动资产：", "", "", ""],
    ["货币资金", "1000000.00", "900000.00", "六、1"],
    ["应收账款", "500000.00", "450000.00", "六、2"],
    ["存货", "300000.00", "280000.00", "六、3"],
    ["流动资产合计", "1800000.00", "1630000.00", ""],
    ["非流动资产：", "", "", ""],
    ["固定资产", "2000000.00", "1900000.00", "六、4"],
    ["无形资产", "100000.00", "95000.00", "六、5"],
    ["非流动资产合计", "2100000.00", "1995000.00", ""],
    ["资产总计", "3900000.00", "3625000.00", ""],
    ["流动负债：", "", "", ""],
    ["短期借款", "200000.00", "180000.00", "六、6"],
    ["应付账款", "300000.00", "250000.00", "六、7"],
    ["流动负债合计", "500000.00", "430000.00", ""],
    ["所有者权益：", "", "", ""],
    ["实收资本", "2000000.00", "2000000.00", "六、8"],
    ["未分配利润", "1400000.00", "1195000.00", "六、9"],
    ["所有者权益合计", "3400000.00", "3195000.00", ""],
    ["负债和所有者权益总计", "3900000.00", "3625000.00", ""],
]


def test_golden_balance_sheet():
    parsed = parse_statement(GOLDEN, "balance_sheet")
    names = [(e["section"], e["standard_name"]) for e in parsed["ordered_items"]]
    assert ("assets.current_assets", "货币资金") in names
    assert ("assets.assets_total", "assets_total") in names
    assert ("liabilities_and_equity_total", "liabilities_and_equity_total") in names
    got = parsed["sections"]["assets.current_assets"]["货币资金"]
    assert got["current_period"] == "1000000.00"
    assert got["previous_period"] == "900000.00"
    assert got["note"] == "六、1"
    # no non_current_liabilities section in the golden table -> that
    # subtotal check reports missing, but level3 balance holds
    v = validate_statement(parsed)
    assert not any(e.startswith("level3") for e in v["errors"])
    assert not any("mismatch" in e for e in v["errors"])


def test_golden_keep_first_dedup():
    table = GOLDEN[:3] + [["货币资金", "7.00", "8.00", "六、9"]] + GOLDEN[3:]
    parsed = parse_statement(table, "balance_sheet")
    assert parsed["sections"]["assets.current_assets"]["货币资金"]["current_period"] == "1000000.00"
    occurrences = [e for e in parsed["ordered_items"] if e["standard_name"] == "货币资金"]
    assert len(occurrences) == 1


# --- cross-page column change 4->3 (test_integration.py:46-83)

def test_cross_page_column_drop():
    t1 = GOLDEN[:6]
    t2 = [r[:3] for r in GOLDEN[6:]]  # note column vanishes mid-table
    merged = merge_cross_page_tables([t1, t2])
    parsed = parse_statement(merged, "balance_sheet")
    fixed = parsed["sections"]["assets.non_current_assets"]["固定资产"]
    assert fixed["current_period"] == "2000000.00"
    assert "note" not in fixed


# --- structure identification (statement_structure_identifier.py)

def test_structure_identification():
    s = identify_structure(GOLDEN, "balance_sheet")
    # golden has no 非流动负债 section -> invalid with partial confidence
    assert not s["is_valid"]
    assert "非流动负债" in s["missing_keys"]
    full = GOLDEN[:15] + [["非流动负债：", "", "", ""],
                          ["长期借款", "1.00", "1.00", ""],
                          ["非流动负债合计", "1.00", "1.00", ""]] + GOLDEN[15:]
    s = identify_structure(full, "balance_sheet")
    assert s["is_valid"]
    assert s["confidence"] == 1.0
    assert s["header_row"] == 0
    assert full[s["end_row"]][0] == "负债和所有者权益总计"


def test_end_row_fallback_plus_30():
    rows = [["项目", "本期末", "上期末"], ["流动资产：", "", ""], ["货币资金", "1.00", "1.00"],
            ["非流动资产：", "", ""], ["流动负债：", "", ""], ["非流动负债：", "", ""],
            ["所有者权益：", "", ""]]
    rows += [["其他科目%d" % i, "1.00", "1.00"] for i in range(60)]
    s = identify_structure(rows, "balance_sheet")
    assert s["is_valid"]
    assert s["end_row"] == 6 + 30  # last anchor + 30 fallback


# --- notes title model

def test_classify_title():
    assert docproc.classify_title("1、 货币资金") == (1, "1", "货币资金")
    assert docproc.classify_title("12、应收账款") == (2, "2", "应收账款") or \
        docproc.classify_title("12、应收账款") == (1, "12", "应收账款")
    assert docproc.classify_title("(1). 应收票据分类列示")[0] == 2
    assert docproc.classify_title("（2） 账龄分析") == (2, "2", "账龄分析")
    assert docproc.classify_title("普通文本") is None
    assert docproc.classify_title("1、 2,345.00") is None  # digits-only title rejected


def test_langid_heuristic_on_known_languages():
    import pyarrow as pa
    from pdf_context_extractor_agent_ray.functions.text import langid_batch
    batch = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["the cat and the dog went to the park",
                 "der Hund und die Katze sind nicht ein Problem",
                 "le chat est dans la maison et les jardins",
                 "xyzzy plugh 42"],
    })
    out = langid_batch(batch).to_pydict()
    assert out["pred_lang"] == ["en", "de", "fr", "und"]


def test_multi_statement_doc_boundary_isolation():
    """A document with a balance sheet AND an income statement: the BS
    boundary isolates the BS table; income rows never leak into the
    statement parse (they live outside the boundary pages)."""
    from pdf_context_extractor_agent_ray.synth import generate_doc
    from pdf_context_extractor_agent_ray.oracle.extractor import extract_doc_dict
    d = generate_doc("multistmt-001", family="bs_plus_income")
    r = extract_doc_dict(d)
    assert r["statement_type"] == "balance_sheet"
    assert r["valid"]
    sections = {s[1].split("|")[0] for s in r["spans"] if s[0] in ("item", "subtotal", "total")}
    assert all(sec.startswith(("assets", "liabilities", "equity")) for sec in sections)
