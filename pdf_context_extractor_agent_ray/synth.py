"""Deterministic synthetic interleaved-document generator.

Generates documents in the FIXTURES.md families (F1-F8): statement
tables with internally consistent arithmetic (so the oracle's 3-level
validation passes by construction), cross-page splits with repeated
headers, header-format variants, merged-cell column shifts, notes
sections with title hierarchies and positioned tables, boundary noise
(parent-company statement), and skew pathologies (many pages /
media-heavy / no statement / duplicate items).

Determinism: every document is generated from
``rng = random.Random(blake2b(doc_key))`` — independent of generation
order, process, or partitioning, so the same doc_id always yields the
same spans (required for resume + the driver's repeated runs).
"""
from __future__ import annotations

import hashlib
import random
from typing import Any, Optional

from .patterns import CELL_SEP

# bump when generation changes: versions the derived spans-parquet
# artifact (sources.synth_source.ensure_spans_parquet) so stale caches
# under /tmp never feed the SQL oracles
SYNTH_VERSION = "1"

FAMILIES = [
    # (family, weight)
    ("bs_simple", 18),
    ("bs_crosspage", 10),
    ("bs_header_variant", 8),
    ("bs_colshift", 6),
    ("bs_dup_items", 4),
    ("bs_invalid", 4),
    ("bs_boundary_noise", 6),
    ("income", 12),
    ("cashflow", 10),
    ("notes_only", 10),
    ("media_heavy", 4),
    ("no_statement", 4),
    ("many_pages", 2),
    ("bs_with_notes", 12),
    ("bs_plus_income", 4),
]
_TOTAL_W = sum(w for _, w in FAMILIES)

HEADER_STYLES = [
    ["项目", "本期末", "上期末", "附注"],
    ["项目", "期末余额", "期初余额", "附注"],
    ["项目", "本年末", "上年末", "附注"],
    ["项目", "2024年期末", "2023年期末", "附注"],
    ["项目", "2024 年12月 31日", "2023 年12月 31日", "附注"],
    ["项目", "附注", "期末余额", "期初余额"],  # note-before-amount ordering
]

CURRENT_ASSET_NAMES = ["货币资金", "交易性金融资产", "应收票据", "应收账款",
                       "预付款项", "其他应收款", "存货", "合同资产", "其他流动资产"]
NON_CURRENT_ASSET_NAMES = ["债权投资", "长期股权投资", "投资性房地产", "固定资产",
                           "在建工程", "使用权资产", "无形资产", "商誉",
                           "长期待摊费用", "递延所得税资产"]
CURRENT_LIAB_NAMES = ["短期借款", "应付票据", "应付账款", "合同负债",
                      "应付职工薪酬", "应交税费", "其他应付款", "其他流动负债"]
NON_CURRENT_LIAB_NAMES = ["长期借款", "应付债券", "租赁负债", "长期应付款",
                          "预计负债", "递延收益", "递延所得税负债"]
EQUITY_NAMES = ["实收资本", "资本公积", "其他综合收益", "盈余公积", "未分配利润"]

BOILERPLATE = [
    "公司2024年度报告全文", "第十节 财务报告", "审计意见类型：标准无保留意见",
    "本公司董事会及全体董事保证本报告内容真实、准确、完整", "单位：元 币种：人民币",
    "合并及母公司财务报表附注", "重要提示：本报告涉及的前瞻性描述不构成实质承诺",
]

NOTE_TITLES = ["货币资金", "交易性金融资产", "应收票据", "应收账款", "存货",
               "固定资产", "无形资产", "短期借款", "应付账款", "长期借款",
               "实收资本", "营业收入", "营业成本", "投资收益", "所得税费用"]
NOTE_SUBTITLES = ["明细情况", "分类列示", "账龄分析", "期末余额构成", "减值准备变动"]
NOTE_NARRATIVE = [
    "本期末较上期末变动主要系经营规模扩大所致。",
    "上述款项不存在因抵押、质押或冻结等对使用有限制的情况。",
    "公司按照预期信用损失模型计提减值准备。",
    "其他说明：无。",
    "期末余额中不存在持有待售的资产。",
]


def _seed_for(doc_key: str) -> int:
    return int.from_bytes(hashlib.blake2b(doc_key.encode(), digest_size=8).digest(), "big")


def family_for(doc_key: str) -> str:
    rng = random.Random(_seed_for(doc_key) ^ 0x5F5F)
    x = rng.randrange(_TOTAL_W)
    acc = 0
    for fam, w in FAMILIES:
        acc += w
        if x < acc:
            return fam
    return "bs_simple"


def _fmt(v: float) -> str:
    return f"{v:,.2f}"


class _DocBuilder:
    def __init__(self) -> None:
        self.spans: list[tuple[str, str, str, int]] = []
        self.page = 1
        self.table_idx = 0
        self._off = 0

    def _next(self) -> int:
        o = self._off
        self._off += 1
        return o

    def text(self, t: str) -> None:
        self.spans.append(("text", t, "", self._next()))

    def media(self, media_id: str) -> None:
        self.spans.append(("media", f"blob:{media_id}", f"img:{media_id}", self._next()))

    def page_break(self) -> None:
        self.spans.append(("page_break", str(self.page), "", self._next()))
        self.page += 1
        self.table_idx = 0

    def table(self, rows: list[list[str]]) -> None:
        ref = f"p{self.page}:t{self.table_idx}"
        self.table_idx += 1
        for row in rows:
            self.spans.append(("table_row", CELL_SEP.join(row), ref, self._next()))


def _values_pair(rng: random.Random, lo: float = 1e4, hi: float = 5e7) -> tuple[float, float]:
    cur = round(rng.uniform(lo, hi), 2)
    prev = round(cur * rng.uniform(0.7, 1.3), 2)
    return cur, prev


def _bs_rows(rng: random.Random, header: list[str], *,
             dup_items: bool = False, colshift: bool = False,
             invalid: bool = False) -> list[list[str]]:
    """Balance-sheet rows whose three validation levels pass by
    construction (unless ``invalid``)."""
    note_col = header.index("附注") if "附注" in header else None
    amount_first = note_col != 1  # style 6 puts the note before amounts

    def mkrow(name: str, cur: Optional[float], prev: Optional[float],
              note: Optional[str] = None, shift: Optional[str] = None) -> list[str]:
        c = _fmt(cur) if cur is not None else ""
        p = _fmt(prev) if prev is not None else ""
        n = note or ""
        if not amount_first:
            return [name, n, c, p][:len(header)]
        if shift == "numeric_left":
            # merged-cell shift (F4): the current-period slot is empty and
            # the value sits one column left of the previous-period slot;
            # the left-only recovery rule (column_analyzer.py:402-403) must
            # NOT steal it for current_period.
            return [name, "", c, n][:len(header)]
        if shift == "wide_note":
            # extra merged cell widens the row by one; forces the dynamic
            # per-row re-analysis path (base_statement_parser.py:134-149)
            return [name, c, p, "", n]
        return [name, c, p, n][:len(header)]

    rows: list[list[str]] = [header[:]]
    note_n = 1

    def section(title: str, names: list[str], k: int,
                lo: float = 1e5, hi: float = 2e7) -> tuple[list[tuple[str, float, float]], float, float]:
        nonlocal note_n
        rows.append([title] + [""] * (len(header) - 1))
        chosen = rng.sample(names, min(k, len(names)))
        chosen = [n for n in names if n in chosen]  # keep canonical order
        items = []
        for name in chosen:
            cur, prev = _values_pair(rng, lo, hi)
            items.append((name, cur, prev))
            rows.append(mkrow(name, cur, prev, f"六、{note_n}"))
            note_n += 1
        if dup_items and chosen:
            # duplicated row: keep-first must win (balance_sheet.py:299-301)
            name, cur, prev = items[0]
            rows.append(mkrow(name, round(cur * 0.5, 2), round(prev * 0.5, 2)))
        csum = round(sum(i[1] for i in items), 2)
        psum = round(sum(i[2] for i in items), 2)
        return items, csum, psum

    _, ca_c, ca_p = section("流动资产：", CURRENT_ASSET_NAMES, rng.randint(4, 7))
    rows.append(mkrow("流动资产合计", ca_c, ca_p))
    _, nca_c, nca_p = section("非流动资产：", NON_CURRENT_ASSET_NAMES, rng.randint(4, 7))
    rows.append(mkrow("非流动资产合计", nca_c, nca_p))
    at_c, at_p = round(ca_c + nca_c, 2), round(ca_p + nca_p, 2)
    rows.append(mkrow("资产总计", at_c, at_p))

    _, cl_c, cl_p = section("流动负债：", CURRENT_LIAB_NAMES, rng.randint(3, 6))
    rows.append(mkrow("流动负债合计", cl_c, cl_p))
    _, ncl_c, ncl_p = section("非流动负债：", NON_CURRENT_LIAB_NAMES, rng.randint(2, 5))
    rows.append(mkrow("非流动负债合计", ncl_c, ncl_p))
    lt_c, lt_p = round(cl_c + ncl_c, 2), round(cl_p + ncl_p, 2)
    rows.append(mkrow("负债合计", lt_c, lt_p))

    # equity distributed so assets == liabilities + equity exactly
    eq_c, eq_p = round(at_c - lt_c, 2), round(at_p - lt_p, 2)
    rows.append(["所有者权益：" if rng.random() < 0.7 else "所有者权益（或股东权益）："]
                + [""] * (len(header) - 1))
    k = rng.randint(3, len(EQUITY_NAMES))
    names = EQUITY_NAMES[:k]
    shares_c = [round(rng.uniform(0.05, 0.4), 4) for _ in names[:-1]]
    parts_c = [round(eq_c * s, 2) for s in shares_c]
    parts_c.append(round(eq_c - sum(parts_c), 2))
    parts_p = [round(eq_p * s, 2) for s in shares_c]
    parts_p.append(round(eq_p - sum(parts_p), 2))
    use_treasury = rng.random() < 0.3
    if use_treasury:
        # deduction item: 减：库存股 subtracts (balance_sheet.py:737-765)
        t_c, t_p = round(abs(parts_c[0]) * 0.1, 2), round(abs(parts_p[0]) * 0.1, 2)
        parts_c[-1] = round(parts_c[-1] + t_c, 2)
        parts_p[-1] = round(parts_p[-1] + t_p, 2)
    for i, name in enumerate(names):
        # equity shifts only: the equity-subtotal check is warning-level
        # (balance_sheet.py:510-520), so the lost value flags a warning,
        # not an error — the doc stays comparable without going invalid.
        shift = None
        if colshift and i == 1:
            shift = "numeric_left"
        elif colshift and i == 2:
            shift = "wide_note"
        rows.append(mkrow(name, parts_c[i], parts_p[i],
                          note=(f"六、{90 + i}" if shift == "wide_note" else None),
                          shift=shift))
        if use_treasury and i == 0:
            rows.append(mkrow("减：库存股", t_c, t_p))
    rows.append(mkrow("所有者权益合计", eq_c, eq_p))

    total_c = at_c if not invalid else round(at_c * 1.05, 2)
    rows.append(mkrow("负债和所有者权益总计", total_c, at_p))
    return rows


def _income_rows(rng: random.Random) -> list[list[str]]:
    header = ["项目", "本期金额", "上期金额"]
    rows = [header[:]]
    oc = round(rng.uniform(1e6, 1e8), 2)
    taxes = round(oc * 0.05, 2)
    selling = round(oc * 0.12, 2)
    admin = round(oc * 0.08, 2)
    rd = round(oc * 0.1, 2)
    fin = round(oc * 0.02, 2)
    total_cost = round(oc + taxes + selling + admin + rd + fin, 2)
    total_rev = round(total_cost * rng.uniform(1.05, 1.5), 2)
    op_profit = round(total_rev - total_cost, 2)
    non_op_in = round(op_profit * 0.02, 2)
    non_op_out = round(op_profit * 0.01, 2)
    total_profit = round(op_profit + non_op_in - non_op_out, 2)
    tax = round(total_profit * 0.15, 2)
    net = round(total_profit - tax, 2)
    minority = round(net * rng.uniform(0.0, 0.2), 2)
    parent = round(net - minority, 2)

    def prev(v: float) -> float:
        return round(v * 0.9, 2)

    def r(name: str, v: Optional[float]) -> list[str]:
        return [name, _fmt(v) if v is not None else "", _fmt(prev(v)) if v is not None else ""]

    rows += [
        r("一、营业总收入", total_rev),
        r("其中：营业收入", total_rev),
        r("二、营业总成本", total_cost),
        r("其中：营业成本", oc),
        r("税金及附加", taxes),
        r("销售费用", selling),
        r("管理费用", admin),
        r("研发费用", rd),
        r("财务费用", fin),
        r("三、营业利润", op_profit),
        r("加：营业外收入", non_op_in),
        r("减：营业外支出", non_op_out),
        r("四、利润总额", total_profit),
        r("减：所得税费用", tax),
        r("五、净利润", net),
        r("归属于母公司所有者的净利润", parent),
        r("少数股东损益", minority),
        r("六、其他综合收益的税后净额", round(net * 0.01, 2)),
        r("七、综合收益总额", round(net * 1.01, 2)),
        ["八、每股收益", "", ""],
        r("基本每股收益", round(net / 1e7, 2)),
        r("稀释每股收益", round(net / 1e7, 2)),
    ]
    return rows


def _cashflow_rows(rng: random.Random) -> list[list[str]]:
    header = ["项目", "本期金额", "上期金额"]
    rows = [header[:]]

    def prev(v: float) -> float:
        return round(v * 0.85, 2)

    def r(name: str, v: Optional[float]) -> list[str]:
        return [name, _fmt(v) if v is not None else "", _fmt(prev(v)) if v is not None else ""]

    o_in = [round(rng.uniform(1e6, 5e7), 2) for _ in range(3)]
    o_in_sub = round(sum(o_in), 2)
    o_out = [round(rng.uniform(1e6, 3e7), 2) for _ in range(4)]
    o_out_sub = round(sum(o_out), 2)
    o_net = round(o_in_sub - o_out_sub, 2)
    i_in = [round(rng.uniform(1e5, 1e7), 2) for _ in range(2)]
    i_in_sub = round(sum(i_in), 2)
    i_out = [round(rng.uniform(1e5, 2e7), 2) for _ in range(2)]
    i_out_sub = round(sum(i_out), 2)
    i_net = round(i_in_sub - i_out_sub, 2)
    f_in = [round(rng.uniform(1e5, 2e7), 2) for _ in range(2)]
    f_in_sub = round(sum(f_in), 2)
    f_out = [round(rng.uniform(1e5, 1e7), 2) for _ in range(2)]
    f_out_sub = round(sum(f_out), 2)
    f_net = round(f_in_sub - f_out_sub, 2)
    fx = round(rng.uniform(-1e5, 1e5), 2)
    ni = round(o_net + i_net + f_net + fx, 2)
    beg = round(rng.uniform(1e6, 1e8), 2)
    end = round(beg + ni, 2)

    rows += [
        ["一、经营活动产生的现金流量：", "", ""],
        r("销售商品、提供劳务收到的现金", o_in[0]),
        r("收到的税费返还", o_in[1]),
        r("收到其他与经营活动有关的现金", o_in[2]),
        r("经营活动现金流入小计", o_in_sub),
        r("购买商品、接受劳务支付的现金", o_out[0]),
        r("支付给职工以及为职工支付的现金", o_out[1]),
        r("支付的各项税费", o_out[2]),
        r("支付其他与经营活动有关的现金", o_out[3]),
        r("经营活动现金流出小计", o_out_sub),
        r("经营活动产生的现金流量净额", o_net),
        ["二、投资活动产生的现金流量：", "", ""],
        r("收回投资收到的现金", i_in[0]),
        r("取得投资收益收到的现金", i_in[1]),
        r("投资活动现金流入小计", i_in_sub),
        r("购建固定资产、无形资产和其他长期资产支付的现金", i_out[0]),
        r("投资支付的现金", i_out[1]),
        r("投资活动现金流出小计", i_out_sub),
        r("投资活动产生的现金流量净额", i_net),
        ["三、筹资活动产生的现金流量：", "", ""],
        r("吸收投资收到的现金", f_in[0]),
        r("取得借款收到的现金", f_in[1]),
        r("筹资活动现金流入小计", f_in_sub),
        r("偿还债务支付的现金", f_out[0]),
        r("分配股利、利润或偿付利息支付的现金", f_out[1]),
        r("筹资活动现金流出小计", f_out_sub),
        r("筹资活动产生的现金流量净额", f_net),
        r("四、汇率变动对现金及现金等价物的影响", fx),
        r("五、现金及现金等价物净增加额", ni),
        r("加：期初现金及现金等价物余额", beg),
        r("六、期末现金及现金等价物余额", end),
    ]
    return rows


def _emit_notes_pages(b: _DocBuilder, rng: random.Random, n_pages: int,
                      start_number: int = 1, with_break: bool = False) -> None:
    number = start_number
    for _ in range(n_pages):
        b.page_break()
        b.text("合并财务报表项目注释")
        n_titles = rng.randint(1, 3)
        for _ in range(n_titles):
            if with_break and rng.random() < 0.15:
                number += 1  # numbering skip → continuity warning path
            title = rng.choice(NOTE_TITLES)
            b.text(f"{number}、 {title}")
            number += 1
            for _ in range(rng.randint(1, 2)):
                b.text(rng.choice(NOTE_NARRATIVE))
            n_sub = rng.randint(0, 2)
            if n_sub:
                for si in range(1, n_sub + 1):
                    b.text(f"（{si}） {rng.choice(NOTE_SUBTITLES)}")
                    b.text(rng.choice(NOTE_NARRATIVE))
                    if rng.random() < 0.7:
                        b.table([["项目", "期末余额", "期初余额"],
                                 ["账面余额", _fmt(rng.uniform(1e4, 1e7)), _fmt(rng.uniform(1e4, 1e7))]])
            else:
                if rng.random() < 0.6:
                    b.table([["项目", "期末余额", "期初余额"],
                             ["小计", _fmt(rng.uniform(1e4, 1e7)), _fmt(rng.uniform(1e4, 1e7))]])
        if rng.random() < 0.2:
            b.media(f"n{b.page}x{rng.randint(0, 99)}")


def _emit_statement_pages(b: _DocBuilder, rng: random.Random, rows: list[list[str]],
                          title: Optional[str], split: bool, repeat_header: bool,
                          drop_note_col: bool = False) -> None:
    if title:
        b.text(title)
    if not split or len(rows) < 8:
        b.table(rows)
        return
    cut = rng.randint(len(rows) // 3, 2 * len(rows) // 3)
    b.table(rows[:cut])
    b.page_break()
    rest = rows[cut:]
    if repeat_header:
        rest = [rows[0]] + rest
    if drop_note_col:
        rest = [r[:3] for r in rest]
    b.table(rest)


def generate_doc(doc_key: str, family: Optional[str] = None) -> dict[str, Any]:
    """Deterministically generate one document's spans."""
    rng = random.Random(_seed_for(doc_key))
    fam = family or family_for(doc_key)
    b = _DocBuilder()

    # leading boilerplate page (must not leak into output, F7)
    for _ in range(rng.randint(1, 3)):
        b.text(rng.choice(BOILERPLATE))

    if fam == "bs_plus_income":
        # multi-statement document: consolidated balance sheet, then an
        # income statement on later pages — the BS boundary must isolate
        # the BS table (the income table never enters the statement
        # parse; its pages are still scanned for notes)
        header = HEADER_STYLES[0]
        b.page_break()
        _emit_statement_pages(b, rng, _bs_rows(rng, header), "合并资产负债表",
                              split=False, repeat_header=True)
        b.page_break()
        _emit_statement_pages(b, rng, _income_rows(rng), "合并利润表",
                              split=False, repeat_header=False)
    elif fam.startswith("bs"):
        header = HEADER_STYLES[0]
        if fam == "bs_header_variant":
            header = HEADER_STYLES[rng.randrange(len(HEADER_STYLES))]
        rows = _bs_rows(rng, header,
                        dup_items=(fam == "bs_dup_items"),
                        colshift=(fam == "bs_colshift"),
                        invalid=(fam == "bs_invalid"))
        if fam == "bs_boundary_noise":
            # parent-company statement inside the same table after the end
            # marker (src/table_extractor.py:194-273 split path)
            extra = [["母公司资产负债表", "", "", ""][:len(header)]]
            extra += [["货币资金", _fmt(rng.uniform(1e4, 1e6)), _fmt(rng.uniform(1e4, 1e6)), ""][:len(header)]]
            rows = rows + extra
        b.page_break()
        _emit_statement_pages(
            b, rng, rows, "合并资产负债表",
            split=(fam == "bs_crosspage" or (fam == "bs_with_notes" and rng.random() < 0.4)),
            repeat_header=True,
            drop_note_col=(fam == "bs_crosspage" and rng.random() < 0.5))
        if fam == "bs_with_notes":
            _emit_notes_pages(b, rng, rng.randint(1, 3))
    elif fam == "income":
        b.page_break()
        _emit_statement_pages(b, rng, _income_rows(rng), "合并利润表",
                              split=rng.random() < 0.3, repeat_header=False)
    elif fam == "cashflow":
        b.page_break()
        _emit_statement_pages(b, rng, _cashflow_rows(rng), "合并现金流量表",
                              split=rng.random() < 0.3, repeat_header=False)
    elif fam == "notes_only":
        _emit_notes_pages(b, rng, rng.randint(1, 4), with_break=rng.random() < 0.3)
    elif fam == "media_heavy":
        for _ in range(rng.randint(2, 4)):
            b.page_break()
            for _ in range(rng.randint(10, 30)):
                b.media(f"m{b.page}x{rng.randint(0, 9999)}")
            if rng.random() < 0.3:
                b.text(rng.choice(BOILERPLATE))
    elif fam == "no_statement":
        for _ in range(rng.randint(1, 3)):
            b.page_break()
            for _ in range(rng.randint(3, 8)):
                b.text(rng.choice(BOILERPLATE))
    elif fam == "many_pages":
        _emit_notes_pages(b, rng, rng.randint(20, 40), with_break=True)

    # trailing media on some docs
    if rng.random() < 0.2:
        b.media(f"t{rng.randint(0, 999)}")

    return {"doc_id": doc_key, "spans": b.spans, "family": fam}


def generate_corpus(n_docs: int, seed: int = 42,
                    prefix: str = "synth") -> list[dict[str, Any]]:
    """Deterministic corpus: doc i has key ``{prefix}-{seed}-{i:06d}``."""
    return [generate_doc(f"{prefix}-{seed}-{i:06d}") for i in range(n_docs)]
