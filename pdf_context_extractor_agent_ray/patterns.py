"""Pattern banks shared by the oracle and all Ray stages.

These regex banks reproduce the classification *semantics* of the
reference extractor (cuiqinsain-cloud/pdf_context_extractor_agent). The banks are
data, not code: one compiled-bank singleton per worker process so an
actor-pool stage pays compilation once (reference compiles per parser
instance: src/parsers/balance_sheet.py:25-112, income_statement.py:22-75,
cash_flow.py:22-73, column_analyzer.py:28-45,
statement_structure_identifier.py:33-71, table_extractor.py:16-32).
"""
from __future__ import annotations

import re
from functools import lru_cache

# ---------------------------------------------------------------------------
# Balance-sheet boundary markers (src/table_extractor.py:16-32)
# ---------------------------------------------------------------------------
BALANCE_SHEET_START_PATTERNS = [r"合并资产负债表", r"资产负债表"]
BALANCE_SHEET_END_PATTERNS = [
    r"负债和所有者权益总计",
    r"负债和所有者权益（或股东权益）总计",
    r"负债和股东权益总计",
]
NEXT_TABLE_PATTERNS = [r"母公司资产负债表", r"母公司合并资产负债表"]

# ---------------------------------------------------------------------------
# Cross-page header re-detection keywords (src/table_extractor.py:301-312)
# ---------------------------------------------------------------------------
HEADER_KEYWORD_PAIRS = [
    ("项目", "附注"),
    ("本期末", "上期末"),
    ("2024年", "2023年"),
]

# ---------------------------------------------------------------------------
# Column-type keyword banks (src/parsers/column_analyzer.py:28-45)
# ---------------------------------------------------------------------------
COL_ITEM_NAME = "item_name"
COL_CURRENT = "current_period"
COL_PREVIOUS = "previous_period"
COL_NOTE = "note"

COLUMN_KEYWORDS = {
    COL_ITEM_NAME: [r"项目", r"科目", r"会计科目", r"资产", r"负债", r"所有者权益"],
    COL_CURRENT: [
        r"期末", r"本期末", r"本年末", r"本期", r"2024\s*年.*期末",
        r"2024\s*年.*12\s*月.*31\s*日", r"当期", r"本年", r"年末余额", r"期末余额",
        r"本年度", r"2024\s*年度", r"本期金额", r"本期发生额",
    ],
    COL_PREVIOUS: [
        r"期初", r"上期末", r"上年末", r"上期", r"2023\s*年.*期末",
        r"2023\s*年.*12\s*月.*31\s*日", r"上年", r"年初余额", r"期初余额",
        r"上年度", r"2023\s*年度", r"上期金额", r"上期发生额",
    ],
    COL_NOTE: [r"附注", r"注释", r"注", r"备注"],
}

# Cell-format predicates (src/parsers/column_analyzer.py:196-241)
NOTE_FORMAT_PATTERNS = [
    r"[一二三四五六七八九十]+、\d+",
    r"[一二三四五六七八九十]+\(\d+\)",
    r"[一二三四五六七八九十]+、\(\d+\)",
]
NUMERIC_FORMAT_PATTERN = r"^\s*-?(\d{1,3}(,\d{3})*|\d+)(\.\d+)?\s*$"

# ---------------------------------------------------------------------------
# Statement structure banks (src/parsers/statement_structure_identifier.py:33-71)
# Each entry: (name, [patterns], required)
# ---------------------------------------------------------------------------
KEY_STRUCTURES = {
    "balance_sheet": [
        ("流动资产", [r"^流动资产：?$"], True),
        ("非流动资产", [r"^非流动资产：?$"], True),
        ("流动负债", [r"^流动负债：?$"], True),
        ("非流动负债", [r"^非流动负债：?$"], True),
        ("所有者权益", [r"^所有者权益.*：?$", r"^股东权益.*：?$"], True),
    ],
    "income_statement": [
        ("营业总收入", [r"^一、营业总收入$", r"^营业总收入$"], True),
        ("营业总成本", [r"^二、营业总成本$", r"^营业总成本$"], True),
        ("营业利润", [r"^三、营业利润", r"^二、营业利润", r"^营业利润"], True),
        ("利润总额", [r"^四、利润总额", r"^三、利润总额", r"^利润总额"], True),
        ("净利润", [r"^五、净利润", r"^四、净利润", r"^净利润(?!（)"], True),
        ("其他综合收益", [r"^六、其他综合收益的税后净额", r"^其他综合收益.*税后净额"], False),
        ("综合收益总额", [r"^七、综合收益总额", r"^八、综合收益总额", r"^综合收益总额"], False),
        ("每股收益", [r"^八、每股收益", r"^九、每股收益"], False),
    ],
    "cash_flow": [
        ("经营活动", [r"^一、经营活动产生的现金流\s*量：?$"], True),
        ("经营活动流入小计", [r"^经营活动现金流入小计$"], True),
        ("经营活动流出小计", [r"^经营活动现金流出小计$"], True),
        ("经营活动净额", [r"^经营活动产生的现金流\s*量净\s*额$", r"^经营活动产生的现金流量净额$"], True),
        ("投资活动", [r"^二、投资活动产生的现金流\s*量：?$"], True),
        ("投资活动流入小计", [r"^投资活动现金流入小计$"], True),
        ("投资活动流出小计", [r"^投资活动现金流出小计$"], True),
        ("投资活动净额", [r"^投资活动产生的现金流\s*量净\s*额$", r"^投资活动产生的现金流量净额$"], True),
        ("筹资活动", [r"^三、筹资活动产生的现金流\s*量：?$"], True),
        ("筹资活动流入小计", [r"^筹资活动现金流入小计$"], True),
        ("筹资活动流出小计", [r"^筹资活动现金流出小计$"], True),
        ("筹资活动净额", [r"^筹资活动产生的现金流\s*量净\s*额$", r"^筹资活动产生的现金流量净额$"], True),
        ("汇率影响", [r"^四、汇率变动对现金及现金等\s*价物的\s*影响$"], False),
        ("现金净增加额", [r"^五、现金及现金等价物净增加\s*额$"], False),
        ("期末余额", [r"^六、期末现金及现金等价物余\s*额$"], True),
    ],
}

END_PATTERNS = {
    "balance_sheet": [
        r"^负债和所有者权益总计$",
        r"^负债和所有者权益.*总计$",
        r"^负债和股东权益.*总计$",
    ],
    "income_statement": [r"^.*稀释每股收益.*$"],
    "cash_flow": [r"^六、期末现金及现金等价物余\s*额$"],
}

# ---------------------------------------------------------------------------
# Item classification banks. Ordered list of (section_path, standard_name,
# [patterns]) — first match wins across the whole bank, mirroring the
# cascaded section checks of the reference parsers.
# ---------------------------------------------------------------------------
BALANCE_SHEET_ITEMS = [
    # assets.current_assets (src/parsers/balance_sheet.py:27-41)
    ("assets.current_assets", "货币资金", [r"货币资金"]),
    ("assets.current_assets", "交易性金融资产", [r"交易性金融资产"]),
    ("assets.current_assets", "衍生金融资产", [r"衍生金融资产"]),
    ("assets.current_assets", "应收票据", [r"应收票据"]),
    ("assets.current_assets", "应收账款", [r"应收账款"]),
    ("assets.current_assets", "应收款项融资", [r"应收款项融资"]),
    ("assets.current_assets", "预付款项", [r"预付款项"]),
    ("assets.current_assets", "其他应收款", [r"其他应收款"]),
    ("assets.current_assets", "存货", [r"存货"]),
    ("assets.current_assets", "合同资产", [r"合同资产"]),
    ("assets.current_assets", "持有待售资产", [r"持有待售资产"]),
    ("assets.current_assets", "一年内到期的非流动资产", [r"一年内到期的非流动资产"]),
    ("assets.current_assets", "其他流动资产", [r"其他流动资产"]),
    # assets.non_current_assets (balance_sheet.py:43-62)
    # unanchored 债权投资 precedes (and therefore shadows) 其他债权投资 —
    # reference-faithful dict order (balance_sheet.py:44-45)
    ("assets.non_current_assets", "债权投资", [r"债权投资"]),
    ("assets.non_current_assets", "其他债权投资", [r"其他债权投资"]),
    ("assets.non_current_assets", "长期应收款", [r"长期应收款"]),
    ("assets.non_current_assets", "长期股权投资", [r"长期股权投资"]),
    ("assets.non_current_assets", "其他权益工具投资", [r"其他权益工具投资"]),
    ("assets.non_current_assets", "其他非流动金融资产", [r"其他非流动金融资产"]),
    ("assets.non_current_assets", "投资性房地产", [r"投资性房地产"]),
    ("assets.non_current_assets", "固定资产", [r"固定资产"]),
    ("assets.non_current_assets", "在建工程", [r"在建工程"]),
    ("assets.non_current_assets", "生产性生物资产", [r"生产性生物资产"]),
    ("assets.non_current_assets", "油气资产", [r"油气资产"]),
    ("assets.non_current_assets", "使用权资产", [r"使用权资产"]),
    ("assets.non_current_assets", "无形资产", [r"无形资产"]),
    ("assets.non_current_assets", "开发支出", [r"开发支出"]),
    ("assets.non_current_assets", "商誉", [r"商誉"]),
    ("assets.non_current_assets", "长期待摊费用", [r"长期待摊费用"]),
    ("assets.non_current_assets", "递延所得税资产", [r"递延所得税资产"]),
    ("assets.non_current_assets", "其他非流动资产", [r"其他非流动资产"]),
    # liabilities.current_liabilities (balance_sheet.py:68-82)
    ("liabilities.current_liabilities", "短期借款", [r"短期借款"]),
    ("liabilities.current_liabilities", "交易性金融负债", [r"交易性金融负债"]),
    ("liabilities.current_liabilities", "衍生金融负债", [r"衍生金融负债"]),
    ("liabilities.current_liabilities", "应付票据", [r"应付票据"]),
    ("liabilities.current_liabilities", "应付账款", [r"应付账款"]),
    ("liabilities.current_liabilities", "预收款项", [r"预收款项"]),
    ("liabilities.current_liabilities", "合同负债", [r"合同负债"]),
    ("liabilities.current_liabilities", "应付职工薪酬", [r"^应付职工薪酬$"]),
    ("liabilities.current_liabilities", "应交税费", [r"应交税费"]),
    ("liabilities.current_liabilities", "其他应付款", [r"其他应付款"]),
    ("liabilities.current_liabilities", "持有待售负债", [r"持有待售负债"]),
    ("liabilities.current_liabilities", "一年内到期的非流动负债", [r"一年内到期的非流动负债"]),
    ("liabilities.current_liabilities", "其他流动负债", [r"其他流动负债"]),
    # liabilities.non_current_liabilities (balance_sheet.py:84-96).
    # 优先股/永续债 appear here AND under equity.items with identical
    # patterns; first-match routes such rows to liabilities exactly as
    # the reference's section iteration order does (:87-88 vs :103-104)
    ("liabilities.non_current_liabilities", "长期借款", [r"长期借款"]),
    ("liabilities.non_current_liabilities", "应付债券", [r"应付债券"]),
    ("liabilities.non_current_liabilities", "其中：优先股", [r"其中：优先股"]),
    ("liabilities.non_current_liabilities", "永续债", [r"永续债"]),
    ("liabilities.non_current_liabilities", "租赁负债", [r"租赁负债"]),
    ("liabilities.non_current_liabilities", "长期应付款", [r"长期应付款"]),
    ("liabilities.non_current_liabilities", "长期应付职工薪酬", [r"长期应付职工薪酬"]),
    ("liabilities.non_current_liabilities", "预计负债", [r"预计负债"]),
    ("liabilities.non_current_liabilities", "递延收益", [r"递延收益"]),
    ("liabilities.non_current_liabilities", "递延所得税负债", [r"递延所得税负债"]),
    ("liabilities.non_current_liabilities", "其他非流动负债", [r"其他非流动负债"]),
    # equity.items (balance_sheet.py:100-112)
    ("equity.items", "实收资本", [r"实收资本", r"股本"]),
    ("equity.items", "其他权益工具", [r"其他权益工具"]),
    ("equity.items", "其中：优先股", [r"其中：优先股"]),
    ("equity.items", "永续债", [r"永续债"]),
    ("equity.items", "资本公积", [r"资本公积"]),
    ("equity.items", "减：库存股", [r"减：库存股"]),
    ("equity.items", "其他综合收益", [r"其他综合收益"]),
    ("equity.items", "专项储备", [r"专项储备"]),
    ("equity.items", "盈余公积", [r"盈余公积"]),
    ("equity.items", "未分配利润", [r"未分配利润"]),
    ("equity.items", "少数股东权益", [r"少数股东权益"]),
]

# Balance-sheet total/subtotal routing rules (balance_sheet.py:320-427) —
# anchored regexes evaluated in order, first match wins.
BALANCE_SHEET_TOTALS = [
    ("assets.current_assets_total", "current_assets_total", r"^流动资产合计$"),
    ("assets.non_current_assets_total", "non_current_assets_total", r"^非流动资产合计$"),
    ("assets.assets_total", "assets_total", r"资产总计"),
    ("liabilities.current_liabilities_total", "current_liabilities_total", r"^流动负债合计$"),
    ("liabilities.non_current_liabilities_total", "non_current_liabilities_total", r"^非流动负债合计$"),
    ("liabilities.liabilities_total", "liabilities_total", r"负债合计"),
    ("equity.parent_equity_total", "parent_equity_total",
     r"归属于母公司所有者权益（或股东权益）?\s*合\s*计|归属于母公司.*权益.*合\s*计"),
    ("equity.equity_total", "equity_total", r"^所有者权益.*?合\s*计$|^股东权益\s*合\s*计$"),
    ("liabilities_and_equity_total", "liabilities_and_equity_total",
     r"负债和所有者权益.{0,10}总计|负债和股东权益.{0,10}总计"),
]

INCOME_STATEMENT_ITEMS = [
    # revenue (src/parsers/income_statement.py:23-26)
    ("revenue", "operating_revenue", [r"^营业收入$", r"^其中：营业收入$"]),
    ("revenue", "operating_total_revenue", [r"^一、营业总收入$", r"^营业总收入$"]),
    # costs (income_statement.py:29-37)
    ("costs", "operating_cost", [r"^营业成本$", r"^其中：营业成本$"]),
    ("costs", "taxes_and_surcharges", [r"^税金及附加$"]),
    ("costs", "selling_expenses", [r"^销售费用$"]),
    ("costs", "administrative_expenses", [r"^管理费用$"]),
    ("costs", "rd_expenses", [r"^研发费用$"]),
    ("costs", "financial_expenses", [r"^财务费用$"]),
    ("costs", "operating_total_cost", [r"^二、营业总成本$", r"^营业总成本$"]),
    # other_items (income_statement.py:40-47)
    ("other_items", "other_income", [r"^加：其他收益$", r"^其他收益$"]),
    ("other_items", "investment_income", [r"^投资收益", r"^加：投资收益"]),
    # the joint-venture investment-income sub-row classifying as
    # fair_value_change mirrors the reference bank verbatim
    # (income_statement.py:43)
    ("other_items", "fair_value_change", [r"^公允价值变动收益", r"^其中：对联营企业和合营企业的投资收益"]),
    ("other_items", "credit_impairment", [r"^信用减值损失", r"^加：信用减值损失"]),
    ("other_items", "asset_impairment", [r"^资产减值损失", r"^加：资产减值损失"]),
    ("other_items", "asset_disposal", [r"^资产处置收益", r"^加：资产处置收益"]),
    # profit (income_statement.py:50-61)
    ("profit", "operating_profit", [r"^三、营业利润", r"^二、营业利润", r"^营业利润"]),
    ("profit", "non_operating_income", [r"^加：营业外收入", r"^营业外收入"]),
    ("profit", "non_operating_expenses", [r"^减：营业外支出", r"^营业外支出"]),
    ("profit", "total_profit", [r"^四、利润总额", r"^三、利润总额", r"^利润总额"]),
    ("profit", "income_tax", [r"^减：所得税费用", r"^所得税费用"]),
    ("profit", "net_profit", [r"^五、净利润", r"^四、净利润", r"^净利润(?!（)"]),
    ("profit", "continuing_operations_profit", [r"持续经营净利润", r"^1\.持续经营净利润"]),
    ("profit", "discontinued_operations_profit", [r"终止经营净利润", r"^2\.终止经营净利润"]),
    ("profit", "parent_net_profit", [r"归属于母公司.*的净利润", r"归属于母公司股东的净利润", r"^1\.归属于母公司"]),
    ("profit", "minority_profit", [r"少数股东损益", r"^2\.少数股东损益"]),
    # comprehensive_income (income_statement.py:64-69)
    ("comprehensive_income", "other_comprehensive_income",
     [r"^六、其他综合收益的税后净额", r"^其他综合收益.*税后净额"]),
    ("comprehensive_income", "total_comprehensive_income",
     [r"^七、综合收益总额", r"^八、综合收益总额", r"^综合收益总额"]),
    # NOTE the unparenthesized alternation r"^\(一\)|..." matches ANY
    # halfwidth "(一)" row — reference-faithful (income_statement.py:67,
    # 73 use the identical expressions; first-match precedence included)
    ("comprehensive_income", "parent_comprehensive_income",
     [r"归属于母公司.*的综合收益总额", r"归属.*母公司.*综合收益", r"^\(一\)|（一）.*归属.*母公司"]),
    ("comprehensive_income", "minority_comprehensive_income",
     [r"归属于少数股东的综合收益总额", r"归属.*少数股东.*综合收益", r"^\(二\)|（二）.*归属.*少数股东"]),
    # eps (income_statement.py:72-75)
    ("eps", "basic_eps", [r"基本每股收益", r"^1\.基本每股收益", r"^\(一\)|（一）.*基本每股收益"]),
    ("eps", "diluted_eps", [r"稀释每股收益", r"^2\.稀释每股收益", r"^\(二\)|（二）.*稀释每股收益"]),
]

CASH_FLOW_ITEMS = [
    # operating_activities (src/parsers/cash_flow.py:23-34)
    ("operating_activities", "sales_goods_cash", [r"^销售商品、提供劳务收到的\s*现金$"]),
    ("operating_activities", "tax_refund", [r"^收到的税费返还$"]),
    ("operating_activities", "other_operating_inflow", [r"^收到其他与经营活动有关的\s*现金$"]),
    ("operating_activities", "operating_inflow_subtotal", [r"^经营活动现金流入小计$"]),
    ("operating_activities", "purchase_goods_cash", [r"^购买商品、接受劳务支付的\s*现金$"]),
    ("operating_activities", "employee_cash",
     [r"^支付给职工及?以?及?为职工支付的\s*现金$", r"^支付给职工.*的\s*现金$"]),
    ("operating_activities", "tax_payment", [r"^支付的各项税费$"]),
    ("operating_activities", "other_operating_outflow", [r"^支付其他与经营活动有关的\s*现金$"]),
    ("operating_activities", "operating_outflow_subtotal", [r"^经营活动现金流出小计$"]),
    ("operating_activities", "operating_net_cash_flow",
     [r"^经营活动产生的现金流\s*量净\s*额$", r"^经营活动产生的现金流量净额$"]),
    # investing_activities (cash_flow.py:37-50)
    ("investing_activities", "investment_recovery", [r"^收回投资收到的\s*现金$"]),
    ("investing_activities", "investment_income", [r"^取得投资收益收到的\s*现金$"]),
    ("investing_activities", "disposal_assets_cash",
     [r"^处置固定资产、无形资产和其他长期资产收.*回的\s*现金净额$",
      r"^处置固定资产、无形资产和其他\s*长期资产收.*回的\s*现金净额$"]),
    ("investing_activities", "disposal_subsidiary_cash",
     [r"^处置子公司及其他营业单位收到的\s*现金净额$", r"^处置子公司及其他营业单位收到\s*的\s*现金净额$"]),
    ("investing_activities", "other_investing_inflow", [r"^收到其他与投资活动有关的\s*现金$"]),
    ("investing_activities", "investing_inflow_subtotal", [r"^投资活动现金流入小计$"]),
    ("investing_activities", "purchase_assets_cash",
     [r"^购建固定资产、无形资产和其他长期资产支.*付的\s*现金$",
      r"^购建固定资产、无形资产和其他\s*长期资产支.*付的\s*现金$"]),
    ("investing_activities", "investment_payment", [r"^投资支付的\s*现金$"]),
    ("investing_activities", "acquire_subsidiary_cash",
     [r"^取得子公司及其他营业单位支付的\s*现金净额$", r"^取得子公司及其他营业单位支付\s*的\s*现金净额$"]),
    ("investing_activities", "other_investing_outflow", [r"^支付其他与投资活动有关的\s*现金$"]),
    ("investing_activities", "investing_outflow_subtotal", [r"^投资活动现金流出小计$"]),
    ("investing_activities", "investing_net_cash_flow",
     [r"^投资活动产生的现金流\s*量净\s*额$", r"^投资活动产生的现金流量净额$"]),
    # financing_activities (cash_flow.py:53-65)
    ("financing_activities", "investment_received", [r"^吸收投资收到的\s*现金$"]),
    ("financing_activities", "minority_investment",
     [r"^其中：子公司吸收少数股东投资收到的\s*现金$", r"^其中：子公司吸收少数股东投资\s*收到的\s*现金$"]),
    ("financing_activities", "borrowing_received", [r"^取得借款收到的\s*现金$"]),
    ("financing_activities", "other_financing_inflow", [r"^收到其他与筹资活动有关的\s*现金$"]),
    ("financing_activities", "financing_inflow_subtotal", [r"^筹资活动现金流入小计$"]),
    ("financing_activities", "debt_repayment", [r"^偿还债务支付的\s*现金$"]),
    ("financing_activities", "dividend_interest_payment", [r"^分配股利、利润或偿付利息支付的\s*现金$"]),
    ("financing_activities", "minority_dividend", [r"^其中：子公司支付给少数股东的股利、利润$"]),
    ("financing_activities", "other_financing_outflow", [r"^支付其他与筹资活动有关的\s*现金$"]),
    ("financing_activities", "financing_outflow_subtotal", [r"^筹资活动现金流出小计$"]),
    ("financing_activities", "financing_net_cash_flow",
     [r"^筹资活动产生的现金流\s*量净\s*额$", r"^筹资活动产生的现金流量净额$"]),
    # other_items (cash_flow.py:68-73)
    ("other_items", "exchange_rate_effect", [r"^四、汇率变动对现金及现金等\s*价物的\s*影响$"]),
    ("other_items", "net_increase_cash", [r"^五、现金及现金等价物净增加\s*额$"]),
    ("other_items", "beginning_cash_balance", [r"^加：期初现金及现金等价物\s*余额$"]),
    ("other_items", "ending_cash_balance", [r"^六、期末现金及现金等价物余\s*额$"]),
]

ITEM_BANKS = {
    "balance_sheet": BALANCE_SHEET_ITEMS,
    "income_statement": INCOME_STATEMENT_ITEMS,
    "cash_flow": CASH_FLOW_ITEMS,
}

# Output span kind routing: which standard names are subtotals / totals.
SUBTOTAL_NAMES = {
    "balance_sheet": {
        "current_assets_total", "non_current_assets_total",
        "current_liabilities_total", "non_current_liabilities_total",
        "liabilities_total", "parent_equity_total", "equity_total",
    },
    "income_statement": {"operating_total_revenue", "operating_total_cost", "operating_profit"},
    "cash_flow": {
        "operating_inflow_subtotal", "operating_outflow_subtotal", "operating_net_cash_flow",
        "investing_inflow_subtotal", "investing_outflow_subtotal", "investing_net_cash_flow",
        "financing_inflow_subtotal", "financing_outflow_subtotal", "financing_net_cash_flow",
    },
}
TOTAL_NAMES = {
    "balance_sheet": {"assets_total", "liabilities_and_equity_total"},
    "income_statement": {"total_profit", "net_profit", "total_comprehensive_income"},
    "cash_flow": {"net_increase_cash", "ending_cash_balance"},
}

# Essential items for completeness score (balance_sheet.py:643-646,
# income_statement.py:427-430, cash_flow.py:437-440)
ESSENTIAL_ITEMS = {
    "balance_sheet": ["货币资金", "应收账款", "存货", "固定资产",
                      "短期借款", "应付账款", "实收资本", "未分配利润"],
    "income_statement": ["operating_revenue", "operating_cost", "net_profit",
                         "total_profit", "operating_profit"],
    "cash_flow": ["operating_net_cash_flow", "investing_net_cash_flow",
                  "financing_net_cash_flow", "net_increase_cash", "ending_cash_balance"],
}

# Deduction keywords for sign-aware subtotal validation (balance_sheet.py:738)
DEDUCTION_KEYWORDS = ["减：", "减:", "减-"]

# Notes title model spec (deterministic replacement for the LLM title
# classifier; reproduces the prompt contract of
# src/parsers/notes_extractor.py:253-263)
NOTE_L1_TITLE = r"^(\d+)、\s*(.+)$"
NOTE_L2_TITLE = r"^[（(](\d+)[)）][.、]?\s*(.*\S.*)$"

# Delimiters used to round-trip table rows through the span `text` field.
CELL_SEP = "\x1f"
ROW_SEP = "\x1e"


class CompiledBanks:
    """All pattern banks compiled once; one instance per worker process.

    ``extra_items`` / ``extra_column_keywords`` extend the default banks
    (the user-extension surface: the reference's subclass-a-parser and
    KeywordLibrary mechanisms, src/parsers/base_statement_parser.py:14-27,
    llm_assistant.py:209-305). Extra item patterns are appended AFTER
    the defaults, so default classifications never change.
    """

    def __init__(self, extra_items: dict | None = None,
                 extra_column_keywords: dict | None = None) -> None:
        c = re.compile
        item_banks_src = {st: list(bank) for st, bank in ITEM_BANKS.items()}
        for st, entries in (extra_items or {}).items():
            item_banks_src.setdefault(st, []).extend(
                (sec, name, list(pats)) for sec, name, pats in entries)
        column_kw_src = {k: list(v) for k, v in COLUMN_KEYWORDS.items()}
        for col, kws in (extra_column_keywords or {}).items():
            column_kw_src.setdefault(col, []).extend(kws)
        self.bs_start = [c(p) for p in BALANCE_SHEET_START_PATTERNS]
        self.bs_end = [c(p) for p in BALANCE_SHEET_END_PATTERNS]
        self.next_table = [c(p) for p in NEXT_TABLE_PATTERNS]
        self.column_keywords = {
            k: [c(p) for p in v] for k, v in column_kw_src.items()
        }
        self.note_format = [c(p) for p in NOTE_FORMAT_PATTERNS]
        self.pure_digits = c(r"^\d+$")
        self.numeric_format = c(NUMERIC_FORMAT_PATTERN)
        self.key_structures = {
            st: [(name, [c(p) for p in pats], req) for name, pats, req in lst]
            for st, lst in KEY_STRUCTURES.items()
        }
        self.end_patterns = {st: [c(p) for p in lst] for st, lst in END_PATTERNS.items()}
        self.item_banks = {
            st: [(sec, name, [c(p) for p in pats]) for sec, name, pats in bank]
            for st, bank in item_banks_src.items()
        }
        self.bs_totals = [(sec, name, c(p)) for sec, name, p in BALANCE_SHEET_TOTALS]
        self.note_l1 = c(NOTE_L1_TITLE)
        self.note_l2 = c(NOTE_L2_TITLE)
        self.ws_collapse = c(r"\s+")
        self.header_kw = c(r"项目")
        self.header_period_kw = c(r"期末|期初|本期|上期|年度|金额")
        self.clean_numeric_keep = c(r"[^\d.,\-]")
        self.numeric_strip = c(r"[^\d.\-]")


_ACTIVE_BANKS: CompiledBanks | None = None


@lru_cache(maxsize=1)
def _default_banks() -> CompiledBanks:
    return CompiledBanks()


def banks() -> CompiledBanks:
    return _ACTIVE_BANKS if _ACTIVE_BANKS is not None else _default_banks()


def activate(extra_items: dict | None = None,
             extra_column_keywords: dict | None = None) -> None:
    """Install a configured bank set for this worker process (shipped to
    actors via the stage constructor). One engine config per worker
    process — jobs with different configs use separate actor pools.
    Passing nothing restores the defaults."""
    global _ACTIVE_BANKS
    if extra_items or extra_column_keywords:
        _ACTIVE_BANKS = CompiledBanks(extra_items, extra_column_keywords)
    else:
        _ACTIVE_BANKS = None
    # classification results depend on the banks -> drop the memo
    from . import docproc
    docproc._CLASSIFY_MEMO.clear()
