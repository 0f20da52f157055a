"""User-extension surface: extra pattern banks, keyword library,
title-model arbitration (SURVEY.md §2.10)."""
import json

import pytest

from pdf_context_extractor_agent_ray import patterns
from pdf_context_extractor_agent_ray.config import (
    EngineConfig,
    HybridTitleModel,
    TitleModel,
    load_keyword_library,
)
from pdf_context_extractor_agent_ray.docproc import classify_item, parse_statement


@pytest.fixture(autouse=True)
def restore_banks():
    yield
    patterns.activate()  # back to defaults


def test_extra_item_patterns_extend_bank():
    assert classify_item("balance_sheet", "数字货币") is None
    EngineConfig(extra_item_patterns={
        "balance_sheet": [("assets.current_assets", "数字货币", [r"数字货币"])],
    }).activate()
    assert classify_item("balance_sheet", "数字货币") == ("assets.current_assets", "数字货币")
    # defaults unchanged (extras append AFTER)
    assert classify_item("balance_sheet", "货币资金") == ("assets.current_assets", "货币资金")
    patterns.activate()
    assert classify_item("balance_sheet", "数字货币") is None


def test_keyword_library_roundtrip(tmp_path):
    lib = {"item_patterns": {"balance_sheet": [
        ["assets.current_assets", "数字货币", ["数字货币"]]]},
        "column_keywords": {"current_period": ["本报告期末"]}}
    p = tmp_path / "lib.json"
    p.write_text(json.dumps(lib))
    cfg = load_keyword_library(str(p))
    cfg.activate()
    assert classify_item("balance_sheet", "数字货币") is not None
    from pdf_context_extractor_agent_ray.docproc import ColumnAnalyzer
    from pdf_context_extractor_agent_ray.patterns import COL_CURRENT
    cmap = ColumnAnalyzer().analyze_row_structure(
        ["项目", "本报告期末", "上期末"], use_cache=False)
    assert cmap[COL_CURRENT] == 1


def test_hybrid_title_model_arbitration():
    lines = [("1、 货币资金", 0), ("正文", 1)]
    rules_result = TitleModel().classify_lines(lines)
    assert rules_result[0]["title"] == "货币资金"

    class Broken(TitleModel):
        def classify_lines(self, lines):
            raise RuntimeError("provider down")

    class Disagreeing(TitleModel):
        def classify_lines(self, lines):
            return [{"level": 1, "number": "9", "title": "X",
                     "full_title": "9、 X", "offset": 0}]

    # model disabled -> rules
    assert HybridTitleModel().classify_lines(lines) == rules_result
    # model fails -> fallback to rules
    h = HybridTitleModel(EngineConfig(enable_model=True), Broken())
    assert h.classify_lines(lines) == rules_result
    # disagreement -> default_choice='rules'
    h = HybridTitleModel(EngineConfig(enable_model=True), Disagreeing())
    assert h.classify_lines(lines) == rules_result
    # disagreement with default_choice='model' -> model wins
    h = HybridTitleModel(EngineConfig(enable_model=True, default_choice="model"),
                         Disagreeing())
    assert h.classify_lines(lines)[0]["title"] == "X"


def test_config_through_pipeline(ray_session):
    import ray.data as rd
    from pdf_context_extractor_agent_ray.pipelines.extraction import extraction_pipeline
    from pdf_context_extractor_agent_ray.schema import docs_to_table
    from pdf_context_extractor_agent_ray.synth import generate_corpus

    corpus = generate_corpus(12, prefix="cfg")
    cfg = EngineConfig(extra_item_patterns={
        "balance_sheet": [("assets.current_assets", "数字货币", [r"数字货币"])]})
    out = extraction_pipeline(rd.from_arrow(docs_to_table(corpus)),
                              concurrency=2, config=cfg)
    assert out.count() == 12  # config ships to actors without breaking the run


def test_hybrid_column_analyzer_arbitration():
    from pdf_context_extractor_agent_ray.config import (
        ColumnModel, HybridColumnAnalyzer, compare_column_maps)
    from pdf_context_extractor_agent_ray.patterns import COL_CURRENT, COL_ITEM_NAME

    header = ["项目", "本期末", "上期末", "附注"]
    rules_map = HybridColumnAnalyzer().analyze_row_structure(header, use_cache=False)
    assert rules_map[COL_ITEM_NAME] == 0 and rules_map[COL_CURRENT] == 1

    class Agreeing(ColumnModel):
        def analyze_header(self, row):
            return {"success": True, "column_map": dict(rules_map), "confidence": 0.9}

    class Disagreeing(ColumnModel):
        def analyze_header(self, row):
            return {"success": True, "column_map": {COL_ITEM_NAME: 1}, "confidence": 0.4}

    class Broken(ColumnModel):
        def analyze_header(self, row):
            raise RuntimeError("down")

    # confident rules skip the model entirely (hybrid_column_analyzer.py:183-208)
    h = HybridColumnAnalyzer(EngineConfig(enable_model=True), Disagreeing())
    assert h.analyze_row_structure(header, use_cache=False) == rules_map
    assert h.choice_stats()["auto"] == 1

    # ambiguous header (no previous col) -> model consulted; disagreement -> rules
    short = ["项目", "本期末"]
    h = HybridColumnAnalyzer(EngineConfig(enable_model=True), Disagreeing())
    r = h.analyze_row_structure(short, use_cache=False)
    assert r == HybridColumnAnalyzer().analyze_row_structure(short, use_cache=False)
    assert h.choice_stats()["rules"] == 1

    # default_choice='model' wins disagreements
    h = HybridColumnAnalyzer(EngineConfig(enable_model=True, default_choice="model"),
                             Disagreeing())
    assert h.analyze_row_structure(short, use_cache=False) == {COL_ITEM_NAME: 1}

    # model failure -> fallback to rules
    h = HybridColumnAnalyzer(EngineConfig(enable_model=True), Broken())
    assert h.analyze_row_structure(short, use_cache=False)

    # comparator
    c = compare_column_maps({"a": 1}, {"a": 2})
    assert not c["is_match"] and c["differences"][0]["column_type"] == "a"
    assert compare_column_maps({"a": 1}, {"a": 1})["is_match"]


def test_decision_log_records_and_jsonl_roundtrip(tmp_path):
    """Every arbitration event leaves an auditable record: both
    results, the comparator differences, and the policy outcome;
    records flush to append-only JSONL."""
    from pdf_context_extractor_agent_ray.config import (
        ColumnModel, HybridColumnAnalyzer, write_decision_log)
    from pdf_context_extractor_agent_ray.patterns import COL_ITEM_NAME

    class Disagreeing(ColumnModel):
        def analyze_header(self, row):
            return {"success": True, "column_map": {COL_ITEM_NAME: 1},
                    "confidence": 0.4, "reasoning": "why"}

    short = ["项目", "本期末"]
    h = HybridColumnAnalyzer(EngineConfig(enable_model=True), Disagreeing())
    h.analyze_row_structure(short, use_cache=False)
    recs = h.drain_decisions()
    assert len(recs) == 1
    r = recs[0]
    assert r["choice"] == "rules" and r["model_confidence"] == 0.4
    assert not r["comparison"]["is_match"] and r["comparison"]["differences"]
    assert r["header_row"] == short and r["model_reasoning"] == "why"
    assert h.drain_decisions() == []  # drained

    # confident-rules skip and model failure are also recorded
    h2 = HybridColumnAnalyzer(EngineConfig(enable_model=True), Disagreeing())
    h2.analyze_row_structure(["项目", "本期末", "上期末", "附注"], use_cache=False)
    assert h2.drain_decisions()[0]["choice"] == "auto_rules_confident"

    class Broken(ColumnModel):
        def analyze_header(self, row):
            raise RuntimeError("down")

    h3 = HybridColumnAnalyzer(EngineConfig(enable_model=True), Broken())
    h3.analyze_row_structure(short, use_cache=False)
    assert h3.drain_decisions()[0]["choice"] == "rules_fallback"

    path = str(tmp_path / "_decisions-w0.jsonl")
    assert write_decision_log(recs, path) == 1
    assert write_decision_log(recs, path) == 1  # append-only
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2 and lines[0]["choice"] == "rules"


def test_choice_replay_from_recorded_log(tmp_path):
    """A recorded human decision replays on disagreement: the replay
    map outranks default_choice for the exact header it was recorded
    on, misses fall back to the policy. Both the reference's
    JSON-array log and this engine's JSONL load."""
    from pdf_context_extractor_agent_ray.config import (
        ColumnModel, HybridColumnAnalyzer, load_decision_log,
        write_decision_log)
    from pdf_context_extractor_agent_ray.patterns import COL_ITEM_NAME

    class Disagreeing(ColumnModel):
        def analyze_header(self, row):
            return {"success": True, "column_map": {COL_ITEM_NAME: 1},
                    "confidence": 0.4}

    short = ["项目", "本期末"]
    other = ["项目", "期末数"]

    # reference-format array: user picked 'llm' (→ 'model') for `short`;
    # an earlier contradictory record is superseded; auto outcomes skip
    ref_log = tmp_path / "user_choices.json"
    ref_log.write_text(json.dumps([
        {"header_row": short, "user_choice": "rules"},
        {"header_row": short, "user_choice": "llm"},
        {"header_row": other, "user_choice": "auto_match"},
    ], ensure_ascii=False))
    replay = load_decision_log(str(ref_log))
    assert replay == {tuple(short): "model"}

    cfg = EngineConfig(enable_model=True, choice_replay=replay)
    h = HybridColumnAnalyzer(cfg, Disagreeing())
    assert h.analyze_row_structure(short, use_cache=False) == {COL_ITEM_NAME: 1}
    assert h.choice_stats()["model"] == 1
    assert h.drain_decisions()[0]["choice"] == "model"
    # replay miss → default_choice ('rules')
    h.reset_cache()
    r = h.analyze_row_structure(other, use_cache=False)
    assert r == HybridColumnAnalyzer().analyze_row_structure(other, use_cache=False)
    assert h.choice_stats()["rules"] == 1

    # this engine's JSONL round-trips into the same replay map
    h2 = HybridColumnAnalyzer(EngineConfig(enable_model=True, default_choice="skip"),
                              Disagreeing())
    assert h2.analyze_row_structure(short, use_cache=False) == {}
    jl = str(tmp_path / "_decisions-w0.jsonl")
    write_decision_log(h2.drain_decisions(), jl)
    assert load_decision_log(jl) == {tuple(short): "skip"}


def test_title_model_seam_plumbs_into_extraction():
    """A custom TitleModel installed via the ST3 seam changes note
    extraction; restoring the default restores rule behavior."""
    from pdf_context_extractor_agent_ray import docproc
    from pdf_context_extractor_agent_ray.config import TitleModel
    from pdf_context_extractor_agent_ray.synth import generate_doc
    from pdf_context_extractor_agent_ray.oracle.extractor import extract_doc_dict

    doc = generate_doc("seam-001", family="notes_only")
    base = extract_doc_dict(doc)
    n_titles = sum(1 for s in base["spans"] if s[0] == "note_title")
    assert n_titles > 0

    class NoTitles(TitleModel):
        def classify_lines(self, lines):
            return []

    docproc.set_title_model(NoTitles())
    try:
        muted = extract_doc_dict(doc)
        assert sum(1 for s in muted["spans"] if s[0] == "note_title") == 0
    finally:
        docproc.set_title_model(None)
    assert extract_doc_dict(doc)["spans"] == base["spans"]
