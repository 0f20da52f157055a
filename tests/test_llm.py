"""HTTP model-provider seam: retry/timeout semantics, markdown-fence
stripping, truncated-JSON repair, provider wire formats — all against
canned transports (no network). Mirrors the reference client's
contract (src/parsers/llm_client.py:404-548)."""
import json

import pytest

from pdf_context_extractor_agent_ray.config import EngineConfig, HybridColumnAnalyzer, TitleModel
from pdf_context_extractor_agent_ray.llm import (
    HttpColumnModel,
    HttpModelClient,
    HttpStatusError,
    HttpTitleModel,
    RequestTimeout,
    parse_column_response,
    repair_truncated_array,
    repair_truncated_object,
    strip_markdown_fence,
)

CFG = {"provider": "anthropic", "base_url": "http://llm.test", "model": "m",
       "api_key": "k", "timeout": 5, "max_retries": 3}


def _messages_body(text: str) -> str:
    return json.dumps({"content": [{"text": text}]})


def _chat_body(text: str) -> str:
    return json.dumps({"choices": [{"message": {"content": text}}]})


class Canned:
    """Transport returning scripted outcomes in order; records calls."""

    def __init__(self, outcomes):
        self.outcomes = list(outcomes)
        self.calls = []

    def __call__(self, url, headers, payload, timeout):
        self.calls.append((url, headers, payload, timeout))
        out = self.outcomes.pop(0)
        if isinstance(out, Exception):
            raise out
        return out


def test_repair_helpers():
    assert strip_markdown_fence("```json\n{\"a\": 1}\n```") == '{"a": 1}'
    assert strip_markdown_fence("```\n{}\n```") == "{}"
    # dangling reasoning string gets closed
    fixed = repair_truncated_object('{"column_map": {}, "confidence": 0.9,\n  "reasoning": "cut of')
    assert json.loads(fixed)["confidence"] == 0.9
    # confidence-only truncation gets a stand-in reasoning
    fixed = repair_truncated_object('{"column_map": {"item_name": 0}, "confidence": 0.8')
    assert json.loads(fixed)["reasoning"] == "Response truncated"
    # bare object truncation just closes
    assert json.loads(repair_truncated_object('{"foo": 1')) == {"foo": 1}
    # array trimmed to last complete element
    assert json.loads(repair_truncated_array('[{"a": 1}, {"b": 2}, {"c"')) == [{"a": 1}, {"b": 2}]
    assert json.loads(repair_truncated_array("[")) == []


def test_parse_column_response_coerces_and_fails_closed():
    ok = parse_column_response('{"column_map": {"item_name": "0", "note": null}, "confidence": 0.7}')
    assert ok["success"] and ok["column_map"] == {"item_name": 0}
    bad = parse_column_response("not json {{{")
    assert not bad["success"] and bad["column_map"] == {}


def test_analyze_header_happy_path_messages_style():
    tr = Canned([(200, _messages_body(
        '{"column_map": {"item_name": 0, "current_period": 1, "previous_period": 2},'
        ' "confidence": 0.95, "reasoning": "r"}'))])
    m = HttpColumnModel(CFG, transport=tr)
    r = m.analyze_header(["项目", "本期末", "上期末"])
    assert r["success"] and r["column_map"]["current_period"] == 1
    url, headers, payload, timeout = tr.calls[0]
    assert url.endswith("/v1/messages") and headers["x-api-key"] == "k"
    assert payload["system"] and timeout == 5


def test_fenced_and_truncated_response_repaired():
    tr = Canned([(200, _messages_body(
        '```json\n{"column_map": {"item_name": 0}, "confidence": 0.6,\n "reasoning": "trunca'))])
    r = HttpColumnModel(CFG, transport=tr).analyze_header(["项目"])
    assert r["success"] and r["column_map"] == {"item_name": 0}


def test_timeout_retries_then_succeeds():
    tr = Canned([RequestTimeout("t"), RequestTimeout("t"),
                 (200, _messages_body('{"column_map": {}, "confidence": 0.1}'))])
    r = HttpColumnModel(CFG, transport=tr).analyze_header(["项目"])
    assert r["success"] and len(tr.calls) == 3


def test_timeout_exhausts_retries():
    # max_retries=3 == one attempt + three RETRIES = four calls
    tr = Canned([RequestTimeout("t")] * 4)
    r = HttpColumnModel(CFG, transport=tr).analyze_header(["项目"])
    assert not r["success"] and "timeout" in r["error"] and len(tr.calls) == 4


def test_zero_retries_still_attempts_once():
    tr = Canned([(200, _messages_body('{"column_map": {}, "confidence": 0.1}'))])
    r = HttpColumnModel({**CFG, "max_retries": 0},
                        transport=tr).analyze_header(["项目"])
    assert r["success"] and len(tr.calls) == 1


def test_http_error_fails_without_retry():
    tr = Canned([HttpStatusError(401)])
    r = HttpColumnModel(CFG, transport=tr).analyze_header(["项目"])
    assert not r["success"] and "401" in r["error"] and len(tr.calls) == 1


def test_missing_api_key_short_circuits():
    tr = Canned([])
    r = HttpColumnModel({**CFG, "api_key": None}, transport=tr).analyze_header(["项目"])
    assert not r["success"] and not tr.calls


def test_chat_and_generate_wire_formats():
    tr = Canned([(200, _chat_body('{"column_map": {"item_name": 0}, "confidence": 1.0}'))])
    r = HttpColumnModel({**CFG, "provider": "openrouter"}, transport=tr).analyze_header(["项目"])
    assert r["success"]
    url, headers, payload, _ = tr.calls[0]
    assert url.endswith("/v1/chat/completions")
    assert headers["authorization"] == "Bearer k"
    assert payload["messages"][0]["role"] == "system"

    tr = Canned([(200, json.dumps({"response": '{"column_map": {}, "confidence": 0}'}))])
    r = HttpColumnModel({**CFG, "provider": "ollama", "api_key": None},
                        transport=tr).analyze_header(["项目"])
    assert r["success"]
    url, _, payload, _ = tr.calls[0]
    assert url.endswith("/api/generate") and payload["stream"] is False


def test_http_column_model_plugs_into_hybrid_arbitration():
    """End of the seam: a disagreeing HTTP provider goes through the
    recorded arbitration policy exactly like any other ColumnModel."""
    rules_map = HybridColumnAnalyzer().analyze_row_structure(["项目", "本期末"], use_cache=False)
    tr = Canned([(200, _messages_body('{"column_map": {"item_name": 1}, "confidence": 0.4}'))])
    h = HybridColumnAnalyzer(EngineConfig(enable_model=True),
                             HttpColumnModel(CFG, transport=tr))
    assert h.analyze_row_structure(["项目", "本期末"], use_cache=False) == rules_map
    assert h.choice_stats()["rules"] == 1

    tr = Canned([(200, _messages_body('{"column_map": {"item_name": 1}, "confidence": 0.4}'))])
    h = HybridColumnAnalyzer(EngineConfig(enable_model=True, default_choice="model"),
                             HttpColumnModel(CFG, transport=tr))
    assert h.analyze_row_structure(["项目", "本期末"], use_cache=False) == {"item_name": 1}


def test_http_title_model_and_fallback():
    lines = [("1、 货币资金", 0), ("正文", 1)]
    rules = TitleModel().classify_lines(lines)

    body = json.dumps([{"level": 1, "number": "9", "title": "X",
                        "full_title": "9、 X", "offset": 0}])
    tr = Canned([(200, _messages_body(body))])
    got = HttpTitleModel(CFG, transport=tr).classify_lines(lines)
    assert got[0]["title"] == "X"

    # provider failure degrades to the rule model
    tr = Canned([HttpStatusError(500)])
    assert HttpTitleModel(CFG, transport=tr).classify_lines(lines) == rules

    # unparseable content degrades to the rule model
    tr = Canned([(200, _messages_body("no json at all"))])
    assert HttpTitleModel(CFG, transport=tr).classify_lines(lines) == rules
