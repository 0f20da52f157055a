"""Engine configuration + user-extension surface.

Mirrors the reference's extension seams (SURVEY.md §2.10):
- custom statement parsers / pattern banks (subclass-a-parser,
  src/parsers/base_statement_parser.py:14-27, balance_sheet_v2_example):
  → ``extra_item_patterns`` appended to the banks;
- KeywordLibrary: JSON-loadable keyword sets merged with defaults
  (src/parsers/llm_assistant.py:209-305) → ``load_keyword_library``;
- LLM provider plugin + arbitration flags
  (src/parsers/llm_client.py:14-19, hybrid_column_analyzer.py:36-41,
  config/llm_config.template.json): → ``TitleModel`` interface with the
  deterministic rule model as the default provider; headless arbitration
  defaults to the recorded policy ``default_choice='rules'``.

Config is shipped to the actor pool via the stage constructor
(``ExtractDocuments(config=...)``) — per-worker activation, no globals
crossing jobs with different configs.
"""
from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Optional

from . import patterns


@dataclass
class EngineConfig:
    # {statement_type: [(section, standard_name, [regex, ...]), ...]}
    extra_item_patterns: dict[str, list[tuple[str, str, list[str]]]] = field(default_factory=dict)
    # {column_type: [regex, ...]} merged into the column keyword banks
    extra_column_keywords: dict[str, list[str]] = field(default_factory=dict)
    # title-model arbitration (hybrid_column_analyzer.py:36-41 analogue)
    enable_model: bool = False          # a real LLM provider, if ever slotted in
    fallback_to_rules: bool = True
    default_choice: str = "rules"       # headless default (llm_config.template.json:43)
    # replay of recorded human choices (user_choice_handler.py log):
    # {header_row_key: 'rules'|'model'|'skip'}, consulted on disagreement
    # BEFORE default_choice — see load_decision_log
    choice_replay: dict[tuple[str, ...], str] = field(default_factory=dict)

    def activate(self, title_model=None) -> None:
        patterns.activate(self.extra_item_patterns or None,
                          self.extra_column_keywords or None)
        from . import docproc
        docproc.set_title_model(title_model)


def load_keyword_library(path: str) -> EngineConfig:
    """Load a JSON keyword library and merge with defaults.

    Format::

        {"item_patterns": {"balance_sheet": [["assets.current_assets",
                                              "数字货币", ["数字货币"]], ...]},
         "column_keywords": {"current_period": ["本报告期末"]}}
    """
    with open(path) as f:
        raw = json.load(f)
    extra_items = {
        st: [(e[0], e[1], list(e[2])) for e in entries]
        for st, entries in raw.get("item_patterns", {}).items()
    }
    return EngineConfig(extra_item_patterns=extra_items,
                        extra_column_keywords=raw.get("column_keywords", {}))


class TitleModel:
    """Provider seam for notes-title classification (replaces the
    reference's LLM client, src/parsers/llm_client.py:23-604). The
    default implementation is the deterministic rule model; a real
    provider implements ``classify_lines`` with the same contract."""

    def classify_lines(self, lines: list[tuple[str, int]]) -> list[dict[str, Any]]:
        from . import docproc
        out = []
        for text, off in lines:
            hit = docproc.classify_title(text)
            if hit:
                level, number, title = hit
                out.append({"level": level, "number": number, "title": title,
                            "full_title": text.strip(), "offset": off})
        return out


class ColumnModel:
    """Provider seam for model-assisted header analysis (the reference's
    ``LLMClient.analyze_header``). A provider returns
    ``{'success': bool, 'column_map': {col_type: idx}, 'confidence': float}``."""

    def analyze_header(self, row: list[str]) -> dict[str, Any]:  # pragma: no cover - seam
        raise NotImplementedError


def compare_column_maps(rules: dict[str, int], model: dict[str, int]) -> dict[str, Any]:
    """Column-map comparison (ResultComparator analogue,
    src/parsers/result_comparator.py): strict per-key equality with a
    difference list."""
    keys = sorted(set(rules) | set(model))
    differences = [
        {"column_type": k, "rules": rules.get(k), "model": model.get(k)}
        for k in keys if rules.get(k) != model.get(k)
    ]
    return {"is_match": not differences, "differences": differences}


class HybridColumnAnalyzer:
    """Rules + optional model column analysis with the reference's
    arbitration policy (src/parsers/hybrid_column_analyzer.py:69-208):

    - model disabled → rules;
    - rules already confident (all three key columns found) and not
      ``always_use_model`` → skip the model (:183-208);
    - model failure → rules if ``fallback_to_rules`` else {};
    - agreement → rules (``auto_accept_if_match``);
    - disagreement → a recorded human decision for this header from
      ``config.choice_replay`` (``load_decision_log``) if present,
      else ``default_choice`` ('rules' | 'model' | 'skip') — the
      headless replacement for the interactive prompt
      (user_choice_handler.py; workers never prompt).

    Decisions are counted per instance (ST7 choice log / A8 choice
    statistics) — flushed into run metrics by the caller.
    """

    REQUIRED = ("item_name", "current_period", "previous_period")

    def __init__(self, config: Optional[EngineConfig] = None,
                 model: Optional[ColumnModel] = None,
                 always_use_model: bool = False,
                 auto_accept_if_match: bool = True) -> None:
        from .docproc import ColumnAnalyzer
        self.config = config or EngineConfig()
        self.model = model
        self.always_use_model = always_use_model
        self.auto_accept_if_match = auto_accept_if_match
        self.rules = ColumnAnalyzer()
        self.choices: dict[str, int] = {"rules": 0, "model": 0, "skip": 0, "auto": 0}
        # per-decision audit trail (user_choice_handler.py:133-178
        # analogue): each arbitration event records both results, the
        # comparator's differences and the recorded-policy outcome.
        # Workers are headless, so 'choice' is the policy decision, and
        # the sequence id replaces the interactive log's timestamp.
        # Bounded: long-lived actors must not grow an audit list
        # forever if the caller never drains — past the cap only the
        # drop counter advances.
        self.decisions: list[dict[str, Any]] = []
        self.decisions_dropped = 0

    MAX_DECISIONS = 10_000

    def _record(self, row: list[str], rule_result: dict[str, int],
                model_resp: Optional[dict[str, Any]],
                choice: str) -> None:
        if len(self.decisions) >= self.MAX_DECISIONS:
            self.decisions_dropped += 1
            return
        model_map = (model_resp or {}).get("column_map", {})
        self.decisions.append({
            "seq": len(self.decisions) + self.decisions_dropped,
            "header_row": list(row),
            "rule_result": dict(rule_result),
            "model_result": dict(model_map),
            "model_confidence": float((model_resp or {}).get("confidence", 0.0) or 0.0),
            "model_reasoning": str((model_resp or {}).get("reasoning", "")),
            "comparison": compare_column_maps(rule_result, model_map),
            "choice": choice,
        })

    def drain_decisions(self) -> list[dict[str, Any]]:
        """Return and clear the accumulated decision records (callers
        flush them into run metrics / a JSONL sink per worker)."""
        out = self.decisions
        self.decisions = []
        return out

    def reset_cache(self) -> None:
        self.rules.reset_cache()

    def analyze_row_structure(self, row: list[str], use_cache: bool = True) -> dict[str, int]:
        if not row:
            return {}
        if use_cache and self.rules.cache and self.rules._validate_cached(row, self.rules.cache):
            return self.rules.cache
        result = self._hybrid(row)
        if result:
            self.rules.cache = result
        return result

    def _hybrid(self, row: list[str]) -> dict[str, int]:
        rule_result = self.rules._analyze(row)
        if not (self.config.enable_model and self.model):
            return rule_result
        if not self.always_use_model and all(k in rule_result for k in self.REQUIRED):
            self.choices["auto"] += 1
            self._record(row, rule_result, None, "auto_rules_confident")
            return rule_result
        try:
            resp = self.model.analyze_header(row)
            if not resp.get("success"):
                raise RuntimeError(resp.get("error", "model failure"))
        except Exception as e:
            if self.config.fallback_to_rules:
                self.choices["rules"] += 1
                self._record(row, rule_result,
                             {"reasoning": f"model failure: {e}"}, "rules_fallback")
                return rule_result
            self._record(row, rule_result,
                         {"reasoning": f"model failure: {e}"}, "skip_no_fallback")
            return {}
        model_result = resp["column_map"]
        cmp = compare_column_maps(rule_result, model_result)
        if cmp["is_match"] and self.auto_accept_if_match:
            self.choices["auto"] += 1
            self._record(row, rule_result, resp, "auto_match")
            return rule_result
        # disagreement: a recorded human decision for this exact header
        # (load_decision_log replay map) outranks the headless policy —
        # the distributed stand-in for re-prompting the user
        choice = self.config.choice_replay.get(
            tuple(str(c) for c in row), self.config.default_choice)
        self.choices[choice if choice in self.choices else "rules"] += 1
        self._record(row, rule_result, resp, choice)
        if choice == "model":
            return dict(model_result)
        if choice == "skip":
            return {}
        return rule_result

    def choice_stats(self) -> dict[str, int]:
        """A8: decision counts by arbitration outcome."""
        return dict(self.choices)


def write_decision_log(records: list[dict[str, Any]], path: str) -> int:
    """Append decision records as JSONL (one line per arbitration
    event). The reference rewrites a whole JSON array per decision
    (user_choice_handler.py:152-175) — append-only JSONL is the
    distributed-safe equivalent: each worker appends to its own
    ``_decisions-<worker>.jsonl`` (underscore-prefixed so output-dir
    parquet readers skip it). Returns the number of lines written."""
    with open(path, "a", encoding="utf-8") as f:
        for r in records:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")
    return len(records)


def load_decision_log(path: str) -> dict[tuple[str, ...], str]:
    """Load a recorded arbitration log into a replay map
    {header_row: choice} for ``EngineConfig.choice_replay``.

    Accepts BOTH log formats:

    - the reference's interactive-session JSON array
      (src/parsers/user_choice_handler.py:152-175: records carry
      ``header_row`` + ``user_choice`` in {'rules','llm','skip'});
    - this engine's append-only JSONL (``write_decision_log``: records
      carry ``header_row`` + ``choice``).

    Later records win (the log is append-ordered, so the most recent
    human decision for a header supersedes earlier ones). The
    reference's 'llm' maps to this engine's 'model'. Entries whose
    choice is an auto outcome ('auto_match', 'auto_rules_confident',
    'rules_fallback', ...) are NOT human decisions and are skipped —
    only genuine arbitration verdicts replay.
    """
    with open(path, encoding="utf-8") as f:
        head = f.read(1)
        f.seek(0)
        if head == "[":
            records = json.load(f)
        else:
            records = [json.loads(line) for line in f if line.strip()]
    out: dict[tuple[str, ...], str] = {}
    for r in records:
        choice = r.get("user_choice", r.get("choice", ""))
        choice = {"llm": "model"}.get(choice, choice)
        if choice not in ("rules", "model", "skip"):
            continue
        header = r.get("header_row")
        if not isinstance(header, list):
            # a malformed record must not install a replay decision for
            # the empty header row (ADVICE r3)
            continue
        out[tuple(str(c) for c in header)] = choice
    return out


class HybridTitleModel(TitleModel):
    """Rules + optional model with the reference's arbitration policy
    (hybrid_column_analyzer.py:127-208): model disabled or failing →
    rules; agreement → auto-accept; disagreement → ``default_choice``
    (headless workers never prompt, user_choice_handler.py is replaced
    by the recorded policy)."""

    def __init__(self, config: Optional[EngineConfig] = None,
                 model: Optional[TitleModel] = None) -> None:
        self.config = config or EngineConfig()
        self.model = model

    def classify_lines(self, lines: list[tuple[str, int]]) -> list[dict[str, Any]]:
        rules = super().classify_lines(lines)
        if not (self.config.enable_model and self.model):
            return rules
        try:
            modeled = self.model.classify_lines(lines)
        except Exception:
            return rules if self.config.fallback_to_rules else []
        if modeled == rules:
            return rules
        if self.config.default_choice == "model":
            return modeled
        # 'rules' AND 'skip' both keep the rule result on disagreement:
        # skip means never auto-accept the model, and the rule output is
        # the conservative baseline (columns skip to {} because there a
        # wrong structure poisons the whole parse; titles degrade safely)
        return rules
