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

    def activate(self) -> None:
        patterns.activate(self.extra_item_patterns or None,
                          self.extra_column_keywords or None)


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
        return rules if self.config.default_choice == "rules" else modeled
