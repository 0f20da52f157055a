"""Extension-surface example (the reference's enhanced-parser /
v2-parser demos, examples/enhanced_parser_example.py and
src/parsers/balance_sheet_v2_example.py, expressed over this engine):

- extend the item pattern banks (a new account name) and the
  column-keyword library (a new header style) via EngineConfig;
- ship the config to the actor pool;
- run the extraction pipeline with the extended banks.

Run: python examples/extended_pipeline.py
"""
import json
import os
import sys

# make the repo importable when run as `python examples/extended_pipeline.py`
# (and for Ray workers, which inherit this process's PYTHONPATH below)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False

from pdf_context_extractor_agent_ray.config import EngineConfig  # noqa: E402
from pdf_context_extractor_agent_ray.pipelines.extraction import extraction_pipeline  # noqa: E402
from pdf_context_extractor_agent_ray.pipelines.metrics import run_metrics  # noqa: E402
from pdf_context_extractor_agent_ray.sources.synth_source import synth_documents  # noqa: E402

config = EngineConfig(
    # a new standardized account: rows matching 数字货币 classify into
    # current assets under the standard name 数字货币
    extra_item_patterns={
        "balance_sheet": [("assets.current_assets", "数字货币", [r"数字货币"])],
    },
    # an extra header keyword: 本报告期末 binds the current-period column
    extra_column_keywords={"current_period": [r"本报告期末"]},
)

out = extraction_pipeline(synth_documents(2000), config=config)
print(json.dumps(run_metrics(out), ensure_ascii=False))
ray.shutdown()
