"""Pre-flight corpus diagnostics — the checks an engineer runs BEFORE
launching a large corpus build on a new data drop:

    key_skew_report   is every planned shuffle key safe to hash-partition?
    heavy_hitters     which tokens dominate the stream (stopword set)?
    activity_streaks  how continuous is user activity (sessionization
                      sanity for the event log)?
    part_rank         which entities anchor the co-occurrence graph?

Each is a single registered operator; all outputs are small reports,
so the driver only ever holds bounded frames.

Run: python examples/corpus_diagnostics.py [sf_dir]
"""
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False

import ray.data as rd  # noqa: E402

from pdf_context_extractor_agent_ray.functions.graph import part_rank  # noqa: E402
from pdf_context_extractor_agent_ray.functions.relational import (  # noqa: E402
    key_skew_report,
)
from pdf_context_extractor_agent_ray.functions.streamops import (  # noqa: E402
    activity_streaks,
)
from pdf_context_extractor_agent_ray.functions.text import heavy_hitters  # noqa: E402
from pdf_context_extractor_agent_ray.functions.util import (  # noqa: E402
    strip_schema_metadata,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
report = {}

skew = key_skew_report(SF).to_pandas()
report["shuffle_keys"] = skew.to_dict("records")
# a key whose max fanout dwarfs its p99 wants salting before a groupby
report["salting_candidates"] = skew.loc[
    skew["max_per_key"] > 10 * skew["p99"], "domain"].tolist()

docs = strip_schema_metadata(rd.read_parquet(f"{SF}/documents.parquet"))
hh = heavy_hitters(docs).to_pandas()
report["heavy_tokens"] = hh.head(10).to_dict("records")

streaks = activity_streaks(SF).to_pandas()
report["streak_histogram"] = streaks.to_dict("records")

pr = part_rank(SF)
pr = pr if not hasattr(pr, "to_pandas") else pr.to_pandas()
report["top_graph_anchors"] = pr.head(5).to_dict("records")

print(json.dumps(report, default=int))
ray.shutdown()
