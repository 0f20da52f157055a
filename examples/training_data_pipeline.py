"""End-to-end LLM training-data pipeline over the documents table —
the composed funnel every large-scale corpus build runs:

    read → quality filter → benchmark decontamination
         → near-dup dedup (keep cluster representatives)
         → fixed-token chunking → greedy sequence packing

Each stage is one of this engine's tested operators; everything
streams as Ray Datasets (the only driver-side materializations are
the broadcast keep/drop ID sets, size-gated inside the operators).

Run: python examples/training_data_pipeline.py [sf_dir]
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

import pyarrow as pa  # noqa: E402
import pyarrow.compute as pc  # noqa: E402
import ray.data as rd  # noqa: E402

from pdf_context_extractor_agent_ray.functions.dedup import near_dup_survivors  # noqa: E402
from pdf_context_extractor_agent_ray.functions.text import (  # noqa: E402
    decontaminate,
    pack_sequences,
    quality_batch,
    token_chunks_batch,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
funnel: dict[str, int] = {}

docs = rd.read_parquet(f"{SF}/documents.parquet")
funnel["input_docs"] = docs.count()

# 1. quality filter: keep docs passing the length/punctuation gates
#    (project to doc_id BEFORE collecting — only the ids broadcast)
kept_ids = docs.map_batches(quality_batch, batch_format="pyarrow") \
    .filter(expr="keep == True") \
    .map_batches(lambda b: pa.table({"doc_id": b["doc_id"]}),
                 batch_format="pyarrow")
keep_set = pa.array(sorted(r["doc_id"] for r in kept_ids.take_all()), pa.int64())
ref_keep = ray.put(keep_set)


def _filter_by(ref):
    def fn(batch: pa.Table) -> pa.Table:
        ids = ray.get(ref)
        return batch.filter(pc.is_in(batch["doc_id"], value_set=ids))
    return fn


docs = rd.read_parquet(f"{SF}/documents.parquet") \
    .map_batches(_filter_by(ref_keep), batch_format="pyarrow")
funnel["after_quality"] = docs.count()

# 2. benchmark decontamination (fingerprint collisions with the
#    broadcast benchmark set are dropped)
clean_ids = decontaminate(docs)
clean_set = pa.array(sorted(r["doc_id"] for r in clean_ids.take_all()), pa.int64())
ref_clean = ray.put(clean_set)
docs = rd.read_parquet(f"{SF}/documents.parquet") \
    .map_batches(_filter_by(ref_clean), batch_format="pyarrow")
funnel["after_decontaminate"] = docs.count()

# 3. near-dup dedup: keep each cluster's representative + singletons
surv = near_dup_survivors(docs)
surv_set = pa.array(sorted(r["doc_id"] for r in surv.take_all()), pa.int64())
ref_surv = ray.put(surv_set)
docs = rd.read_parquet(f"{SF}/documents.parquet") \
    .map_batches(_filter_by(ref_surv), batch_format="pyarrow")
funnel["after_near_dup"] = docs.count()

# 4. chunk + pack into fixed-token training sequences
chunks = docs.map_batches(token_chunks_batch, batch_format="pyarrow")
funnel["chunks"] = chunks.count()
seqs = pack_sequences(docs)
rows = seqs.take_all()
funnel["packed_sequences"] = len(rows)
funnel["packed_tokens"] = int(sum(r["n_tokens"] for r in rows))

print(json.dumps(funnel))
ray.shutdown()
