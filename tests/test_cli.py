"""CLI surface: synth → extract (+resume) → metrics, fresh subprocess
per invocation (the CLI owns its own Ray session)."""
import json
import subprocess
import sys


def _run(*args):
    out = subprocess.run([sys.executable, "-m", "pdf_context_extractor_agent_ray.cli", *args],
                         capture_output=True, text=True, timeout=240)
    assert out.returncode == 0, out.stderr[-2000:]
    return [json.loads(line) for line in out.stdout.strip().splitlines() if line.startswith("{")]


def test_cli_roundtrip(tmp_path):
    corpus = str(tmp_path / "corpus")
    outdir = str(tmp_path / "out")
    r = _run("synth", "--n-docs", "50", "--output", corpus, "--num-cpus", "4")
    assert r[-1]["n_docs"] == 50

    r = _run("extract", "--input", corpus, "--output", outdir, "--num-cpus", "4")
    assert r[-1]["num_docs"] == 50

    # resume: nothing left
    r = _run("extract", "--input", corpus, "--output", outdir, "--num-cpus", "4", "--resume")
    assert r[-1]["num_docs"] == 0 and r[-1]["skipped_docs"] == 50

    r = _run("metrics", "--output", outdir, "--num-cpus", "4")
    assert r[0]["n_docs"] == 50

    wb = str(tmp_path / "all.xlsx")
    r = _run("export-excel", "--output", outdir, "--dest", wb,
             "--mode", "workbook", "--limit", "10", "--num-cpus", "4")
    assert r[-1]["written"] == 10
    import zipfile
    assert zipfile.is_zipfile(wb)


def test_cli_keyword_library_reaches_parquet_path(tmp_path):
    """A keyword-library entry must change --format=parquet output
    (run_resumable has to forward config to the extraction actors)."""
    import pyarrow.parquet as pq
    from pdf_context_extractor_agent_ray.schema import docs_to_table
    from pdf_context_extractor_agent_ray.synth import generate_doc

    doc = generate_doc("cli-lib-001", family="bs_simple")
    spans = list(doc["spans"])
    # splice an item unknown to the default banks into the statement table
    ti = next(i for i, s in enumerate(spans) if s[0] == "table_row" and "货币资金" in s[1])
    ref = spans[ti][2]
    cells = spans[ti][1].split("\x1f")
    row = "\x1f".join(["数字货币"] + cells[1:])
    spans.insert(ti, ("table_row", row, ref, 0))
    spans = [(k, t, r, i) for i, (k, t, r, _) in enumerate(spans)]

    corpus = str(tmp_path / "corpus.parquet")
    pq.write_table(docs_to_table([{"doc_id": doc["doc_id"], "spans": spans}]), corpus)
    lib = tmp_path / "lib.json"
    lib.write_text(json.dumps({"item_patterns": {"balance_sheet": [
        ["assets.current_assets", "数字货币", ["数字货币"]]]}}))

    def item_texts(outdir):
        texts = []
        import os
        for part in os.listdir(outdir):
            pdir = f"{outdir}/{part}"
            if not part.startswith("part-"):
                continue
            for f in os.listdir(pdir):
                if f.endswith(".parquet"):
                    t = pq.read_table(f"{pdir}/{f}")
                    for doc_spans in t.column("spans").to_pylist():
                        texts += [s["text"] for s in doc_spans if s["kind"] == "item"]
        return texts

    out_plain = str(tmp_path / "out_plain")
    _run("extract", "--input", corpus, "--output", out_plain, "--num-cpus", "4")
    assert not any("数字货币" in t for t in item_texts(out_plain))

    out_lib = str(tmp_path / "out_lib")
    _run("extract", "--input", corpus, "--output", out_lib, "--num-cpus", "4",
         "--keyword-library", str(lib))
    assert any("数字货币" in t for t in item_texts(out_lib))


def test_cli_verify(tmp_path):
    corpus = str(tmp_path / "c")
    _run("synth", "--n-docs", "30", "--output", corpus, "--num-cpus", "4")
    r = _run("verify", "--input", corpus, "--sample", "30", "--num-cpus", "4")
    assert r[-1] == {"checked": 30, "mismatches": [], "ok": True}


def test_cli_query_registry(tmp_path):
    """`query list` prints the full registry; a relational query runs
    and writes parquet; an unknown name fails with a clean error."""
    import pyarrow.parquet as pq

    out = subprocess.run(
        [sys.executable, "-m", "pdf_context_extractor_agent_ray.cli",
         "query", "list"], capture_output=True, text=True, timeout=60)
    assert out.returncode == 0
    names = out.stdout.split()
    assert "sales_cube" in names and len(names) >= 70

    dest = str(tmp_path / "q")
    r = _run("query", "value_moments", "--sf-dir", "/root/testdata/sf0.001",
             "--dest", dest, "--num-cpus", "4")
    assert r[-1] == {"query": "value_moments", "dest": dest}
    t = pq.read_table(dest)
    assert t.num_rows > 0 and "sum_sq_cents2" in t.schema.names

    bad = subprocess.run(
        [sys.executable, "-m", "pdf_context_extractor_agent_ray.cli",
         "query", "no_such_query", "--show"],
        capture_output=True, text=True, timeout=60)
    assert bad.returncode != 0 and "unknown query" in bad.stderr


def test_cli_clean_writes_survivors(tmp_path):
    """`clean` writes the quality-gate survivors as parquet and the
    printed funnel report's terminal count equals the written rows."""
    import pyarrow.dataset as pads

    dest = str(tmp_path / "cleaned")
    r = _run("clean", "--sf-dir", "/root/testdata/sf0.001",
             "--output", dest, "--num-cpus", "4")
    rep = r[-1]
    assert rep["output"] == dest
    funnel = rep["funnel"]
    assert list(funnel) == ["raw", "exact_dedup", "near_dup_keep_best",
                            "decontaminate", "quality_gate"]
    vals = list(funnel.values())
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    written = sum(f.count_rows()
                  for f in pads.dataset(dest).get_fragments())
    assert written == funnel["quality_gate"] > 0


def test_cli_clean_incremental_loop(tmp_path):
    """`clean --write-manifest` then `clean --manifest` is the CDC
    production loop: run 2 over the same corpus reports the identical
    funnel, writes the identical survivor set, and does ZERO text
    feature/verify work (everything rides the manifest + pair memo)."""
    import numpy as np
    import pyarrow.dataset as pads

    out1 = str(tmp_path / "run1")
    man1 = str(tmp_path / "man1")
    r1 = _run("clean", "--sf-dir", "/root/testdata/sf0.001",
              "--output", out1, "--write-manifest", man1,
              "--num-cpus", "4")[-1]
    assert r1["manifest_features"] > 0

    out2 = str(tmp_path / "run2")
    man2 = str(tmp_path / "man2")
    r2 = _run("clean", "--sf-dir", "/root/testdata/sf0.001",
              "--output", out2, "--manifest", man1,
              "--write-manifest", man2, "--num-cpus", "4")[-1]
    assert r2["funnel"] == r1["funnel"]
    st = r2["incremental"]
    assert st["mode"] == "incremental"
    assert st["n_delta"] == 0 and st["n_text_featured"] == 0
    assert st["n_text_verify_fetched"] == 0

    def ids(path):
        return np.sort(pads.dataset(path)
                       .to_table(columns=["doc_id"])["doc_id"].to_numpy())

    assert np.array_equal(ids(out1), ids(out2))
