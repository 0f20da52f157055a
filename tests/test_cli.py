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


def test_cli_verify(tmp_path):
    corpus = str(tmp_path / "c")
    _run("synth", "--n-docs", "30", "--output", corpus, "--num-cpus", "4")
    r = _run("verify", "--input", corpus, "--sample", "30", "--num-cpus", "4")
    assert r[-1] == {"checked": 30, "mismatches": [], "ok": True}
