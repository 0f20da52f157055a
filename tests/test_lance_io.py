"""Lance-backend seam (north-rule storage format): pylance is not
installable in this sandbox, so the roundtrip is skip-gated exactly
like the pdfplumber adapter test — present and exercised wherever the
lib exists, skipped here. The format-negotiation logic itself (suffix
dispatch, parquet fallback) is tested unconditionally."""
import pytest

from pdf_context_extractor_agent_ray import io as dio
from pdf_context_extractor_agent_ray.schema import docs_to_table


def _corpus_docs():
    return [{"doc_id": f"doc-{i:04d}",
             "spans": [("text", f"hello {i}", "", 0),
                       ("page_break", "", "", 1)]}
            for i in range(20)]


@pytest.mark.skipif(not dio.HAVE_LANCE, reason="pylance not installed")
def test_lance_roundtrip(ray_session, tmp_path):  # pragma: no cover
    import ray.data as rd
    ds = rd.from_arrow(docs_to_table(_corpus_docs()))
    path = str(tmp_path / "docs.lance")
    dio.write_documents(ds, path)
    back = dio.read_documents(path)
    assert back.count() == 20
    ids = sorted(r["doc_id"] for r in back.select_columns(["doc_id"]).take_all())
    assert ids == [f"doc-{i:04d}" for i in range(20)]


def test_lance_suffix_falls_back_to_parquet_without_lib(ray_session, tmp_path):
    """Without pylance, a .lance path must still roundtrip through the
    parquet fallback (same Arrow schema) rather than erroring — the
    seam contract that lets the same pipeline config run in both
    environments."""
    if dio.HAVE_LANCE:
        pytest.skip("lance present: the real backend handles .lance")
    import ray.data as rd
    ds = rd.from_arrow(docs_to_table(_corpus_docs()))
    path = str(tmp_path / "docs.lance")
    dio.write_documents(ds, path)
    back = dio.read_documents(path)
    assert back.count() == 20
    row = back.take_all()[0]
    assert {"doc_id", "spans"} <= set(row.keys())
