"""Document assembly rule — shared by the plain-Python oracle and the
Spark fused parse+assemble UDF, so span-sequence equality between the two
holds by construction.

Mirrors the reference combiner (`/root/reference/app/dotsocr_service.py:430-515`):
pages sorted by ``page_no``; each successful page's markdown written
followed by a trailing ``"\n\n"``; failed pages contribute nothing; the
document fails when failed/total > 0.1
(`/root/reference/app/utils/configs.py:78-79`).
"""

from __future__ import annotations

TASK_FAIL_THRESHOLD = 0.1


def assemble_page_results(doc_id: str, page_results: list[dict]) -> dict:
    """Fold per-page parse results (already in ``page_no`` order) into the
    document output row: ordered spans with global offsets, concatenated
    markdown, counters, status."""
    n_pages = len(page_results)
    n_failed = sum(1 for r in page_results if r["status"] == "failed")
    n_fallback = sum(1 for r in page_results if r["status"] == "fallback")

    spans: list[dict] = []
    offset = 0
    md_parts: list[str] = []
    md_nohf_parts: list[str] = []
    for r in page_results:
        if r["status"] == "failed":
            continue
        for s in r["spans"]:
            spans.append(
                {
                    "kind": s["kind"],
                    "text": s["text"],
                    "media_ref": s["media_ref"],
                    "offset": offset,
                }
            )
            offset += 1
        md_parts.append(r["md"])
        md_nohf_parts.append(r["md_nohf"])

    status = "failed" if n_pages and (n_failed / n_pages) > TASK_FAIL_THRESHOLD else "ok"
    return {
        "doc_id": doc_id,
        "spans": spans,
        "markdown": "".join(p + "\n\n" for p in md_parts),
        "markdown_nohf": "".join(p + "\n\n" for p in md_nohf_parts),
        "n_pages": n_pages,
        "n_failed": n_failed,
        "n_fallback": n_fallback,
        "n_spans": len(spans),
        "status": status,
    }
