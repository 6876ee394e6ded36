"""Plain-Python end-to-end reference pipeline (the golden-test oracle).

Runs one document — page payloads in, ordered spans + markdown out — with
no Spark involved. Composes the shared spec modules exactly as the Spark
job does, so span-sequence equality between this oracle and the Spark
output is the correctness gate (SURVEY.md §5.2).

Document assembly mirrors the reference's combiner
(`/root/reference/app/dotsocr_service.py:430-515`):
  - pages sorted by ``page_no``;
  - each successful page's markdown written followed by ``"\\n\\n"``
    (trailing separator included);
  - failed pages contribute nothing;
  - the document fails when failed/total > 0.1
    (`/root/reference/app/utils/configs.py:78-79` TASK_FAIL_THRESHOLD).
"""

from __future__ import annotations

import json

from .spec.page import process_page

TASK_FAIL_THRESHOLD = 0.1


def extract_document(doc: dict, mode: str = "pipeline") -> dict:
    """Extract one document dict (the fixtures.py shape) into the output
    row shape: (doc_id, spans, markdown, markdown_nohf, counters, status).
    """
    doc_id = doc["doc_id"]
    pages = sorted(doc["pages"], key=lambda p: p["page_no"])

    page_results = []
    for page in pages:
        toc_json = page.get("toc_json")
        toc = None if toc_json is None else json.loads(toc_json)
        page_results.append(
            process_page(
                page["payload"],
                page["width"],
                page["height"],
                doc_id=doc_id,
                page_no=page["page_no"],
                scale_factor=page.get("scale_factor", 1.0),
                toc=toc,
                mode=mode,
            )
        )

    n_pages = len(page_results)
    n_failed = sum(1 for r in page_results if r["status"] == "failed")
    n_fallback = sum(1 for r in page_results if r["status"] == "fallback")

    spans = []
    offset = 0
    md_parts = []
    md_nohf_parts = []
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
    markdown = "".join(p + "\n\n" for p in md_parts)
    markdown_nohf = "".join(p + "\n\n" for p in md_nohf_parts)

    return {
        "doc_id": doc_id,
        "spans": spans,
        "markdown": markdown,
        "markdown_nohf": markdown_nohf,
        "n_pages": n_pages,
        "n_failed": n_failed,
        "n_fallback": n_fallback,
        "n_spans": len(spans),
        "status": status,
    }
