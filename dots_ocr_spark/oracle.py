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

from .spec.assemble import TASK_FAIL_THRESHOLD, assemble_page_results  # noqa: F401
from .spec.page import process_page


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
        words_json = page.get("words_json")
        words = None if words_json is None else json.loads(words_json)
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
                words=words,
            )
        )

    return assemble_page_results(doc_id, page_results)
