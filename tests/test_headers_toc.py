"""T6-T9 / J1 / O5 tests — header level extraction & rewrite, the fuzzy
TOC match (ratio-40 gate, inside-bbox zero distance), and the
level-reassignment rules of rebuild_directory_by_toc."""

import math

from dots_ocr_spark.spec import headers as H
from dots_ocr_spark.spec import toc as TOC


class TestLevelExtraction:
    def test_title_is_zero(self):
        assert H.extract_level("anything", "Title") == 0

    def test_hash_counts(self):
        assert H.extract_level("# x", "Section-header") == 1
        assert H.extract_level("### x", "Section-header") == 3
        assert H.extract_level("###### x", "Section-header") == 6

    def test_bold_is_seven(self):
        assert H.extract_level("**bold header**", "Section-header") == 7
        assert H.extract_level("pre **bold** post", "Section-header") == 7

    def test_hash_wins_over_bold(self):
        assert H.extract_level("## **x**", "Section-header") == 2

    def test_default_eight(self):
        assert H.extract_level("plain", "Section-header") == 8

    def test_list_item_plus_ten(self):
        assert H.extract_level("plain", "List-item") == 18
        assert H.extract_level("# x", "List-item") == 11

    def test_other_plus_twenty(self):
        assert H.extract_level("plain", "Caption") == 28


class TestCleanHeaderText:
    def test_strip_hashes(self):
        assert H.clean_header_text("### Title Here") == "Title Here"

    def test_strip_full_bold(self):
        assert H.clean_header_text("**Bold Title**") == "Bold Title"

    def test_hashes_then_bold(self):
        assert H.clean_header_text("## **Both**") == "Both"

    def test_partial_bold_kept(self):
        assert H.clean_header_text("pre **bold**") == "pre **bold**"


class TestRewrite:
    def _hdr(self, text, category="Section-header", new_level=None):
        h = H.make_header({"text": text, "category": category,
                           "bbox": [0, 0, 10, 10]}, 0)
        h["new_level"] = new_level
        return h

    def test_level_one_title(self):
        assert H.rewrite_header(self._hdr("X", new_level=1)) == ("# X", "title")

    def test_level_three_hashes(self):
        assert H.rewrite_header(self._hdr("X", new_level=3)) == ("### X", "Section-header")

    def test_level_seven_bold(self):
        assert H.rewrite_header(self._hdr("X", new_level=7)) == ("**X**", "Section-header")

    def test_level_eight_plain_list_item(self):
        assert H.rewrite_header(self._hdr("X", new_level=8)) == ("X", "List-item")

    def test_multiline_drops_empty(self):
        out, cat = H.rewrite_header(self._hdr("A\n\nB", new_level=2))
        assert out == "## A\n## B" and cat == "Section-header"

    def test_none_level_returns_none(self):
        assert H.rewrite_header(self._hdr("X", new_level=None)) is None


class TestIndelRatio:
    def test_exact(self):
        assert TOC.indel_ratio("abc", "abc") == 100.0

    def test_disjoint(self):
        assert TOC.indel_ratio("abc", "xyz") == 0.0

    def test_known_value(self):
        # LCS("abcd","abed") = 3 → 200*3/8 = 75
        assert math.isclose(TOC.indel_ratio("abcd", "abed"), 75.0)

    def test_empty(self):
        assert TOC.indel_ratio("", "") == 100.0
        assert TOC.indel_ratio("a", "") == 0.0


class TestPrefixNumberStrip:
    def test_strip(self):
        assert TOC.remove_prefix_number("1.2.3 Introduction") == "Introduction"
        assert TOC.remove_prefix_number("  42 Results.") == "Results"
        assert TOC.remove_prefix_number("No numbers") == "No numbers"


class TestDistance:
    def _header(self, text="Introduction", bbox=(100, 100, 500, 160)):
        return H.make_header(
            {"text": text, "category": "Section-header", "bbox": list(bbox)}, 0
        )

    def test_inside_is_zero(self):
        h = self._header()
        e = {"level": 1, "text": "Introduction", "to": [300.0, 130.0]}
        assert TOC.header_toc_distance(h, e) == 0.0

    def test_outside_euclidean(self):
        h = self._header()
        e = {"level": 1, "text": "Introduction", "to": [100.0, 60.0]}
        assert TOC.header_toc_distance(h, e) == 40.0
        e2 = {"level": 1, "text": "Introduction", "to": [70.0, 60.0]}
        assert math.isclose(TOC.header_toc_distance(h, e2), 50.0)

    def test_fuzz_gate(self):
        h = self._header("Introduction")
        e = {"level": 1, "text": "Completely Different Words", "to": [300.0, 130.0]}
        assert TOC.header_toc_distance(h, e) == float("inf")

    def test_prefix_number_stripped_before_match(self):
        h = self._header("3.1 Introduction")
        e = {"level": 2, "text": "Introduction", "to": [300.0, 130.0]}
        assert TOC.header_toc_distance(h, e) == 0.0


class TestRebuild:
    def _mk(self, text, category="Section-header", bbox=(100, 100, 500, 160)):
        return H.make_header({"text": text, "category": category,
                              "bbox": list(bbox)}, 0)

    def test_matched_header_gets_entry_level(self):
        h1 = self._mk("Introduction", bbox=(100, 100, 500, 160))
        h2 = self._mk("Methods", bbox=(100, 400, 500, 460))
        toc = [{"level": 2, "text": "Introduction", "to": [120.0, 120.0]}]
        TOC.rebuild_directory_by_toc([h1, h2], toc)
        assert h1["new_level"] == 2
        # unmatched: max_level=max(5,2)=5; level_set=[8]; 5+0+1=6
        assert h2["new_level"] == 6

    def test_unmatched_list_item_gets_eight(self):
        h = self._mk("item", category="List-item")
        TOC.rebuild_directory_by_toc([h], [])
        assert h["new_level"] == 8

    def test_empty_toc_demotes_by_rank(self):
        h1 = self._mk("# A")     # level 1
        h2 = self._mk("### B")   # level 3
        h3 = self._mk("plain")   # level 8
        TOC.rebuild_directory_by_toc([h1, h2, h3], [])
        # max_level=5; sorted levels [1,3,8] → 6, 7, 8
        assert (h1["new_level"], h2["new_level"], h3["new_level"]) == (6, 7, 8)

    def test_capped_at_eight(self):
        headers = [self._mk(t) for t in ["# A", "## B", "### C", "#### D"]]
        TOC.rebuild_directory_by_toc(headers, [])
        assert [h["new_level"] for h in headers] == [6, 7, 8, 8]

    def test_later_entry_overwrites(self):
        h = self._mk("Introduction")
        toc = [
            {"level": 1, "text": "Introduction", "to": [120.0, 120.0]},
            {"level": 3, "text": "Introduction", "to": [120.0, 130.0]},
        ]
        TOC.rebuild_directory_by_toc([h], toc)
        assert h["new_level"] == 3

    def test_all_gated_no_match(self):
        h = self._mk("Introduction")
        toc = [{"level": 1, "text": "zzzz qqqq wwww", "to": [120.0, 120.0]}]
        TOC.rebuild_directory_by_toc([h], toc)
        # gate → unmatched path: max_level=5, rank 0 → 6
        assert h["new_level"] == 6


class TestApplyTocRebuild:
    def test_none_skips_empty_runs(self):
        cells = [
            {"bbox": [100, 100, 500, 160], "category": "Section-header",
             "text": "## Intro"},
            {"bbox": [100, 200, 500, 300], "category": "Text", "text": "body"},
        ]
        assert TOC.apply_toc_rebuild(cells, None) is cells

        out = TOC.apply_toc_rebuild(cells, [])
        # empty-but-present TOC demotes the header: level 2 → 6
        assert out[0]["text"] == "###### Intro"
        assert out[0]["category"] == "Section-header"
        assert out[1] is cells[1]  # non-header untouched

    def test_matched_rewrite(self):
        cells = [
            {"bbox": [100, 100, 500, 160], "category": "Section-header",
             "text": "2.1 Intro"},
        ]
        toc = [{"level": 1, "text": "Intro", "to": [120.0, 120.0]}]
        out = TOC.apply_toc_rebuild(cells, toc)
        assert out[0]["text"] == "# 2.1 Intro"
        assert out[0]["category"] == "title"
