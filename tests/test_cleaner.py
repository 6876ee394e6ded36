"""C1-C7 repair-chain unit tests (semantics of
/root/reference/dots_ocr/utils/output_cleaner.py replayed on crafted
malformed payloads)."""

import json

from dots_ocr_spark.spec import cleaner


def _cell(x1, y1, x2, y2, cat="Text", text="t"):
    return {"bbox": [x1, y1, x2, y2], "category": cat, "text": text}


class TestC1MissingDelimiters:
    def test_fixes_adjacent_braces_not_followed_by_key(self):
        s = "[{\"bbox\": [1,2,3,4], \"category\": {}} {}]"
        fixed, n = cleaner.fix_missing_delimiters(s)
        assert n == 1
        assert "},{" in fixed

    def test_followed_by_quote_guard(self):
        # faithful reference quirk (output_cleaner.py:39): `} {"` is NOT
        # rewritten — the (?!") lookahead excludes a following key quote,
        # so adjacent cell objects are repaired by the C5 regex-extraction
        # fallback instead.
        s = '[{"bbox": [1,2,3,4], "category": "Text"} {"bbox": [5,6,7,8], "category": "Text"}]'
        fixed, n = cleaner.fix_missing_delimiters(s)
        assert n == 0
        assert fixed == s

    def test_adjacent_objects_repaired_end_to_end_via_c5(self):
        s = '[{"bbox": [1,2,3,4], "category": "Text"} {"bbox": [5,6,7,8], "category": "Text"}]'
        out = cleaner.clean_model_output(s)
        assert out == [
            {"bbox": [1, 2, 3, 4], "category": "Text"},
            {"bbox": [5, 6, 7, 8], "category": "Text"},
        ]


class TestC2TailTruncation:
    def test_unterminated_payload_truncates_last_object(self):
        s = '[{"bbox": [1,2,3,4], "category": "Text", "text": "a"}, {"bbox": [5,6,7'
        out, truncated = cleaner.truncate_last_incomplete_element(s)
        assert truncated
        assert out == '[{"bbox": [1,2,3,4], "category": "Text", "text": "a"}'

    def test_single_object_never_truncated(self):
        s = '[{"bbox": [1,2,3,4], "category": "Text", "text": "incomplete'
        out, truncated = cleaner.truncate_last_incomplete_element(s)
        assert not truncated and out == s

    def test_wellformed_short_payload_untouched(self):
        s = '[{"bbox": [1,2,3,4], "category": "Text"}]'
        out, truncated = cleaner.truncate_last_incomplete_element(s)
        assert not truncated and out == s

    def test_over_50k_truncates_even_if_terminated(self):
        pad = "x" * 50_001
        s = ('[{"bbox": [1,2,3,4], "category": "Text", "text": "' + pad +
             '"}, {"bbox": [5,6,7,8], "category": "Text", "text": "b"}]')
        out, truncated = cleaner.truncate_last_incomplete_element(s)
        assert truncated
        assert out.endswith('"}')  # second object cut away
        assert '"b"' not in out


class TestC3DuplicateDicts:
    def test_exact_duplicates_keep_first(self):
        obj = '{"bbox": [1,2,3,4], "category": "Text", "text": "a"}'
        other = '{"bbox": [5,6,7,8], "category": "Text", "text": "b"}'
        s = f"[{obj}, {other}, {obj}]"
        out, n = cleaner.remove_duplicate_complete_dicts(s)
        assert n == 1
        assert out == f"[{obj}, {other}]"

    def test_no_duplicates_passthrough_untouched(self):
        s = '[{"bbox": [1,2,3,4], "category": "Text"}]  '
        out, n = cleaner.remove_duplicate_complete_dicts(s)
        assert n == 0 and out == s


class TestC4EnsureFormat:
    def test_wraps_and_strips_trailing_comma(self):
        assert cleaner.ensure_json_format('{"a": 1},') == '[{"a": 1}]'
        assert cleaner.ensure_json_format('[{"a": 1}]') == '[{"a": 1}]'


class TestC5Parse:
    def test_fallback_extracts_valid_dicts(self):
        s = '[{"bbox": [1,2,3,4], "category": "Text"}, {"bbox": [oops]'
        out = cleaner.parse_final_json(s)
        assert out == [{"bbox": [1, 2, 3, 4], "category": "Text"}]

    def test_single_incomplete_dict_salvage(self):
        s = '[{"bbox": [10, 20, 30, 40], "category": "Formula", "text": "E = mc'
        out = cleaner.parse_final_json(s)
        assert out == [{"bbox": [10, 20, 30, 40], "category": "Formula", "text": "E = mc"}]

    def test_salvage_defaults_category_text(self):
        s = '[{"bbox": [10, 20, 30, 40], "te'
        out = cleaner.parse_final_json(s)
        assert out == [{"bbox": [10, 20, 30, 40], "category": "Text"}]

    def test_unsalvageable_returns_none(self):
        assert cleaner.parse_final_json("complete garbage") is None


class TestC6ListClean:
    def test_three_coord_bbox_dropped_fields_kept(self):
        out = cleaner.clean_list_payload(
            [{"bbox": [1, 2, 3], "category": "Text", "text": "a"}]
        )
        assert out == [{"category": "Text", "text": "a"}]

    def test_three_coord_bbox_no_content_removed(self):
        assert cleaner.clean_list_payload([{"bbox": [1, 2, 3]}]) == []

    def test_bad_bbox_shapes_removed(self):
        assert cleaner.clean_list_payload([{"bbox": [1, 2], "category": "Text"}]) == []
        assert cleaner.clean_list_payload([{"bbox": "no", "category": "Text"}]) == []

    def test_missing_bbox_kept_iff_category(self):
        assert cleaner.clean_list_payload([{"category": "Text", "text": "a"}]) == [
            {"category": "Text", "text": "a"}
        ]
        assert cleaner.clean_list_payload([{"text": "a"}]) == []

    def test_non_dicts_removed(self):
        assert cleaner.clean_list_payload(["x", 3, None]) == []


class TestC7ThresholdDedup:
    def test_pair_threshold_is_five(self):
        cells4 = [_cell(i, i, i + 1, i + 1, text="dup") for i in range(4)]
        # 4 occurrences: below threshold, all kept
        assert len(cleaner.dedup_threshold(cells4)) == 4
        cells5 = [_cell(10 * i, 1, 10 * i + 5, 2, text="dup") for i in range(5)]
        out = cleaner.dedup_threshold(cells5)
        assert len(out) == 1 and out[0] is cells5[0]

    def test_bbox_threshold_is_two(self):
        a = _cell(1, 2, 3, 4, text="a")
        b = _cell(1, 2, 3, 4, text="b")  # same bbox, different text
        c = _cell(9, 9, 11, 11, text="c")
        out = cleaner.dedup_threshold([a, b, c])
        assert out == [a, c]

    def test_single_item_skipped(self):
        one = [_cell(1, 2, 3, 4)]
        assert cleaner.dedup_threshold(one) == one


class TestCleanModelOutput:
    def test_string_chain_end_to_end(self):
        obj = '{"bbox": [1,2,3,4], "category": "Text", "text": "a"}'
        s = f"[{obj} {obj}, {obj}"  # missing delimiter + dup + unterminated
        out = cleaner.clean_model_output(s)
        assert out == [{"bbox": [1, 2, 3, 4], "category": "Text", "text": "a"}]

    def test_failed_string_returns_empty(self):
        assert cleaner.clean_model_output("garbage without cells") == []

    def test_list_payload_goes_through_c6_and_c7(self):
        bad = {"bbox": [1, 2, 3], "category": "Text", "text": "x"}
        dup = _cell(5, 5, 9, 9, text="y")
        out = cleaner.clean_model_output([bad, dup, dict(dup)])
        assert out == [{"category": "Text", "text": "x"}, dup]
