"""P1-P5/F1/F5/P9 geometry tests (image_utils.smart_resize truth table,
bbox algebra, IoU suppression, category remap)."""

import math

import pytest

from dots_ocr_spark.spec import geometry as G


class TestSmartResize:
    def test_multiples_of_factor(self):
        h, w = G.smart_resize(2200, 1700)
        assert h % 28 == 0 and w % 28 == 0

    def test_truth_table(self):
        # hand-computed against the reference formula
        assert G.smart_resize(2200, 1700) == (2212, 1708)
        assert G.smart_resize(100, 100) == (112, 112)  # upscale to min_pixels
        assert G.smart_resize(28, 28) == (56, 56)
        assert G.smart_resize(10000, 10000) == (3360, 3360)  # downscale to max

    def test_min_pixels_respected(self):
        h, w = G.smart_resize(20, 200)
        assert h * w >= G.MIN_PIXELS

    def test_max_pixels_respected(self):
        h, w = G.smart_resize(9000, 7000)
        assert h * w <= G.MAX_PIXELS

    def test_aspect_ratio_rejected(self):
        with pytest.raises(ValueError):
            G.smart_resize(10, 4000)

    def test_aspect_ratio_preserved_roughly(self):
        h, w = G.smart_resize(2200, 1100)
        assert abs((h / w) - 2.0) < 0.1


class TestBboxAlgebra:
    def test_scale_bbox_truncates_toward_zero(self):
        assert G.scale_bbox([10, 20, 30, 41], 3.0, 2.0) == [3, 10, 10, 20]

    def test_divide_bbox(self):
        sf = 200.0 / 72.0
        assert G.divide_bbox([278, 556, 834, 1112], sf) == [100, 200, 300, 400]

    def test_legality(self):
        assert G.bbox_is_legal([1, 2, 3, 4])
        assert not G.bbox_is_legal([3, 2, 1, 4])  # x0 >= x2
        assert not G.bbox_is_legal([1, 4, 3, 2])  # y0 >= y2
        assert not G.bbox_is_legal([1, 2, 3])
        assert not G.bbox_is_legal("bbox")
        assert not G.bbox_is_legal([1, 2, 3, "4"])

    def test_clamp(self):
        assert G.clamp_bbox([10, 10, 2000, 3000], 1700, 2200) == [10, 10, 1700, 2200]
        assert G.clamp_bbox([10, 10, 100, 100], 1700, 2200) == [10, 10, 100, 100]


class TestIoU:
    def test_identical(self):
        assert G.iou([0, 0, 10, 10], [0, 0, 10, 10]) == 1.0

    def test_disjoint(self):
        assert G.iou([0, 0, 10, 10], [20, 20, 30, 30]) == 0.0

    def test_partial(self):
        assert math.isclose(G.iou([0, 0, 10, 10], [5, 0, 15, 10]), 50 / 150)

    def test_suppression_drops_smaller(self):
        big = {"bbox": [0, 0, 100, 100], "category": "Table"}
        small = {"bbox": [1, 1, 100, 100], "category": "Text"}  # IoU ~0.96
        out = G.exclude_overlap_boxes([small, big])
        assert out == [big]

    def test_suppression_keeps_equal_areas(self):
        a = {"bbox": [0, 0, 100, 100], "category": "Text"}
        b = {"bbox": [0, 0, 100, 100], "category": "Table"}
        assert G.exclude_overlap_boxes([a, b]) == [a, b]

    def test_below_threshold_kept(self):
        a = {"bbox": [0, 0, 100, 100], "category": "Text"}
        b = {"bbox": [0, 0, 80, 100], "category": "Text"}  # IoU 0.8
        assert G.exclude_overlap_boxes([a, b]) == [a, b]


class TestCategoryRemap:
    def test_mapping(self):
        assert G.remap_category("doc_title") == "Title"
        assert G.remap_category("paragraph_title") == "Section-header"
        assert G.remap_category("figure") == "Picture"
        assert G.remap_category("footer") == "Page-footer"
        assert G.remap_category("formula_number") == "Text"

    def test_passthrough(self):
        assert G.remap_category("Table") == "Table"
        assert G.remap_category("seal") == "seal"
