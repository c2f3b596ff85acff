from datetime import datetime, timedelta

import numpy as np
import pytest

from office_person_detection_vit_tpu.timestamp.ocr_engine import (
    MultiEngineOCR,
    format_confidence,
    levenshtein,
    similarity,
)
from office_person_detection_vit_tpu.timestamp.roi_extractor import TimestampROIExtractor
from office_person_detection_vit_tpu.timestamp.template_ocr import TemplateOCREngine
from office_person_detection_vit_tpu.timestamp.timestamp_extractor import (
    TimestampExtractorV2,
)
from office_person_detection_vit_tpu.timestamp.timestamp_parser import TimestampParser
from office_person_detection_vit_tpu.timestamp.timestamp_validator import (
    NoOpValidator,
    TemporalValidatorV2,
)
from tests.helpers.synthetic_video import render_frame


# ------------------------------------------------------------------- parser
def test_parse_standard():
    p = TimestampParser()
    assert p.parse("2025/01/20 12:34:56") == datetime(2025, 1, 20, 12, 34, 56)
    assert p.parse("2025-01-20 12:34") == datetime(2025, 1, 20, 12, 34)
    assert p.parse("garbage") is None


def test_parse_japanese():
    p = TimestampParser()
    assert p.parse("2025年1月20日 12時34分56秒") == datetime(2025, 1, 20, 12, 34, 56)


def test_fuzzy_char_confusions():
    p = TimestampParser()
    # O->0, l->1, S->5, B->8, Z->2, G->6
    assert p.fuzzy_parse("2O25/Ol/2O l2:34:S6") == datetime(2025, 1, 20, 12, 34, 56)


def test_fuzzy_missing_separators():
    p = TimestampParser()
    assert p.fuzzy_parse("20250120 123456") == datetime(2025, 1, 20, 12, 34, 56)
    assert p.fuzzy_parse("2025/01/2012:34") == datetime(2025, 1, 20, 12, 34)


def test_fuzzy_rejects_invalid_date():
    assert TimestampParser().fuzzy_parse("2025/13/45 99:99:99") is None


# ---------------------------------------------------------------- similarity
def test_levenshtein_and_similarity():
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("abc", "abd") == 1
    assert similarity("2025/01/20", "2025/01/20") == 1.0
    assert similarity("", "") == 1.0
    assert 0 < similarity("2025/01/20", "2025/01/21") < 1


def test_format_confidence():
    assert format_confidence("2025/01/20 12:34:56") == 1.0
    assert format_confidence("") == 0.0
    assert format_confidence("hello") < 0.3


# ----------------------------------------------------------------- validator
def test_validator_accepts_consistent_sequence():
    v = TemporalValidatorV2(fps=30, time_compression_ratio=313.0, base_tolerance_seconds=30)
    t0 = datetime(2025, 1, 20, 9, 0, 0)
    # 150 frames at 30fps = 5s video = 1565s wall clock
    r1 = v.validate(t0, 0)
    assert r1.is_valid
    r2 = v.validate(t0 + timedelta(seconds=1565), 150)
    assert r2.is_valid and not r2.corrected


def test_validator_interpolates_outlier():
    v = TemporalValidatorV2(fps=30, time_compression_ratio=1.0, base_tolerance_seconds=2.0)
    t0 = datetime(2025, 1, 20, 9, 0, 0)
    for i in range(5):
        r = v.validate(t0 + timedelta(seconds=i), 30 * i)
        assert r.is_valid
    # Wild OCR error: jumps a year ahead.
    bad = t0 + timedelta(days=365)
    r = v.validate(bad, 180)
    assert r.is_valid and r.corrected
    assert abs((r.timestamp - (t0 + timedelta(seconds=6))).total_seconds()) < 2.0


def test_validator_rejects_non_monotonic_frame():
    v = TemporalValidatorV2()
    t0 = datetime(2025, 1, 20, 9, 0, 0)
    v.validate(t0, 100)
    r = v.validate(t0, 50)
    assert not r.is_valid


# -------------------------------------------------------------- template OCR
def test_template_ocr_reads_rendered_timestamp():
    roi_ex = TimestampROIExtractor()
    frame = render_frame(datetime(2025, 1, 20, 12, 34, 56))
    roi = roi_ex.preprocess_roi(roi_ex.extract_roi(frame))
    eng = TemplateOCREngine()
    text, conf = eng.extract(roi)
    parsed = TimestampParser().fuzzy_parse(text)
    assert parsed == datetime(2025, 1, 20, 12, 34, 56), f"OCR read {text!r}"
    assert conf > 0.5


def test_template_ocr_empty_image():
    eng = TemplateOCREngine()
    text, conf = eng.extract(np.zeros((40, 200), np.uint8))
    assert text == "" and conf == 0.0


# ---------------------------------------------------------------- extractor
@pytest.fixture
def extractor():
    return TimestampExtractorV2(
        ocr_engine=MultiEngineOCR(engines=["template"]),
        validator=NoOpValidator(),
        confidence_threshold=0.3,
    )


def test_extractor_end_to_end(extractor):
    frame = render_frame(datetime(2025, 1, 20, 9, 5, 0))
    ts, conf = extractor.extract(frame, 0)
    assert ts == datetime(2025, 1, 20, 9, 5, 0)
    assert conf > 0.3


def test_extractor_cache(extractor):
    frame = render_frame(datetime(2025, 1, 20, 9, 5, 0))
    extractor.extract(frame, 0)
    extractor.extract(frame, 1)  # identical ROI -> cache hit
    stats = extractor.get_cache_stats()
    assert stats["hits"] >= 1
    assert stats["hit_rate"] > 0


def test_extractor_batch_parallel(extractor):
    t0 = datetime(2025, 1, 20, 9, 0, 0)
    frames = [
        (i * 10, render_frame(t0 + timedelta(minutes=5 * i)))
        for i in range(4)
    ]
    out = extractor.extract_batch_parallel(frames)
    assert [fn for fn, _, _ in out] == [0, 10, 20, 30]
    for i, (fn, ts, conf) in enumerate(out):
        assert ts == t0 + timedelta(minutes=5 * i)


def test_extractor_garbage_frame(extractor):
    ts, conf = extractor.extract(np.zeros((720, 1280, 3), np.uint8), 0)
    assert ts is None


# --------------------------------------------------------------------- ROI
def test_roi_region_matches_config():
    ex = TimestampROIExtractor(x_ratio=0.7, y_ratio=0.045, width_ratio=0.28, height_ratio=0.06)
    frame = np.zeros((720, 1280, 3), np.uint8)
    roi = ex.extract_roi(frame)
    assert roi.shape[0] == int(720 * 0.06)
    assert roi.shape[1] == int(1280 * 0.28)


def test_roi_preprocess_upscales():
    ex = TimestampROIExtractor(min_width=300)
    roi = np.random.default_rng(0).integers(0, 255, (20, 100, 3), np.uint8)
    out = ex.preprocess_roi(roi)
    assert out.shape[1] == 300 and out.ndim == 2


# ---------------------------------------------------------------- zoning OCR
def test_zoning_ocr_reads_rendered_timestamp():
    """Second dependency-free engine (timestamp/zoning_ocr.py): zoning +
    projection + stroke-crossing features vs the template engine's NCC —
    different recognition principle, same segmentation contract."""
    from office_person_detection_vit_tpu.timestamp.zoning_ocr import ZoningOCREngine

    roi_ex = TimestampROIExtractor()
    frame = render_frame(datetime(2025, 1, 20, 12, 34, 56))
    roi = roi_ex.preprocess_roi(roi_ex.extract_roi(frame))
    text, conf = ZoningOCREngine().extract(roi)
    parsed = TimestampParser().fuzzy_parse(text)
    assert parsed == datetime(2025, 1, 20, 12, 34, 56), f"OCR read {text!r}"
    assert conf > 0.4


def test_zoning_ocr_across_fonts():
    """The centroid classifier generalizes to a Hershey font it was never
    rendered from (COMPLEX) at several scales."""
    import cv2

    from office_person_detection_vit_tpu.timestamp.zoning_ocr import ZoningOCREngine

    eng = ZoningOCREngine()
    for scale in (1.0, 1.3, 1.6):
        canvas = np.zeros((70, 760), np.uint8)
        cv2.putText(canvas, "2024/01/15 10:30:45", (8, 52),
                    cv2.FONT_HERSHEY_COMPLEX, scale, 255, 2, cv2.LINE_AA)
        text, _ = eng.extract(canvas)
        assert text.replace(" ", "") == "2024/01/1510:30:45", (scale, text)


def test_segmentation_splits_touching_glyphs():
    """At small scales thick strokes merge adjacent digits into one
    connected component; _split_touching recovers the glyph boxes (both
    offline engines previously read '12:34:56' as '12:2:56' here)."""
    import cv2

    canvas = np.zeros((70, 760), np.uint8)
    cv2.putText(canvas, "12:34:56", (8, 52), cv2.FONT_HERSHEY_DUPLEX,
                1.0, 255, 2, cv2.LINE_AA)
    text, _ = TemplateOCREngine().extract(canvas)
    assert text == "12:34:56"


def test_real_two_engine_consensus_offline():
    """MultiEngineOCR consensus runs with TWO real engines in this
    hermetic environment (template + zoning) — every consensus mode
    agrees on a rendered timestamp, no mocks involved."""
    roi_ex = TimestampROIExtractor()
    frame = render_frame(datetime(2025, 3, 2, 8, 15, 30))
    roi = roi_ex.preprocess_roi(roi_ex.extract_roi(frame))
    for mode in ("baseline", "weighted", "voting"):
        ocr = MultiEngineOCR(engines=["template", "zoning"], consensus=mode)
        assert len(ocr.engines) == 2, [e.name for e in ocr.engines]
        text, conf = ocr.extract_with_consensus(roi)
        parsed = TimestampParser().fuzzy_parse(text)
        assert parsed == datetime(2025, 3, 2, 8, 15, 30), (mode, text)
        assert conf > 0.4


def test_consensus_weighted_prefers_format_shaped_disagreement():
    """When the two real engines disagree, weighted consensus picks the
    better (weight x confidence x format) candidate."""

    class Fixed:
        def __init__(self, name, text, conf):
            self.name, self._t, self._c = name, text, conf

        def is_available(self):
            return True

        def extract(self, image):
            return self._t, self._c

    ocr = MultiEngineOCR(engines=["template"], consensus="weighted")
    ocr.engines = [Fixed("template", "2025/03/02 08:15:30", 0.6),
                   Fixed("zoning", "///:::", 0.9)]  # confident garbage
    text, _ = ocr.extract_with_consensus(np.zeros((40, 200), np.uint8))
    assert text == "2025/03/02 08:15:30"
