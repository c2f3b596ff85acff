"""TimestampExtractorV2 depth tests (reference
tests/test_timestamp_extractor_v2.py analog): MD5 cache behavior and
eviction, retry-with-varied-preprocessing, confidence combination, batch
path with stateful validation; plus MOT CSV loader row formats."""

from datetime import datetime

import numpy as np
import pytest

from office_person_detection_vit_tpu.benchmark.mot_metrics import load_mot_csv
from office_person_detection_vit_tpu.timestamp.timestamp_extractor import (
    CACHE_SIZE,
    TimestampExtractorV2,
)
from office_person_detection_vit_tpu.timestamp.timestamp_validator import (
    NoOpValidator,
)


class CountingOCR:
    """Deterministic fake OCR counting real extractions."""

    def __init__(self, text="2025/01/20 09:00:00", conf=0.9, fail_first=0):
        self.text = text
        self.conf = conf
        self.calls = 0
        self.fail_first = fail_first

    def extract_with_consensus(self, image):
        self.calls += 1
        if self.calls <= self.fail_first:
            return "", 0.0
        return self.text, self.conf


def _extractor(ocr, **kw):
    ext = TimestampExtractorV2(validator=NoOpValidator(), **kw)
    ext.ocr = ocr
    return ext


def _frame(seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (720, 1280, 3), np.uint8)


class TestCache:
    def test_identical_roi_hits_cache(self):
        ocr = CountingOCR()
        ext = _extractor(ocr)
        f = _frame()
        ts1, c1 = ext.extract(f, 0)
        ts2, c2 = ext.extract(f.copy(), 30)
        assert ts1 == ts2 == datetime(2025, 1, 20, 9, 0, 0)
        assert ocr.calls == 1  # second call served from cache
        stats = ext.get_cache_stats()
        assert stats["hits"] == 1 and stats["misses"] == 1

    def test_different_rois_miss(self):
        ocr = CountingOCR()
        ext = _extractor(ocr)
        ext.extract(_frame(0), 0)
        ext.extract(_frame(1), 30)
        assert ocr.calls == 2

    def test_cache_bounded(self):
        ocr = CountingOCR()
        ext = _extractor(ocr)
        for i in range(CACHE_SIZE + 10):
            key = f"k{i}"
            ext._cache[key] = ("t", 1.0)
        # trigger the eviction path via a real cached call
        ext._cached_ocr(np.zeros((4, 4), np.uint8))
        assert len(ext._cache) <= CACHE_SIZE


class TestRetries:
    def test_retry_with_varied_preprocessing(self):
        ocr = CountingOCR(fail_first=2)
        ext = _extractor(ocr, retry_count=3)
        ts, conf = ext.extract(_frame(), 0)
        assert ts is not None
        assert ocr.calls == 3  # 1 original + 2 retries

    def test_gives_up_after_retry_count(self):
        ocr = CountingOCR(fail_first=99)
        ext = _extractor(ocr, retry_count=3)
        ts, conf = ext.extract(_frame(), 0)
        assert ts is None and conf == 0.0
        assert ocr.calls == 3


class TestConfidence:
    def test_combined_is_mean_of_three(self):
        # perfect format (1.0), OCR 0.9, NoOp validation passes through 0.9
        ocr = CountingOCR(conf=0.9)
        ext = _extractor(ocr)
        _, combined = ext.extract(_frame(), 0)
        assert combined == pytest.approx(np.mean([0.9, 1.0, 0.9]))

    def test_below_threshold_rejected(self):
        ocr = CountingOCR(conf=0.05)
        ext = _extractor(ocr, confidence_threshold=0.9)
        ts, conf = ext.extract(_frame(), 0)
        assert ts is None and 0 < conf < 0.9


class TestBatchParallel:
    def test_order_preserved_and_validated(self):
        ocr = CountingOCR()
        ext = _extractor(ocr, max_workers=4)
        frames = [(i * 30, _frame(i)) for i in range(5)]
        out = ext.extract_batch_parallel(frames)
        assert [fn for fn, _, _ in out] == [0, 30, 60, 90, 120]
        assert all(ts is not None for _, ts, _ in out)


class TestMotCsvLoader:
    def test_standard_rows(self, tmp_path):
        p = tmp_path / "m.csv"
        p.write_text("1,1,10,20,30,40,0.9,-1,-1,-1\n2,1,11,21,30,40,0.8,-1,-1,-1\n")
        out = load_mot_csv(p)
        assert out[1][0] == (1, (10.0, 20.0, 30.0, 40.0))

    def test_header_and_comments_skipped(self, tmp_path):
        p = tmp_path / "m.csv"
        p.write_text("frame,id,x,y,w,h\n# comment\n1,2,0,0,10,10,1,-1,-1,-1\n")
        out = load_mot_csv(p)
        assert list(out) == [1]

    def test_center_point_rows_get_nominal_box(self, tmp_path):
        # zero-size rows are center points (reference mot_metrics.py:136-148)
        p = tmp_path / "m.csv"
        p.write_text("1,1,100,200,0,0,1,-1,-1,-1\n")
        out = load_mot_csv(p)
        tid, (x, y, w, h) = out[1][0]
        assert (w, h) == (50.0, 130.0)
        assert x == 75.0 and y == 135.0  # centered on (100, 200)
