"""MultiEngineOCR consensus tests (reference tests/test_ocr_engine.py analog):
the three consensus modes with fake engines, parallel failure isolation,
Levenshtein/format scoring, registry gating."""

import numpy as np
import pytest

from office_person_detection_vit_tpu.timestamp.ocr_engine import (
    MultiEngineOCR,
    format_confidence,
    levenshtein,
    similarity,
)


class FakeEngine:
    def __init__(self, name, text, conf, raises=False):
        self.name = name
        self._text = text
        self._conf = conf
        self._raises = raises

    def is_available(self):
        return True

    def extract(self, image):
        if self._raises:
            raise RuntimeError("engine exploded")
        return self._text, self._conf


def _ocr(engines, consensus):
    ocr = MultiEngineOCR(engines=[], consensus=consensus)
    ocr.engines = engines
    return ocr


IMG = np.zeros((32, 128), np.uint8)
TS = "2025/01/20 09:00:00"


class TestLevenshtein:
    def test_identical(self):
        assert levenshtein("abc", "abc") == 0

    def test_substitution_insertion(self):
        assert levenshtein("2025", "2O25") == 1
        assert levenshtein("90:00", "9000") == 1

    def test_similarity_normalized(self):
        assert similarity("", "") == 1.0
        assert similarity("abcd", "abcd") == 1.0
        assert similarity("abcd", "abce") == pytest.approx(0.75)


class TestFormatConfidence:
    def test_perfect_timestamp(self):
        assert format_confidence(TS) == 1.0
        assert format_confidence("2025/01/20 09:00") == 1.0

    def test_empty(self):
        assert format_confidence("") == 0.0
        assert format_confidence("   ") == 0.0

    def test_partial_shapes_ranked(self):
        garbled = format_confidence("2O25/O1/2O O9:OO")  # letters, has / and :
        few_digits = format_confidence("12 people")  # digits, no separators
        assert 0 < few_digits < garbled < 1.0
        assert format_confidence("no digits at all") == 0.0


class TestConsensusModes:
    def test_baseline_agreeing_top2_average(self):
        ocr = _ocr(
            [FakeEngine("a", TS, 0.9), FakeEngine("b", TS, 0.7),
             FakeEngine("c", "junk", 0.99)],
            "baseline",
        )
        # top-2 by conf: c (junk, .99) and a (TS, .9) disagree -> best kept
        text, conf = ocr.extract_with_consensus(IMG)
        assert text == "junk"
        assert conf == pytest.approx(0.99 * 0.7)

    def test_baseline_agreement_boosts(self):
        ocr = _ocr([FakeEngine("a", TS, 0.9), FakeEngine("b", TS, 0.7)], "baseline")
        text, conf = ocr.extract_with_consensus(IMG)
        assert text == TS
        assert conf == pytest.approx(0.8)

    def test_voting_two_of_three(self):
        ocr = _ocr(
            [FakeEngine("a", TS, 0.6), FakeEngine("b", TS, 0.8),
             FakeEngine("c", "other", 0.95)],
            "voting",
        )
        text, conf = ocr.extract_with_consensus(IMG)
        assert text == TS
        assert conf == pytest.approx(0.7)

    def test_voting_no_majority_falls_back_to_weighted(self):
        # tesseract weight 1.0 beats an unknown engine at equal conf/format.
        ocr = _ocr(
            [FakeEngine("tesseract", TS, 0.8), FakeEngine("x", "2025/01/20 09:05:00", 0.8)],
            "voting",
        )
        text, _ = ocr.extract_with_consensus(IMG)
        assert text == TS

    def test_weighted_prefers_format_shaped_text(self):
        # higher raw conf but garbage format loses to a real timestamp.
        ocr = _ocr(
            [FakeEngine("tesseract", "##", 0.9), FakeEngine("template", TS, 0.8)],
            "weighted",
        )
        text, conf = ocr.extract_with_consensus(IMG)
        assert text == TS
        assert conf == pytest.approx(0.8)

    def test_single_engine_conf_scaled_by_format(self):
        ocr = _ocr([FakeEngine("a", TS, 0.9)], "weighted")
        text, conf = ocr.extract_with_consensus(IMG)
        assert text == TS
        assert conf == pytest.approx(0.9)  # format score 1.0

    def test_all_empty_results(self):
        ocr = _ocr([FakeEngine("a", "", 0.0), FakeEngine("b", "", 0.0)], "weighted")
        assert ocr.extract_with_consensus(IMG) == ("", 0.0)

    def test_engine_exception_isolated(self):
        ocr = _ocr(
            [FakeEngine("boom", "", 0, raises=True), FakeEngine("ok", TS, 0.7)],
            "weighted",
        )
        text, conf = ocr.extract_with_consensus(IMG)
        assert text == TS


class TestRegistry:
    def test_unknown_engine_skipped_with_template_fallback(self):
        ocr = MultiEngineOCR(engines=["no_such_engine"])
        assert len(ocr.engines) == 1
        assert ocr.engines[0].name == "template"

    def test_from_config(self):
        from office_person_detection_vit_tpu.config.config_manager import ConfigManager

        cfg = ConfigManager.from_dict(
            {"ocr": {"engines": ["template"], "consensus": "voting"}}
        )
        ocr = MultiEngineOCR.from_config(cfg)
        assert ocr.consensus == "voting"
        assert [e.name for e in ocr.engines] == ["template"]
