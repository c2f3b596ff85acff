"""OCR robustness regression tests: multi-font banks + degradation matrix.

Pins the round-3 robustness work (tools/ocr_robustness.py): the offline
engines must read timestamps rendered in faces OTHER than the synthetic
videos' Hershey simplex, survive defocus/recompression/contrast/scale
degradation, and the consensus must never score below the best single
engine under degradation (reference behavior to match: the multi-engine
consensus of reference src/timestamp/ocr_engine.py:153-379, which leans on
font-agnostic tesseract).
"""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pytest

from office_person_detection_vit_tpu.timestamp.ocr_engine import MultiEngineOCR
from office_person_detection_vit_tpu.timestamp.roi_extractor import (
    TimestampROIExtractor,
)
from office_person_detection_vit_tpu.timestamp.template_ocr import (
    TemplateOCREngine,
)
from office_person_detection_vit_tpu.timestamp.timestamp_parser import (
    TimestampParser,
)
from office_person_detection_vit_tpu.timestamp.zoning_ocr import ZoningOCREngine

cv2 = pytest.importorskip("cv2")

TEXT = "2026/08/18 14:05"
TRUTH = datetime(2026, 8, 18, 14, 5)


def render_roi(font_name: str, scale: float = 1.2, thickness: int = 2):
    canvas = np.full((60, 580), 28, np.uint8)
    cv2.putText(canvas, TEXT, (8, 44), getattr(cv2, font_name), scale, 235,
                thickness, cv2.LINE_AA)
    return canvas


def read_parsed(reader, roi) -> datetime | None:
    pre = TimestampROIExtractor().preprocess_roi(roi)
    if hasattr(reader, "extract_with_consensus"):
        text, _ = reader.extract_with_consensus(pre)
    else:
        text, _ = reader.extract(pre)
    return TimestampParser().fuzzy_parse(text)


# -------------------------------------------------------------- multi-font
def test_template_banks_cover_multiple_faces():
    banks = TemplateOCREngine().banks
    faces = {label.split("@")[0] for label, _ in banks}
    assert len(faces) >= 5, faces
    assert any("~" in label for label, _ in banks), "no defocused bank"


@pytest.mark.parametrize(
    # COMPLEX_SMALL renders ~25% smaller at equal cv2 scale; 1.6 matches the
    # other faces' glyph height (same calibration as tools/ocr_robustness.py).
    "font,scale", [("FONT_HERSHEY_PLAIN", 1.2), ("FONT_HERSHEY_DUPLEX", 1.2),
                   ("FONT_HERSHEY_COMPLEX", 1.2),
                   ("FONT_HERSHEY_TRIPLEX", 1.2),
                   ("FONT_HERSHEY_COMPLEX_SMALL", 1.6)],
)
def test_template_ocr_reads_other_hershey_faces(font, scale):
    assert read_parsed(TemplateOCREngine(), render_roi(font, scale)) == TRUTH


def test_zoning_ocr_reads_other_hershey_faces():
    assert read_parsed(ZoningOCREngine(),
                       render_roi("FONT_HERSHEY_COMPLEX")) == TRUTH


# ------------------------------------------------------------- degradation
def _degrade(roi, axis, level):
    if axis == "blur":
        return cv2.GaussianBlur(roi, (0, 0), level)
    if axis == "jpeg":
        ok, buf = cv2.imencode(".jpg", roi, [cv2.IMWRITE_JPEG_QUALITY, level])
        assert ok
        return cv2.imdecode(buf, cv2.IMREAD_GRAYSCALE)
    if axis == "contrast":
        f = roi.astype(np.float32)
        return np.clip((f - f.mean()) * level + f.mean(), 0, 255).astype(
            np.uint8)
    if axis == "scale":
        h, w = roi.shape[:2]
        return cv2.resize(roi, (int(w * level), int(h * level)))
    raise ValueError(axis)


@pytest.mark.parametrize("axis,level", [
    ("blur", 2.0), ("jpeg", 30), ("contrast", 0.5), ("contrast", 1.5),
    ("scale", 0.5), ("scale", 2.0),
])
def test_template_ocr_survives_degradation(axis, level):
    roi = _degrade(render_roi("FONT_HERSHEY_SIMPLEX"), axis, level)
    assert read_parsed(TemplateOCREngine(), roi) == TRUTH, (axis, level)


def test_zoning_ocr_survives_blur():
    """Zoning's measured defocus envelope is sigma<=1.0 at this glyph size —
    its stroke-crossing features are topology-sensitive by design; heavier
    blur is the template engine's job (the engines' failure modes are
    complementary, which is what the consensus exploits)."""
    roi = _degrade(render_roi("FONT_HERSHEY_SIMPLEX"), "blur", 1.0)
    assert read_parsed(ZoningOCREngine(), roi) == TRUTH


# ---------------------------------------------------------------- consensus
def test_consensus_at_least_best_single_under_degradation():
    """Weighted consensus parse accuracy >= each single engine's, over a
    fixed degraded grid (2 fonts x 4 degradations)."""
    cells = [
        (f, a, l)
        for f in ("FONT_HERSHEY_SIMPLEX", "FONT_HERSHEY_COMPLEX")
        for a, l in (("blur", 2.0), ("jpeg", 30), ("contrast", 0.5),
                     ("scale", 0.5))
    ]
    readers = {
        "template": TemplateOCREngine(),
        "zoning": ZoningOCREngine(),
        "consensus": MultiEngineOCR(engines=["template", "zoning"],
                                    consensus="weighted"),
    }
    hits = dict.fromkeys(readers, 0)
    for font, axis, level in cells:
        roi = _degrade(render_roi(font), axis, level)
        for name, reader in readers.items():
            hits[name] += int(read_parsed(reader, roi) == TRUTH)
    best_single = max(hits["template"], hits["zoning"])
    assert hits["consensus"] >= best_single, hits
    assert hits["consensus"] >= len(cells) - 1, hits  # near-perfect grid


def test_consensus_resolves_engine_disagreement():
    """A script-face ROI makes the engines disagree; weighted consensus must
    still return the template engine's (correct) reading."""
    roi = render_roi("FONT_HERSHEY_SCRIPT_SIMPLEX")
    pre = TimestampROIExtractor().preprocess_roi(roi)
    t_text, _ = TemplateOCREngine().extract(pre)
    consensus = MultiEngineOCR(engines=["template", "zoning"],
                               consensus="weighted")
    text, conf = consensus.extract_with_consensus(pre)
    assert TimestampParser().fuzzy_parse(text) == TRUTH, (text, t_text)
    assert conf > 0.3
