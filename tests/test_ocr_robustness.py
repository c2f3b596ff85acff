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


# ---------------------------------------------------- non-Hershey glyphs
class TestBitmapFontFamily:
    """The 5x7 dot-matrix bitmap family (timestamp/bitmap_font.py) breaks
    the Hershey monoculture: hard pixel edges, no anti-aliasing, stroke
    geometry no cv2 outline face produces (VERDICT r3 #8). Real OCR engines
    (tesseract etc.) are NOT installed in this environment and have never
    executed here; these synthetic families are the hermetic stand-in for
    the reference's real-Tesseract CI."""

    def test_render_text_is_binary_and_blocky(self):
        from office_person_detection_vit_tpu.timestamp.bitmap_font import (
            render_text,
        )

        img = render_text("14:05", scale=4)
        assert img.dtype == np.uint8
        assert set(np.unique(img)) == {28, 235}
        # Nearest-neighbour upscale: every lit region is an exact multiple
        # of the scale in both axes (no anti-aliased edge pixels).
        ys, xs = np.nonzero(img == 235)
        assert (ys.max() - ys.min() + 1) % 4 == 0

    def test_template_engine_has_bitmap_bank(self):
        labels = [label for label, _ in TemplateOCREngine().banks]
        assert any(label.startswith("BITMAP_5X7") for label in labels), labels

    @pytest.mark.parametrize("text,truth", [
        ("2026/08/18 14:05", datetime(2026, 8, 18, 14, 5)),
        ("2025/12/31 23:59", datetime(2025, 12, 31, 23, 59)),
    ])
    def test_template_ocr_reads_bitmap_font(self, text, truth):
        from office_person_detection_vit_tpu.timestamp.bitmap_font import (
            render_text,
        )

        assert read_parsed(TemplateOCREngine(), render_text(text)) == truth

    def test_consensus_reads_bitmap_font(self):
        from office_person_detection_vit_tpu.timestamp.bitmap_font import (
            render_text,
        )

        consensus = MultiEngineOCR(engines=["template", "zoning"],
                                   consensus="weighted")
        assert read_parsed(consensus, render_text(TEXT)) == TRUTH

    def test_template_ocr_reads_bitmap_font_under_blur(self):
        from office_person_detection_vit_tpu.timestamp.bitmap_font import (
            render_text,
        )

        roi = _degrade(render_text(TEXT), "blur", 1.0)
        assert read_parsed(TemplateOCREngine(), roi) == TRUTH
