"""OCR robustness matrix: fonts x degradations -> per-engine + consensus accuracy.

The reference exercises OCR robustness implicitly by running real Tesseract
over real footage in CI (reference .github/workflows/ci.yml:69-72, engines at
reference src/timestamp/ocr_engine.py:153-379). The hermetic rebuild ships two
offline engines instead; this tool proves they are not single-font one-tricks:
it renders timestamp ROIs in every cv2 Hershey face, degrades them along four
axes (Gaussian blur, JPEG re-encode, contrast gain, scale drift), feeds each
ROI through the SAME preprocessing the pipeline uses
(TimestampROIExtractor.preprocess_roi) and scores

  - each engine alone (template, zoning),
  - MultiEngineOCR consensus in all three modes (baseline/weighted/voting),

on two metrics: exact string match (whitespace-insensitive) and parse accuracy
(TimestampParser.fuzzy_parse recovers the ground-truth datetime — the metric
Phase 1 actually lives on).

Usage:
  python tools/ocr_robustness.py [--out docs/artifacts/ocr_robustness.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from datetime import datetime
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from office_person_detection_vit_tpu.timestamp.ocr_engine import (  # noqa: E402
    MultiEngineOCR,
)
from office_person_detection_vit_tpu.timestamp.roi_extractor import (  # noqa: E402
    TimestampROIExtractor,
)
from office_person_detection_vit_tpu.timestamp.template_ocr import (  # noqa: E402
    TemplateOCREngine,
)
from office_person_detection_vit_tpu.timestamp.timestamp_parser import (  # noqa: E402
    TimestampParser,
)
from office_person_detection_vit_tpu.timestamp.zoning_ocr import (  # noqa: E402
    ZoningOCREngine,
)

TIMESTAMPS = [
    ("2026/08/18 14:05", datetime(2026, 8, 18, 14, 5)),
    ("2025/12/31 23:59", datetime(2025, 12, 31, 23, 59)),
    ("2026/01/02 09:00", datetime(2026, 1, 2, 9, 0)),
    ("2026/06/15 08:45", datetime(2026, 6, 15, 8, 45)),
]

#: (face, scale, thickness) — every Hershey family, incl. the script faces
#: that no template bank matches exactly (worst-case font drift), plus the
#: non-Hershey 5x7 dot-matrix bitmap family (timestamp/bitmap_font.py):
#: hard pixel edges, no anti-aliasing — glyph geometry no cv2 outline face
#: produces, breaking the Hershey monoculture (VERDICT r3 #8).
FONTS = [
    ("FONT_HERSHEY_SIMPLEX", 1.2, 2),
    ("FONT_HERSHEY_PLAIN", 2.4, 2),
    ("FONT_HERSHEY_DUPLEX", 1.2, 2),
    ("FONT_HERSHEY_COMPLEX", 1.2, 2),
    ("FONT_HERSHEY_TRIPLEX", 1.2, 2),
    ("FONT_HERSHEY_COMPLEX_SMALL", 1.6, 2),
    ("FONT_HERSHEY_SCRIPT_SIMPLEX", 1.2, 2),
    ("BITMAP_5X7", 5, 0),
]

#: Degradation cells: vary one axis at a time off the clean base.
CELLS = [
    ("clean", 0.0),
    ("blur", 1.0),
    ("blur", 2.0),
    ("jpeg", 50),
    ("jpeg", 30),
    ("contrast", 0.5),
    ("contrast", 1.5),
    ("scale", 0.5),
    ("scale", 2.0),
]


def render_roi(text: str, font_name: str, scale: float, thickness: int):
    import cv2

    if font_name == "BITMAP_5X7":
        from office_person_detection_vit_tpu.timestamp.bitmap_font import (
            render_text,
        )

        return render_text(text, scale=int(scale))
    canvas = np.full((60, 580), 28, np.uint8)  # dark background, light text
    cv2.putText(canvas, text, (8, 44), getattr(cv2, font_name), scale, 235,
                thickness, cv2.LINE_AA)
    return canvas


def degrade(roi: np.ndarray, axis: str, level) -> np.ndarray:
    import cv2

    if axis == "clean":
        return roi
    if axis == "blur":
        k = int(2 * round(2 * level) + 1)
        return cv2.GaussianBlur(roi, (k, k), float(level))
    if axis == "jpeg":
        ok, buf = cv2.imencode(".jpg", roi,
                               [cv2.IMWRITE_JPEG_QUALITY, int(level)])
        assert ok
        return cv2.imdecode(buf, cv2.IMREAD_GRAYSCALE)
    if axis == "contrast":
        f = roi.astype(np.float32)
        return np.clip((f - f.mean()) * float(level) + f.mean(),
                       0, 255).astype(np.uint8)
    if axis == "scale":
        h, w = roi.shape[:2]
        return cv2.resize(roi, (max(8, int(w * level)), max(8, int(h * level))),
                          interpolation=cv2.INTER_AREA if level < 1
                          else cv2.INTER_CUBIC)
    raise ValueError(axis)


def norm(text: str) -> str:
    return "".join(text.split())


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=Path,
                        default=Path("docs/artifacts/ocr_robustness.json"))
    args = parser.parse_args(argv)

    pre = TimestampROIExtractor()
    ts_parser = TimestampParser()
    engines = {"template": TemplateOCREngine(), "zoning": ZoningOCREngine()}
    consensus = {
        f"consensus_{mode}": MultiEngineOCR(engines=["template", "zoning"],
                                            consensus=mode)
        for mode in ("baseline", "weighted", "voting")
    }

    def read(reader, roi) -> tuple[str, float]:
        if hasattr(reader, "extract_with_consensus"):
            return reader.extract_with_consensus(roi)
        return reader.extract(roi)

    readers = {**engines, **consensus}
    cells: list[dict] = []
    for axis, level in CELLS:
        for font_name, fscale, fthick in FONTS:
            per_reader = {name: {"exact": 0, "parsed": 0} for name in readers}
            for text, truth in TIMESTAMPS:
                roi = degrade(render_roi(text, font_name, fscale, fthick),
                              axis, level)
                roi = pre.preprocess_roi(roi)
                for name, reader in readers.items():
                    got, _conf = read(reader, roi)
                    per_reader[name]["exact"] += int(norm(got) == norm(text))
                    parsed = ts_parser.fuzzy_parse(got)
                    per_reader[name]["parsed"] += int(parsed == truth)
            for name, hits in per_reader.items():
                cells.append({
                    "axis": axis, "level": level, "font": font_name,
                    "reader": name,
                    "exact_acc": hits["exact"] / len(TIMESTAMPS),
                    "parse_acc": hits["parsed"] / len(TIMESTAMPS),
                })

    # Aggregates: overall + per-axis parse accuracy per reader.
    summary: dict[str, dict] = {}
    for name in readers:
        rows = [c for c in cells if c["reader"] == name]
        degraded = [c for c in rows if c["axis"] != "clean"]
        summary[name] = {
            "overall_parse_acc": float(np.mean([c["parse_acc"] for c in rows])),
            "degraded_parse_acc": float(
                np.mean([c["parse_acc"] for c in degraded])),
            "overall_exact_acc": float(np.mean([c["exact_acc"] for c in rows])),
            "per_axis_parse": {
                axis: float(np.mean([c["parse_acc"] for c in rows
                                     if c["axis"] == axis]))
                for axis in dict.fromkeys(a for a, _ in CELLS)
            },
        }

    out = {
        "protocol": {
            "timestamps": [t for t, _ in TIMESTAMPS],
            "fonts": [f[0] for f in FONTS],
            "cells": [[a, l] for a, l in CELLS],
            "preprocessing": "TimestampROIExtractor.preprocess_roi",
        },
        "summary": summary,
        "cells": cells,
    }
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(out, indent=1))

    singles = {k: v["degraded_parse_acc"] for k, v in summary.items()
               if not k.startswith("consensus")}
    print(json.dumps({k: round(v["degraded_parse_acc"], 4)
                      for k, v in summary.items()}, indent=1))
    best_single = max(singles.values())
    ok = summary["consensus_weighted"]["degraded_parse_acc"] >= best_single
    print(f"consensus_weighted {'>=':s} best single engine under degradation: "
          f"{ok} ({summary['consensus_weighted']['degraded_parse_acc']:.4f} "
          f"vs {best_single:.4f})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
