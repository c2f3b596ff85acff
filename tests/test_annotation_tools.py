"""CVAT interchange + annotation integrity + baseline-report tools
(working equivalents of targets the reference Makefile advertises without
shipping the scripts)."""

import json
import sys
import xml.etree.ElementTree as ET
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from cvat_tools import cvat_to_mot, coco_to_cvat_tracks, main as cvat_main  # noqa: E402
from run_baseline import evaluate_session  # noqa: E402
from validate_annotation_integrity import validate  # noqa: E402


def _coco(tmp_path, anns=None, images=None):
    doc = {
        "images": images
        if images is not None
        else [
            {"id": 1, "file_name": "f1.jpg", "width": 1280, "height": 720},
            {"id": 2, "file_name": "f2.jpg", "width": 1280, "height": 720},
        ],
        "annotations": anns
        if anns is not None
        else [
            {"id": 10, "image_id": 1, "bbox": [100, 100, 50, 120], "track_id": 1},
            {"id": 11, "image_id": 2, "bbox": [110, 104, 50, 120], "track_id": 1},
            {"id": 12, "image_id": 1, "bbox": [600, 300, 60, 140]},
        ],
        "categories": [{"id": 1, "name": "person"}],
    }
    p = tmp_path / "coco.json"
    p.write_text(json.dumps(doc))
    return p


class TestCocoToCvat:
    def test_tracked_annotations_share_a_track(self, tmp_path):
        out = tmp_path / "tracks.xml"
        n = coco_to_cvat_tracks(_coco(tmp_path), out)
        assert n == 2  # track 1 (two boxes) + one auto track
        root = ET.parse(out).getroot()
        tracks = root.findall("track")
        assert len(tracks) == 2
        sizes = sorted(
            len([b for b in t.findall("box") if b.get("outside") == "0"])
            for t in tracks
        )
        assert sizes == [1, 2]

    def test_box_coordinates_are_xyxy(self, tmp_path):
        out = tmp_path / "tracks.xml"
        coco_to_cvat_tracks(_coco(tmp_path), out)
        root = ET.parse(out).getroot()
        widths = {
            round(float(b.get("xbr")) - float(b.get("xtl")), 2)
            for t in root.findall("track")
            for b in t.findall("box")
            if b.get("outside") == "0"
        }
        assert widths == {50.0, 60.0}  # xyxy encodes the xywh sizes

    def test_meta_original_size(self, tmp_path):
        out = tmp_path / "tracks.xml"
        coco_to_cvat_tracks(_coco(tmp_path), out)
        root = ET.parse(out).getroot()
        assert root.find("meta/task/original_size/width").text == "1280"
        assert root.find("meta/task/size").text == "2"


class TestCvatToMot:
    def test_roundtrip(self, tmp_path):
        xml_path = tmp_path / "tracks.xml"
        coco_to_cvat_tracks(_coco(tmp_path), xml_path)
        out = tmp_path / "gt.csv"
        n = cvat_to_mot(xml_path, out)
        assert n == 3  # outside=1 sentinels skipped
        rows = [line.split(",") for line in out.read_text().strip().splitlines()]
        assert all(len(r) == 10 for r in rows)
        # 1-based frames and ids
        assert min(int(r[0]) for r in rows) == 1
        assert min(int(r[1]) for r in rows) == 1
        # the tracked pair keeps one id across frames
        ids_by_frame = {}
        for r in rows:
            ids_by_frame.setdefault(int(r[0]), set()).add(int(r[1]))
        shared = ids_by_frame[1] & ids_by_frame[2]
        assert len(shared) == 1

    def test_cli(self, tmp_path, capsys):
        coco = _coco(tmp_path)
        xml_path = tmp_path / "t.xml"
        assert cvat_main(["coco-to-cvat", "--input", str(coco), "--output", str(xml_path)]) == 0
        assert cvat_main(["cvat-to-mot", "--input", str(xml_path), "--output", str(tmp_path / "m.csv")]) == 0
        assert "MOT rows" in capsys.readouterr().out


class TestValidateAnnotation:
    def test_clean_annotation_passes(self, tmp_path):
        imdir = tmp_path / "imgs"
        imdir.mkdir()
        (imdir / "f1.jpg").write_bytes(b"x")
        (imdir / "f2.jpg").write_bytes(b"x")
        errors, warnings = validate(_coco(tmp_path), imdir)
        assert errors == []

    def test_out_of_bounds_bbox(self, tmp_path):
        p = _coco(tmp_path, anns=[{"id": 1, "image_id": 1, "bbox": [1250, 100, 60, 100]}])
        errors, _ = validate(p)
        assert any("exceeds" in e for e in errors)

    def test_duplicate_ids_and_unknown_image(self, tmp_path):
        p = _coco(
            tmp_path,
            anns=[
                {"id": 1, "image_id": 1, "bbox": [0, 0, 10, 10]},
                {"id": 1, "image_id": 9, "bbox": [0, 0, 10, 10]},
            ],
        )
        errors, _ = validate(p)
        assert any("duplicate annotation id" in e for e in errors)
        assert any("unknown image_id" in e for e in errors)

    def test_non_positive_bbox(self, tmp_path):
        p = _coco(tmp_path, anns=[{"id": 1, "image_id": 1, "bbox": [0, 0, 0, 10]}])
        errors, _ = validate(p)
        assert any("non-positive" in e for e in errors)

    def test_missing_file_on_disk(self, tmp_path):
        imdir = tmp_path / "imgs"
        imdir.mkdir()
        (imdir / "f1.jpg").write_bytes(b"x")  # f2.jpg missing
        errors, _ = validate(_coco(tmp_path), imdir)
        assert any("missing on disk" in e for e in errors)

    def test_unannotated_image_is_warning(self, tmp_path):
        p = _coco(tmp_path, anns=[{"id": 1, "image_id": 1, "bbox": [0, 0, 10, 10]}])
        errors, warnings = validate(p)
        assert errors == []
        assert any("no annotations" in w for w in warnings)


class TestBaselineReport:
    def _session(self, tmp_path, frames=4, phase_time=1.0, status="completed"):
        d = tmp_path / "20250120_090000"
        d.mkdir()
        (d / "summary.json").write_text(
            json.dumps(
                {
                    "session_id": "20250120_090000",
                    "timestamp": "2025-01-20T09:00:00",
                    "status": status,
                    "statistics": {"frames_processed": frames, "total_detections": 9},
                    "performance": {
                        "01_extraction": {"total_time": phase_time, "count": 1},
                        "02_detection": {"total_time": phase_time, "count": 1},
                    },
                }
            )
        )
        return d

    def test_passing_session(self, tmp_path):
        report = evaluate_session(self._session(tmp_path))
        assert report["passed"]
        assert report["time_per_frame_s"] == pytest.approx(0.5)
        assert report["total_time_s"] == pytest.approx(2.0)

    def test_slow_session_fails_target(self, tmp_path):
        report = evaluate_session(self._session(tmp_path, frames=1, phase_time=5.0))
        assert not report["passed"]
        assert not report["checks"]["time_per_frame_s"]["passed"]

    def test_failed_status_fails(self, tmp_path):
        report = evaluate_session(self._session(tmp_path, status="failed"))
        assert not report["checks"]["status_completed"]["passed"]


class TestCvatSentinelBounds:
    def test_no_sentinel_past_task_size(self, tmp_path):
        """A keyframe on the final task frame must not emit an outside=1
        sentinel at frame == size (out of the declared 0..size-1 range)."""
        coco = _coco(
            tmp_path,
            anns=[
                {"id": 1, "image_id": 1, "bbox": [10, 10, 20, 30], "track_id": 1},
                {"id": 2, "image_id": 2, "bbox": [12, 11, 20, 30], "track_id": 1},
            ],
        )
        out = tmp_path / "t.xml"
        coco_to_cvat_tracks(coco, out)
        root = ET.parse(out).getroot()
        size = int(root.find("meta/task/size").text)
        frames = [int(b.get("frame")) for t in root.findall("track") for b in t.findall("box")]
        assert max(frames) <= size - 1

    def test_mid_track_gap_still_gets_sentinel(self, tmp_path):
        images = [
            {"id": i, "file_name": f"f{i}.jpg", "width": 100, "height": 100}
            for i in range(1, 5)
        ]
        coco = _coco(
            tmp_path,
            images=images,
            anns=[
                {"id": 1, "image_id": 1, "bbox": [0, 0, 10, 10], "track_id": 1},
                {"id": 2, "image_id": 4, "bbox": [5, 5, 10, 10], "track_id": 1},
            ],
        )
        out = tmp_path / "t.xml"
        coco_to_cvat_tracks(coco, out)
        root = ET.parse(out).getroot()
        outside = [b for t in root.findall("track") for b in t.findall("box")
                   if b.get("outside") == "1"]
        assert len(outside) == 1  # closes the gap after frame 0
        assert outside[0].get("frame") == "1"
