"""TrajectoryExporter / SideBySideVideoExporter."""

import csv
import json

import cv2
import numpy as np

from office_person_detection_vit_tpu.core.dto import Detection, FrameResult
from office_person_detection_vit_tpu.utils.export_utils import (
    SideBySideVideoExporter,
    TrajectoryExporter,
)


def _frames():
    d1 = Detection(bbox=(10, 10, 20, 40), confidence=0.9, track_id=1)
    d2 = Detection(bbox=(50, 10, 20, 40), confidence=0.8, track_id=2)
    d3 = Detection(bbox=(12, 12, 20, 40), confidence=0.95, track_id=1)
    untracked = Detection(bbox=(0, 0, 5, 5), confidence=0.4)
    return [
        FrameResult(0, "2025-01-01 10:00:00", [d1, d2, untracked]),
        FrameResult(1, "2025-01-01 10:05:00", [d3]),
    ]


class TestTrajectoryExporter:
    def test_csv(self, tmp_path):
        path = TrajectoryExporter(tmp_path).export_csv(_frames())
        rows = list(csv.reader(path.open()))
        assert rows[0][:3] == ["frame", "timestamp", "track_id"]
        assert len(rows) == 4  # header + 3 tracked detections
        assert rows[1][2] == "1"

    def test_mot_csv_one_based_frames(self, tmp_path):
        path = TrajectoryExporter(tmp_path).export_mot_csv(_frames())
        rows = list(csv.reader(path.open()))
        assert len(rows) == 3
        assert rows[0][0] == "1" and rows[2][0] == "2"
        assert rows[0][7:] == ["-1", "-1", "-1"]

    def test_json_groups_by_track(self, tmp_path):
        path = TrajectoryExporter(tmp_path).export_json(_frames())
        data = json.loads(path.read_text())
        assert data["num_tracks"] == 2
        track1 = next(t for t in data["tracks"] if t["track_id"] == 1)
        assert len(track1["trajectory"]) == 2

    def test_video(self, tmp_path):
        images = [np.zeros((120, 160, 3), np.uint8)] * 2
        path = TrajectoryExporter(tmp_path).export_video(_frames(), images, fps=2)
        assert path is not None and path.exists() and path.stat().st_size > 0


class TestSideBySide:
    def test_pair_and_export(self, tmp_path):
        det_dir = tmp_path / "det"
        fm_dir = tmp_path / "fm"
        det_dir.mkdir()
        fm_dir.mkdir()
        for ts in ("20250101_100000", "20250101_100500"):
            cv2.imwrite(str(det_dir / f"detection_{ts}.jpg"), np.zeros((72, 128, 3), np.uint8))
            cv2.imwrite(str(fm_dir / f"floormap_{ts}.png"), np.full((100, 90, 3), 128, np.uint8))
        # One unmatched file on each side must be dropped.
        cv2.imwrite(str(det_dir / "detection_20250101_101000.jpg"), np.zeros((72, 128, 3), np.uint8))
        exporter = SideBySideVideoExporter(fps=2, height=72)
        pairs = exporter.pair_images(det_dir, fm_dir)
        assert len(pairs) == 2
        out = exporter.export(det_dir, fm_dir, tmp_path / "sbs.mp4")
        assert out is not None and out.stat().st_size > 0

    def test_no_pairs(self, tmp_path):
        (tmp_path / "a").mkdir()
        (tmp_path / "b").mkdir()
        out = SideBySideVideoExporter().export(
            tmp_path / "a", tmp_path / "b", tmp_path / "o.mp4"
        )
        assert out is None


class TestTrajectoryExporterMore:
    def test_empty_frames_write_header_only(self, tmp_path):
        path = TrajectoryExporter(tmp_path).export_csv([])
        rows = list(csv.reader(path.open()))
        assert rows == [["frame", "timestamp", "track_id", "x", "y", "w", "h", "confidence"]]

    def test_json_includes_floor_mm_when_present(self, tmp_path):
        det = Detection(
            bbox=(1, 2, 3, 4), confidence=0.5, track_id=9,
            floor_coords_mm=(2819.26, 5638.52),
        )
        path = TrajectoryExporter(tmp_path).export_json(
            [FrameResult(0, "2025-01-01 10:00:00", [det])]
        )
        data = json.loads(path.read_text())
        point = data["tracks"][0]["trajectory"][0]
        assert point["floor_mm"] == [2819.3, 5638.5]

    def test_image_sequence_named_by_frame_number(self, tmp_path):
        frames = _frames()
        images = [np.zeros((60, 80, 3), np.uint8)] * 2
        paths = TrajectoryExporter(tmp_path).export_image_sequence(frames, images)
        assert [p.name for p in paths] == ["tracked_000000.jpg", "tracked_000001.jpg"]
        assert all(p.exists() for p in paths)

    def test_export_video_empty_returns_none(self, tmp_path):
        assert TrajectoryExporter(tmp_path).export_video([], []) is None

    def test_untracked_detections_never_exported(self, tmp_path):
        frames = [FrameResult(0, None, [Detection(bbox=(0, 0, 5, 5), confidence=0.4)])]
        exp = TrajectoryExporter(tmp_path)
        assert len(list(csv.reader(exp.export_csv(frames).open()))) == 1
        assert json.loads(exp.export_json(frames).read_text())["num_tracks"] == 0


class TestTimestampPairing:
    def test_key_extraction_variants(self):
        from pathlib import Path

        from office_person_detection_vit_tpu.utils.export_utils import _timestamp_key

        assert _timestamp_key(Path("detection_20250101_100000.jpg")) == "20250101_100000"
        assert _timestamp_key(Path("floormap_20250101-100000.png")) == "20250101-100000"
        assert _timestamp_key(Path("frame_000123.jpg")) == "000123"
        # no timestamp token -> whole stem (pairs only with identical stems)
        assert _timestamp_key(Path("snapshot.png")) == "snapshot"

    def test_mixed_extensions_pair(self, tmp_path):
        det_dir, fm_dir = tmp_path / "d", tmp_path / "f"
        det_dir.mkdir(), fm_dir.mkdir()
        cv2.imwrite(str(det_dir / "detection_100000.png"), np.zeros((20, 20, 3), np.uint8))
        cv2.imwrite(str(fm_dir / "floormap_100000.jpg"), np.zeros((20, 20, 3), np.uint8))
        assert len(SideBySideVideoExporter().pair_images(det_dir, fm_dir)) == 1

    def test_resize_to_height_preserves_aspect(self):
        exp = SideBySideVideoExporter(height=100)
        out = exp._resize_to_height(np.zeros((50, 80, 3), np.uint8))
        assert out.shape == (100, 160, 3)
        same = exp._resize_to_height(np.zeros((100, 40, 3), np.uint8))
        assert same.shape == (100, 40, 3)


class TestCropAndZoom:
    def _map(self, h=400, w=600):
        img = np.zeros((h, w, 3), np.uint8)
        img[:, :, 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
        return img

    def test_no_points_returns_full_map(self):
        img = self._map()
        out = SideBySideVideoExporter.crop_and_zoom_floormap(img, [])
        assert out.shape == img.shape

    def test_out_of_bounds_points_ignored(self):
        img = self._map()
        out = SideBySideVideoExporter.crop_and_zoom_floormap(
            img, [(-10, 5), (10_000, 10)]
        )
        assert out.shape == img.shape

    def test_min_zoom_ratio_enforced(self):
        # A single cluster of close points must not zoom past 50% of the map.
        img = self._map()
        out = SideBySideVideoExporter.crop_and_zoom_floormap(
            img, [(300, 200), (305, 203)], min_zoom_ratio=0.5
        )
        assert out.shape[1] >= 300 and out.shape[0] >= 200

    def test_crop_covers_spread_points_with_margin(self):
        img = self._map()
        out = SideBySideVideoExporter.crop_and_zoom_floormap(
            img, [(100, 100), (500, 300)], zoom_margin=0.1, min_zoom_ratio=0.1
        )
        # crop is smaller than the map but includes the activity bbox
        assert out.shape[0] < 400 and out.shape[1] < 600
        assert out.shape[1] >= 400 - 1  # >= spread + margins

    def test_target_size_resize(self):
        img = self._map()
        out = SideBySideVideoExporter.crop_and_zoom_floormap(
            img, [(300, 200)], target_size=(120, 80)
        )
        assert out.shape == (80, 120, 3)

    def test_export_with_zoom_mapping(self, tmp_path):
        det_dir, fm_dir = tmp_path / "d", tmp_path / "f"
        det_dir.mkdir(), fm_dir.mkdir()
        for ts in ("100000", "100500"):
            cv2.imwrite(str(det_dir / f"detection_{ts}.jpg"), np.zeros((72, 128, 3), np.uint8))
            cv2.imwrite(str(fm_dir / f"floormap_{ts}.png"), np.full((100, 150, 3), 128, np.uint8))
        points = {"100000": [(50.0, 40.0)], "100500": [(100.0, 80.0)]}
        out = SideBySideVideoExporter(fps=2, height=72).export(
            det_dir, fm_dir, tmp_path / "z.mp4", floor_points_by_key=points
        )
        assert out is not None and out.stat().st_size > 0


class TestFrameIndex:
    def test_every_frame_listed_including_empty(self, tmp_path):
        frames = _frames() + [FrameResult(2, "2025-01-01 10:10:00", [])]
        path = TrajectoryExporter(tmp_path).export_frame_index(frames)
        rows = list(csv.reader(path.open()))
        assert rows[0] == ["mot_frame", "video_frame", "timestamp"]
        assert len(rows) == 4  # header + 3 frames (incl. the empty one)
        assert rows[3] == ["3", "2", "2025-01-01 10:10:00"]
        # mot_frame is the 1-based position, independent of video_frame
        assert [r[0] for r in rows[1:]] == ["1", "2", "3"]
