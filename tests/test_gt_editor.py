"""GT track editor: headless tests for the editing core, loaders, renderer
and key/action plumbing (tools/gt_editor/; reference tools/gt_editor/ has the
same split: data_loader / track_manager / renderer / ui_controller / editor)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.gt_editor.data_loader import (  # noqa: E402
    FrameImageLoader,
    SessionTrackLoader,
    TrackDataLoader,
    TrackGenerator,
)
from tools.gt_editor.track_manager import TrackManager  # noqa: E402
from tools.gt_editor.ui_controller import Action, UIController  # noqa: E402


def make_tracks():
    return [
        {"track_id": 1, "trajectory": [
            {"frame": 0, "bbox": [100.0, 100.0, 40.0, 80.0]},
            {"frame": 1, "bbox": [110.0, 100.0, 40.0, 80.0]},
        ]},
        {"track_id": 2, "trajectory": [
            {"frame": 0, "bbox": [400.0, 200.0, 40.0, 80.0]},
        ]},
    ]


class TestTrackManager:
    def test_queries(self):
        m = TrackManager(make_tracks())
        assert m.get_track_by_id(2)["track_id"] == 2
        assert m.get_point_at_frame(1, 1)["bbox"][0] == 110.0
        assert m.get_max_frame() == 1
        assert len(m.points_at_frame(0)) == 2
        # nearest: click near track 1's center (120, 140)
        tid, _ = m.find_nearest_point(0, 118, 138)
        assert tid == 1
        assert m.find_nearest_point(0, 700, 700) is None

    def test_update_point_moves_center(self):
        m = TrackManager(make_tracks())
        assert m.update_point(1, 0, 200.0, 300.0)
        b = m.get_point_at_frame(1, 0)["bbox"]
        assert b[0] + b[2] / 2 == 200.0 and b[1] + b[3] / 2 == 300.0

    def test_delete_point_drops_empty_track(self):
        m = TrackManager(make_tracks())
        assert m.delete_point(2, 0)
        assert m.get_track_by_id(2) is None

    def test_change_id_and_merge(self):
        m = TrackManager(make_tracks())
        assert m.change_track_id(2, 7)
        assert m.get_track_by_id(7) is not None
        # merge 7 into 1: frame-0 collision keeps 1's point, others join
        assert m.change_track_id(7, 1)
        assert m.get_track_by_id(7) is None
        assert m.get_point_at_frame(1, 0)["bbox"][0] == 100.0

    def test_add_track_and_point(self):
        m = TrackManager(make_tracks())
        tid = m.add_new_track(5, 50.0, 60.0)
        assert tid == 3
        assert m.get_point_at_frame(tid, 5) is not None
        assert m.add_point(tid, 6, 55.0, 65.0)
        # size copied from the nearest existing point
        b = m.get_point_at_frame(tid, 6)["bbox"]
        assert (b[2], b[3]) == (60.0, 140.0)
        # duplicate frame rejected
        assert not m.add_point(tid, 6, 0, 0)

    def test_undo_restores(self):
        m = TrackManager(make_tracks())
        m.update_point(1, 0, 999.0, 999.0)
        m.delete_point(2, 0)
        assert m.undo()  # restore track 2
        assert m.get_track_by_id(2) is not None
        assert m.undo()  # restore point position
        assert m.get_point_at_frame(1, 0)["bbox"][0] == 100.0
        assert not TrackManager([]).undo()


class TestDataLoader:
    def test_tracks_json_round_trip(self, tmp_path):
        p = TrackDataLoader.save(make_tracks(), tmp_path / "t.json")
        loaded = TrackDataLoader.load(p)
        assert loaded == make_tracks()

    def test_gold_round_trip(self, tmp_path):
        gold = TrackDataLoader.to_gold(make_tracks())
        assert gold["format"] == "gold_tracking_gt"
        assert gold["frames"][0]["frame_number"] == 0
        assert len(gold["frames"][0]["annotations"]) == 2
        (tmp_path / "g.json").write_text(json.dumps(gold))
        loaded = TrackDataLoader.load(tmp_path / "g.json")
        by_id = {t["track_id"]: t for t in loaded}
        assert [p["frame"] for p in by_id[1]["trajectory"]] == [0, 1]

    def test_frame_image_loader_parses_idx_names(self, tmp_path):
        import cv2

        for name in ("frame_20250826_160500_idx4.jpg", "frame_20250826_161000_idx9.jpg"):
            cv2.imwrite(str(tmp_path / name), np.zeros((24, 32, 3), np.uint8))
        loader = FrameImageLoader(tmp_path)
        assert loader.frame_numbers() == [4, 9]
        assert loader.load(4) is not None
        assert loader.load(5) is None

    def test_session_loader(self, tmp_path):
        import cv2

        (tmp_path / "03_tracking").mkdir()
        (tmp_path / "01_extraction/frames").mkdir(parents=True)
        TrackDataLoader.save(make_tracks(), tmp_path / "03_tracking/tracks.json")
        cv2.imwrite(str(tmp_path / "01_extraction/frames/000000.jpg"),
                    np.zeros((24, 32, 3), np.uint8))
        (tmp_path / "config.yaml").write_text(
            "homography:\n  matrix: [[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]\n")
        loader = SessionTrackLoader(tmp_path)
        assert len(loader.load_tracks()) == 2
        assert loader.frame_loader().frame_numbers() == [0]
        np.testing.assert_array_equal(loader.load_homography(), np.eye(3))

    def test_track_generator_links_nearest(self):
        doc = {"frames": [
            {"frame_number": 0, "detections": [
                {"bbox": [100, 100, 40, 80]}, {"bbox": [400, 200, 40, 80]}]},
            {"frame_number": 1, "detections": [
                {"bbox": [110, 102, 40, 80]}, {"bbox": [395, 205, 40, 80]}]},
            {"frame_number": 2, "detections": [
                {"bbox": [120, 104, 40, 80]}]},
        ]}
        tracks = TrackGenerator(max_link_distance=50).generate(doc)
        assert len(tracks) == 2
        by_id = {t["track_id"]: t for t in tracks}
        assert [p["frame"] for p in by_id[1]["trajectory"]] == [0, 1, 2]
        assert [p["frame"] for p in by_id[2]["trajectory"]] == [0, 1]

    def test_track_generator_far_detection_starts_new_track(self):
        doc = {"frames": [
            {"frame_number": 0, "detections": [{"bbox": [0, 0, 10, 10]}]},
            {"frame_number": 1, "detections": [{"bbox": [900, 600, 10, 10]}]},
        ]}
        tracks = TrackGenerator(max_link_distance=50).generate(doc)
        assert len(tracks) == 2


class TestEditorCore:
    def _editor(self, tmp_path):
        import cv2

        from tools.gt_editor.editor import GTTracksEditor

        frames_dir = tmp_path / "frames"
        frames_dir.mkdir()
        for i in range(2):
            cv2.imwrite(str(frames_dir / f"{i:06d}.jpg"),
                        np.zeros((240, 320, 3), np.uint8))
        return GTTracksEditor(
            make_tracks(), FrameImageLoader(frames_dir),
            homography=np.eye(3), output=tmp_path / "gt.json",
        )

    def test_render_composes_camera_and_floormap(self, tmp_path):
        ed = self._editor(tmp_path)
        img = ed.render()
        assert img.ndim == 3 and img.shape[0] == 240 and img.shape[1] > 320

    def test_actions_drive_state_and_save(self, tmp_path):
        ed = self._editor(tmp_path)
        assert ed.apply(Action.NEXT_FRAME) and ed.current_frame_number == 1
        assert ed.apply(Action.PREV_FRAME) and ed.current_frame_number == 0
        ed.ui.state.cursor = (50.0, 60.0)
        ed.apply(Action.NEW_TRACK)
        assert ed.manager.get_track_by_id(3) is not None
        ed.apply(Action.UNDO)
        assert ed.manager.get_track_by_id(3) is None
        assert ed.apply(Action.QUIT) is False  # saves + exits
        doc = json.loads((tmp_path / "gt.json").read_text())
        assert doc["format"] == "gold_tracking_gt"

    def test_mouse_select_and_drag(self, tmp_path):
        ed = self._editor(tmp_path)
        ed.ui.mouse_down(118, 138, ed.manager, 0)  # near track 1 center
        assert ed.ui.state.selected == (1, 0)
        ed.ui.mouse_move(200, 220, ed.manager)
        ed.ui.mouse_up()
        b = ed.manager.get_point_at_frame(1, 0)["bbox"]
        assert b[0] + b[2] / 2 == pytest.approx(200.0)
        # delete the selected point via the action path
        ed.apply(Action.DELETE_SELECTED)
        assert ed.manager.get_point_at_frame(1, 0) is None

    def test_key_bindings(self):
        ui = UIController()
        assert ui.process_key(ord("q")) is Action.QUIT
        assert ui.process_key(ord(" ")) is Action.NEXT_FRAME
        assert ui.process_key(ord("z")) is Action.NONE


class TestReviewRegressions:
    def test_drag_is_one_undo_entry(self, tmp_path):
        """A continuous drag pushes ONE checkpoint (at gesture start), so
        undo restores the pre-drag position, not the last pixel step."""
        ui = UIController()
        m = TrackManager(make_tracks())
        ui.mouse_down(118, 138, m, 0)  # selects track 1
        for x in range(120, 400, 3):  # ~90 move events
            ui.mouse_move(float(x), 140.0, m)
        ui.mouse_up()
        b = m.get_point_at_frame(1, 0)["bbox"]
        assert b[0] + b[2] / 2 == pytest.approx(399.0)
        assert len(m._undo) == 1
        assert m.undo()
        b = m.get_point_at_frame(1, 0)["bbox"]
        assert b[0] == 100.0  # pre-drag position restored

    def test_floormap_half_clicks_rejected(self, tmp_path):
        import cv2

        from tools.gt_editor.data_loader import FrameImageLoader
        from tools.gt_editor.editor import GTTracksEditor

        frames_dir = tmp_path / "frames"
        frames_dir.mkdir()
        cv2.imwrite(str(frames_dir / "000000.jpg"), np.zeros((240, 320, 3), np.uint8))
        ed = GTTracksEditor(make_tracks(), FrameImageLoader(frames_dir),
                            homography=np.eye(3), output=tmp_path / "gt.json")
        ed.render()  # establishes the camera extent
        assert ed.in_camera_view(100, 100)
        assert not ed.in_camera_view(500, 100)  # floormap half
        assert not ed.in_camera_view(100, 300)  # below camera
