"""GTTracksEditor — interactive cv2 loop + CLI (analog of reference
tools/gt_editor/editor.py:24-387).

Usage:
  python -m tools.gt_editor --session output/20260816_120000 \
      [--floormap floormap.png] [--output gt_tracking.json]
  python -m tools.gt_editor --tracks tracks.json --frames frames_dir \
      [--homography config.yaml] [--generate-from detections.json]

The editing logic/rendering live in sibling modules and are headless; only
``run()`` needs a display.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from tools.gt_editor.data_loader import (  # noqa: E402
    FrameImageLoader,
    SessionTrackLoader,
    TrackDataLoader,
    TrackGenerator,
)
from tools.gt_editor.renderer import CameraRenderer, FloormapRenderer, compose  # noqa: E402
from tools.gt_editor.track_manager import TrackManager  # noqa: E402
from tools.gt_editor.ui_controller import HELP_TEXT, Action, UIController  # noqa: E402

logger = logging.getLogger("gt_editor")


class GTTracksEditor:
    def __init__(
        self,
        tracks: list[dict],
        frames: FrameImageLoader,
        homography: np.ndarray | None = None,
        floormap: np.ndarray | None = None,
        output: Path = Path("gt_tracking.json"),
        gold_output: bool = True,
    ):
        self.manager = TrackManager(tracks)
        self.frames = frames
        self.camera = CameraRenderer()
        self.floormap = FloormapRenderer(floormap, homography)
        self.ui = UIController()
        self.output = Path(output)
        self.gold_output = gold_output
        all_frames = sorted(
            set(self.manager.frame_numbers()) | set(frames.frame_numbers())
        )
        self.frame_numbers = all_frames or [0]

    # ---------------------------------------------------------------- state
    @property
    def current_frame_number(self) -> int:
        return self.frame_numbers[self.ui.state.frame_idx]

    def render(self) -> np.ndarray:
        fnum = self.current_frame_number
        frame = self.frames.load(fnum)
        if frame is None:
            frame = np.full((480, 640, 3), 30, np.uint8)
        # Remember the camera half's extent: mouse events use composite-
        # window coordinates, and only the camera half maps to image space.
        self._cam_hw = frame.shape[:2]
        cam = self.camera.render(frame, self.manager, fnum, self.ui.state.selected)
        floor = self.floormap.render(self.manager, fnum)
        return compose(cam, floor)

    def in_camera_view(self, x: float, y: float) -> bool:
        """True when a composite-window coordinate lies on the camera half
        (clicks on the floormap half must not edit camera-space points)."""
        h, w = getattr(self, "_cam_hw", (480, 640))
        return 0 <= x < w and 0 <= y < h

    def save(self) -> Path:
        if self.gold_output:
            doc = TrackDataLoader.to_gold(self.manager.tracks)
            self.output.write_text(json.dumps(doc, indent=2), encoding="utf-8")
        else:
            TrackDataLoader.save(self.manager.tracks, self.output)
        logger.info("saved %d tracks -> %s", len(self.manager.tracks), self.output)
        return self.output

    # ------------------------------------------------------------- actions
    def apply(self, action: Action) -> bool:
        """Apply one action; returns False when the loop should exit.
        Headless-testable core of the event loop."""
        st = self.ui.state
        fnum = self.current_frame_number
        if action is Action.QUIT:
            self.save()
            return False
        if action is Action.SAVE:
            self.save()
        elif action is Action.NEXT_FRAME:
            st.frame_idx = min(st.frame_idx + 1, len(self.frame_numbers) - 1)
        elif action is Action.PREV_FRAME:
            st.frame_idx = max(st.frame_idx - 1, 0)
        elif action is Action.UNDO:
            self.manager.undo()
        elif action is Action.DELETE_SELECTED and st.selected:
            self.manager.delete_point(st.selected[0], st.selected[1])
            st.selected = None
        elif action is Action.NEW_TRACK:
            x, y = st.cursor
            tid = self.manager.add_new_track(fnum, x, y)
            st.selected = (tid, fnum)
        elif action is Action.ADD_POINT and st.selected:
            x, y = st.cursor
            self.manager.add_point(st.selected[0], fnum, x, y)
        elif action is Action.HELP:
            print(HELP_TEXT)
        return True

    # ----------------------------------------------------------------- loop
    def run(self) -> None:  # pragma: no cover - requires display
        import cv2

        win = "gt_editor"
        cv2.namedWindow(win)

        def on_mouse(event, x, y, flags, param):
            if not self.in_camera_view(x, y):
                # Floormap-half clicks are view-only: releasing there still
                # ends a drag, but never edits camera-space geometry.
                if event == cv2.EVENT_LBUTTONUP:
                    self.ui.mouse_up()
                return
            if event == cv2.EVENT_LBUTTONDOWN:
                self.ui.mouse_down(x, y, self.manager, self.current_frame_number)
            elif event == cv2.EVENT_MOUSEMOVE:
                self.ui.mouse_move(x, y, self.manager)
            elif event == cv2.EVENT_LBUTTONUP:
                self.ui.mouse_up()

        cv2.setMouseCallback(win, on_mouse)
        print(HELP_TEXT)
        digits = ""
        while True:
            cv2.imshow(win, self.render())
            key = cv2.waitKey(30) & 0xFF
            if key == 255:
                continue
            action = self.ui.process_key(key)
            if action is Action.CHANGE_ID and self.ui.state.selected:
                digits = ""
                while True:  # collect digits until enter
                    k = cv2.waitKey(0) & 0xFF
                    if k in (13, 10):
                        break
                    if 48 <= k <= 57:
                        digits += chr(k)
                if digits:
                    self.manager.change_track_id(
                        self.ui.state.selected[0], int(digits)
                    )
                    self.ui.state.selected = None
                continue
            if not self.apply(action):
                break
        cv2.destroyAllWindows()


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Interactive GT track editor")
    parser.add_argument("--session", type=Path, help="pipeline session dir")
    parser.add_argument("--tracks", type=Path, help="tracks.json / gold GT")
    parser.add_argument("--frames", type=Path, help="frame image dir")
    parser.add_argument("--generate-from", type=Path, help="detections.json to bootstrap tracks")
    parser.add_argument("--homography", type=Path, help="config.yaml with homography.matrix")
    parser.add_argument("--floormap", type=Path, help="floormap image")
    parser.add_argument("--output", type=Path, default=Path("gt_tracking.json"))
    parser.add_argument("--format", choices=["gold", "tracks"], default="gold")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    homography = None
    floormap = None
    if args.session:
        loader = SessionTrackLoader(args.session)
        tracks = loader.load_tracks()
        frames = loader.frame_loader()
        homography = loader.load_homography()
    else:
        if not args.frames:
            parser.error("--frames is required without --session")
        frames = FrameImageLoader(args.frames)
        if args.generate_from:
            doc = json.loads(args.generate_from.read_text())
            tracks = TrackGenerator().generate(doc)
        elif args.tracks:
            tracks = TrackDataLoader.load(args.tracks)
        else:
            tracks = []
    if args.homography:
        import yaml

        doc = yaml.safe_load(args.homography.read_text())
        matrix = (doc.get("homography") or {}).get("matrix")
        if matrix:
            homography = np.asarray(matrix, np.float64)
    if args.floormap and args.floormap.exists():
        import cv2

        floormap = cv2.imread(str(args.floormap))

    editor = GTTracksEditor(
        tracks, frames, homography, floormap,
        output=args.output, gold_output=args.format == "gold",
    )
    editor.run()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
