"""Interactive ground-truth track editor (analog of reference
tools/gt_editor/ — data_loader.py / track_manager.py / renderer.py /
ui_controller.py / editor.py, ~1.7k LoC).

Package layout mirrors the reference's separation so each piece is
headless-testable: the cv2 event loop lives only in editor.py.

  data_loader    tracks.json / gold-GT / session loading, frame images,
                 track generation from raw detections
  track_manager  pure editing logic (move/delete/add points, re-id, undo)
  renderer       camera + floormap views (homography projection)
  ui_controller  key bindings -> actions (pure)
  editor         GTTracksEditor cv2 loop + CLI
  bbox_annotator simple per-image bbox GT annotation (COCO out)
"""

from .data_loader import (
    FrameImageLoader,
    SessionTrackLoader,
    TrackDataLoader,
    TrackGenerator,
)
from .bbox_annotator import GTEditor
from .track_manager import TrackManager
from .ui_controller import Action, UIController

__all__ = [
    "FrameImageLoader",
    "SessionTrackLoader",
    "TrackDataLoader",
    "TrackGenerator",
    "TrackManager",
    "GTEditor",
    "Action",
    "UIController",
]
