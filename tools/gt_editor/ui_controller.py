"""Key-binding -> action mapping for the GT editor (analog of reference
tools/gt_editor/ui_controller.py:1-137). Pure: process_key returns an Action
the editor loop interprets, so bindings are testable without a display."""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum


class Action(Enum):
    NONE = "none"
    QUIT = "quit"
    SAVE = "save"
    NEXT_FRAME = "next_frame"
    PREV_FRAME = "prev_frame"
    UNDO = "undo"
    DELETE_SELECTED = "delete_selected"
    NEW_TRACK = "new_track"
    ADD_POINT = "add_point"
    CHANGE_ID = "change_id"
    HELP = "help"


#: key -> action (cv2 waitKey & 0xFF codes; chars for readability)
KEY_BINDINGS: dict[str, Action] = {
    "q": Action.QUIT,
    "s": Action.SAVE,
    "n": Action.NEXT_FRAME,
    " ": Action.NEXT_FRAME,
    "p": Action.PREV_FRAME,
    "u": Action.UNDO,
    "d": Action.DELETE_SELECTED,
    "a": Action.NEW_TRACK,
    "e": Action.ADD_POINT,
    "i": Action.CHANGE_ID,
    "h": Action.HELP,
}

HELP_TEXT = """GT track editor
  click        select nearest point (drag moves it)
  n / space    next frame          p   previous frame
  a            new track at cursor e   extend selected track to this frame
  d            delete selected point
  i            change selected track id (type digits, enter)
  u            undo                s   save
  h            this help           q   save + quit
"""


@dataclass
class UIState:
    frame_idx: int = 0
    selected: tuple[int, int] | None = None  # (track_id, frame)
    cursor: tuple[float, float] = (0.0, 0.0)
    dragging: bool = False


class UIController:
    def __init__(self):
        self.state = UIState()

    def process_key(self, key: int) -> Action:
        try:
            char = chr(key & 0xFF)
        except ValueError:
            return Action.NONE
        return KEY_BINDINGS.get(char, Action.NONE)

    # Mouse protocol: the editor loop calls these from the cv2 callback.
    def mouse_down(self, x: float, y: float, manager, frame_number: int) -> None:
        self.state.cursor = (x, y)
        hit = manager.find_nearest_point(frame_number, x, y)
        self.state.selected = (hit[0], frame_number) if hit else None
        self.state.dragging = hit is not None
        if self.state.dragging:
            manager.checkpoint()  # one undo entry per drag gesture

    def mouse_move(self, x: float, y: float, manager) -> None:
        self.state.cursor = (x, y)
        if self.state.dragging and self.state.selected:
            tid, frame = self.state.selected
            manager.update_point(tid, frame, x, y, checkpoint=False)

    def mouse_up(self) -> None:
        self.state.dragging = False
