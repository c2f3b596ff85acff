"""`python -m tools.gt_editor` -> interactive track editor CLI."""

from tools.gt_editor.editor import main

raise SystemExit(main())
