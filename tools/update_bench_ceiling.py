"""Record a trusted on-chip ceiling measurement into the committed guard
artifact (docs/artifacts/bench_ceiling.json).

bench.py's end-to-end number rides a shared bursty tunnel; only the
scan-chained ``compute_ceiling_fps`` can detect an on-chip regression.
This tool is the explicit per-round update step — bench runs themselves
never write the artifact, so a congested/no-chip run can't erase the
baseline.

Usage:
  python tools/update_bench_ceiling.py --ceiling 366.9 --round 5
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

ARTIFACT = Path(__file__).resolve().parents[1] / "docs" / "artifacts" / "bench_ceiling.json"


def update(ceiling_fps: float, round_no: int, path: Path = ARTIFACT) -> dict:
    doc = json.loads(path.read_text()) if path.exists() else {"history": {}}
    doc.setdefault("history", {})[f"r{round_no:02d}"] = round(ceiling_fps, 1)
    doc["ceiling_fps"] = round(ceiling_fps, 1)
    doc["round"] = round_no
    doc.setdefault(
        "note",
        "compute_ceiling_fps committed per round; bench.py flags "
        "ceiling_regressed when a run measures < 95% of this.",
    )
    path.write_text(json.dumps(doc, indent=2) + "\n")
    return doc


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--ceiling", type=float, required=True)
    p.add_argument("--round", type=int, required=True)
    p.add_argument("--out", type=Path, default=ARTIFACT)
    args = p.parse_args(argv)
    doc = update(args.ceiling, args.round, args.out)
    print(json.dumps(doc, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
