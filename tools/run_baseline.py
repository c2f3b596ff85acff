"""Baseline run + verification.

The reference Makefile's ``baseline`` target calls ``scripts/run_baseline.py``
which is absent from its repo; this is a working equivalent wired to the
reference's published baseline targets (docs/baseline_verification_guide.md:
time/frame <= 2.0 s; the reference itself measured 9.82 s/frame and FAILED).

Runs the pipeline (unless ``--session`` points at an existing session), reads
``summary.json``, derives per-phase and per-frame wall times, checks them
against the targets, and writes ``baseline_<tag>.json`` into the output dir.

Usage:
  python tools/run_baseline.py --config config.yaml [--tag mytag]
  python tools/run_baseline.py --session output/<session_id> [--tag mytag]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TIME_PER_FRAME_TARGET_S = 2.0  # reference docs/baseline_verification_guide.md:100


def evaluate_session(session_dir: Path) -> dict:
    """summary.json -> baseline report dict (pure; testable)."""
    summary = json.loads((session_dir / "summary.json").read_text())
    stats = summary.get("statistics", {})
    perf = summary.get("performance", {})

    frames = int(stats.get("frames_processed") or stats.get("frames_extracted") or 0)
    phase_times = {name: float(p.get("total_time", 0.0)) for name, p in perf.items()}
    total_time = sum(phase_times.values())
    time_per_frame = total_time / frames if frames else None

    checks = {
        "time_per_frame_s": {
            "value": time_per_frame,
            "target": TIME_PER_FRAME_TARGET_S,
            "passed": time_per_frame is not None
            and time_per_frame <= TIME_PER_FRAME_TARGET_S,
        },
        "status_completed": {
            "value": summary.get("status"),
            "target": "completed",
            "passed": summary.get("status") == "completed",
        },
    }
    return {
        "session_id": summary.get("session_id", session_dir.name),
        "frames": frames,
        "total_detections": int(stats.get("total_detections", 0)),
        "phase_times_s": phase_times,
        "total_time_s": round(total_time, 3),
        "time_per_frame_s": round(time_per_frame, 3) if time_per_frame else None,
        "checks": checks,
        "passed": all(c["passed"] for c in checks.values()),
    }


def latest_session(output_dir: Path) -> Path | None:
    if not output_dir.is_dir():
        return None
    latest = output_dir / "latest"
    if latest.is_symlink() and latest.exists():
        return latest.resolve()
    sessions = sorted(d for d in output_dir.iterdir() if d.is_dir() and d.name[0].isdigit())
    return sessions[-1] if sessions else None


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=Path, default=Path("config.yaml"))
    parser.add_argument("--session", type=Path, default=None,
                        help="evaluate an existing session instead of running")
    parser.add_argument("--tag", default="baseline")
    parser.add_argument("--output-dir", type=Path, default=None,
                        help="defaults to the config's output.directory")
    args = parser.parse_args(argv)

    if args.output_dir is None:
        out_dir = Path("output")
        try:
            import yaml

            cfg = yaml.safe_load(args.config.read_text()) or {}
            out_dir = Path((cfg.get("output") or {}).get("directory", "output"))
        except OSError:
            pass
        args.output_dir = out_dir

    if args.session is None:
        proc = subprocess.run(
            [sys.executable, "main.py", "--config", str(args.config)],
            cwd=Path(__file__).resolve().parents[1],
        )
        if proc.returncode != 0:
            print(f"pipeline run failed (exit {proc.returncode})")
            return proc.returncode
        session = latest_session(args.output_dir)
        if session is None:
            print("no session produced")
            return 1
    else:
        session = args.session

    report = evaluate_session(session)
    out = args.output_dir / "baseline" / f"baseline_{args.tag}.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2), encoding="utf-8")

    print(f"session          : {report['session_id']}")
    print(f"frames           : {report['frames']}")
    print(f"total time       : {report['total_time_s']} s")
    print(f"time per frame   : {report['time_per_frame_s']} s "
          f"(target <= {TIME_PER_FRAME_TARGET_S})")
    for name, check in report["checks"].items():
        print(f"  [{'PASS' if check['passed'] else 'FAIL'}] {name}")
    print(f"report -> {out}")
    return 0 if report["passed"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
