"""SessionDataLoader depth tests (dashboard backend; reference
dashboard_utils.py:30-221 analog): artifact readers, corrupt-file handling,
session listing rules, image globbing, zone-count parsing."""

import json

import pytest

from office_person_detection_vit_tpu.visualization.dashboard_utils import (
    SessionDataLoader,
)


def _session(tmp_path, name="20250120_090000"):
    d = tmp_path / name
    for sub in ("01_extraction", "02_detection", "05_aggregation"):
        (d / sub).mkdir(parents=True)
    (d / "metadata.json").write_text(json.dumps({"session_id": name}))
    (d / "summary.json").write_text(json.dumps({"status": "completed"}))
    (d / "pipeline_checkpoint.json").write_text(
        json.dumps(
            {"phases": {"01_extraction": {"status": "completed"},
                        "02_detection": {"status": "failed"}}}
        )
    )
    (d / "01_extraction" / "extraction_results.csv").write_text(
        "frame_number,timestamp,frame_path\n100,2025-01-20 09:00:00,f.jpg\n"
    )
    (d / "05_aggregation" / "zone_counts.csv").write_text(
        "timestamp,zone_a,zone_b,total\n09:00,1,2,3\n09:05,0,1,1\n"
    )
    return d


class TestListSessions:
    def test_lists_only_sessions_with_metadata(self, tmp_path):
        _session(tmp_path, "20250120_090000")
        _session(tmp_path, "20250121_090000")
        (tmp_path / "random_dir").mkdir()
        sessions = SessionDataLoader.list_sessions(tmp_path)
        assert sessions == ["20250121_090000", "20250120_090000"]  # newest first

    def test_symlinks_excluded(self, tmp_path):
        d = _session(tmp_path)
        (tmp_path / "latest").symlink_to(d)
        assert SessionDataLoader.list_sessions(tmp_path) == [d.name]

    def test_missing_base_dir(self, tmp_path):
        assert SessionDataLoader.list_sessions(tmp_path / "nope") == []


class TestArtifacts:
    def test_json_readers(self, tmp_path):
        loader = SessionDataLoader(_session(tmp_path))
        assert loader.metadata()["session_id"] == "20250120_090000"
        assert loader.summary()["status"] == "completed"
        assert loader.tracks() is None  # absent artifact -> None

    def test_corrupt_json_returns_none(self, tmp_path):
        d = _session(tmp_path)
        (d / "summary.json").write_text("{broken")
        assert SessionDataLoader(d).summary() is None

    def test_phase_status(self, tmp_path):
        loader = SessionDataLoader(_session(tmp_path))
        status = loader.phase_status()
        assert status["01_extraction"] == "completed"
        assert status["02_detection"] == "failed"

    def test_phase_status_without_checkpoint(self, tmp_path):
        d = _session(tmp_path)
        (d / "pipeline_checkpoint.json").unlink()
        assert SessionDataLoader(d).phase_status() == {}

    def test_extraction_results_rows(self, tmp_path):
        loader = SessionDataLoader(_session(tmp_path))
        rows = loader.extraction_results()
        assert rows[0]["frame_number"] == "100"

    def test_zone_counts_columns(self, tmp_path):
        loader = SessionDataLoader(_session(tmp_path))
        zones, rows = loader.zone_counts()
        assert zones == ["zone_a", "zone_b", "total"]
        assert rows[0]["zone_a"] == "1" and len(rows) == 2

    def test_zone_counts_missing(self, tmp_path):
        d = _session(tmp_path)
        (d / "05_aggregation" / "zone_counts.csv").unlink()
        assert SessionDataLoader(d).zone_counts() == ([], [])


class TestImages:
    def test_globs_sorted_with_limit(self, tmp_path):
        d = _session(tmp_path)
        for i in range(4):
            (d / "02_detection" / f"detection_{i}.jpg").write_bytes(b"x")
        (d / "02_detection" / "notes.txt").write_bytes(b"x")
        loader = SessionDataLoader(d)
        imgs = loader.images("02_detection")
        assert len(imgs) == 4
        assert [p.name for p in loader.images("02_detection", limit=2)] == [
            "detection_0.jpg", "detection_1.jpg",
        ]

    def test_missing_phase_dir(self, tmp_path):
        assert SessionDataLoader(_session(tmp_path)).images("06_visualization") == []


class TestFloorTrajectories:
    def test_from_transform_artifact(self, tmp_path):
        d = _session(tmp_path)
        (d / "04_transform").mkdir()
        doc = {
            "frames": [
                {"frame_number": 0, "detections": [
                    {"track_id": 1, "floor_coords_px": {"x": 10.0, "y": 20.0}},
                    {"floor_coords_px": {"x": 1.0, "y": 1.0}},  # untracked
                ]},
                {"frame_number": 1, "detections": [
                    {"track_id": 1, "floor_coords_px": {"x": 12.0, "y": 22.0}}
                ]},
            ]
        }
        (d / "04_transform" / "coordinate_transformations.json").write_text(
            json.dumps(doc)
        )
        traj = SessionDataLoader(d).floor_trajectories()
        assert traj == {1: [(10.0, 20.0), (12.0, 22.0)]}

    def test_compact_artifact_keys(self, tmp_path):
        d = _session(tmp_path)
        (d / "04_transform").mkdir()
        doc = {"frames": [{"idx": 0, "det": [{"id": 2, "floor_px": [5.0, 6.0]}]}]}
        (d / "04_transform" / "coordinate_transformations.json").write_text(
            json.dumps(doc)
        )
        assert SessionDataLoader(d).floor_trajectories() == {2: [(5.0, 6.0)]}

    def test_no_artifacts_no_config_empty(self, tmp_path):
        assert SessionDataLoader(_session(tmp_path)).floor_trajectories() == {}


class TestTrainingRunsView:
    """Dashboard training tab helpers: list runs, load history, KPI
    summary (tools/train_detr.py history.json contract)."""

    def _run(self, base, name, evals=True, **cfg):
        import json

        d = base / name
        d.mkdir(parents=True)
        h = {
            "step_losses": [9.0, 8.0, 7.0, 6.5],
            "epoch_losses": [8.5, 6.75],
            "config": {"schedule": "cosine", "warmup_steps": 2,
                       "accum_steps": 1, "ema": 0.99, "augment": True,
                       **cfg},
        }
        if evals:
            h["evals"] = [
                {"epoch": 0, "f1_score": 0.0, "map_50_95": 0.0},
                {"epoch": 2, "f1_score": 0.8, "map_50_95": 0.4},
            ]
        (d / "history.json").write_text(json.dumps(h))
        return d

    def test_list_and_summary(self, tmp_path):
        from office_person_detection_vit_tpu.visualization.dashboard_utils import (
            list_training_runs,
            load_training_history,
            training_summary,
        )

        self._run(tmp_path, "run_a")
        self._run(tmp_path, "run_b", evals=False)
        (tmp_path / "not_a_run").mkdir()
        runs = list_training_runs(tmp_path)
        assert set(runs) == {"run_a", "run_b"}

        h = load_training_history(tmp_path / "run_a")
        s = training_summary(h)
        assert s["steps"] == 4 and s["epochs"] == 2
        assert s["last_loss"] == 6.75 and s["best_loss"] == 6.75
        assert s["best_f1"] == 0.8 and s["best_map"] == 0.4
        # Recipe KPIs include only the non-default knobs.
        assert s["recipe"]["schedule"] == "cosine"
        assert s["recipe"]["ema"] == 0.99
        assert s["recipe"]["augment"] is True  # True == 1 must NOT filter
        assert "accum_steps" not in s["recipe"]  # default 1 filtered

        s2 = training_summary(load_training_history(tmp_path / "run_b"))
        assert "best_f1" not in s2

    def test_unreadable_history_is_none(self, tmp_path):
        from office_person_detection_vit_tpu.visualization.dashboard_utils import (
            list_training_runs,
            load_training_history,
        )

        assert list_training_runs(tmp_path / "missing") == []
        d = tmp_path / "bad"
        d.mkdir()
        (d / "history.json").write_text("{not json")
        assert load_training_history(d) is None
