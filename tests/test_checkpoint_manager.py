"""CheckpointManager depth tests (reference tests/test_checkpoint_manager.py
analog, 27 tests there): resume queries, corrupt-file recovery, schema
validation, ordering semantics."""

import json
from pathlib import Path

import jsonschema
import pytest

from office_person_detection_vit_tpu.utils.checkpoint_manager import (
    PHASE_ORDER,
    CheckpointManager,
)

SCHEMA = json.loads(
    (Path(__file__).resolve().parents[1] / "schemas" / "pipeline_checkpoint.schema.json").read_text()
)


class TestPersistence:
    def test_file_created_on_save(self, tmp_path):
        cm = CheckpointManager(tmp_path)
        cm.save_phase("01_extraction")
        assert (tmp_path / "pipeline_checkpoint.json").exists()

    def test_file_validates_against_schema(self, tmp_path):
        cm = CheckpointManager(tmp_path)
        cm.save_phase("01_extraction", data={"frames": 3})
        cm.save_phase("02_detection", status="in_progress")
        doc = json.loads((tmp_path / "pipeline_checkpoint.json").read_text())
        jsonschema.validate(doc, SCHEMA)

    def test_corrupt_file_recovers_fresh(self, tmp_path):
        (tmp_path / "pipeline_checkpoint.json").write_text("{not json")
        cm = CheckpointManager(tmp_path)  # warning, not crash
        assert cm.get_last_completed_phase() is None
        cm.save_phase("01_extraction")
        assert CheckpointManager(tmp_path).is_completed("01_extraction")

    def test_last_updated_and_last_phase(self, tmp_path):
        cm = CheckpointManager(tmp_path)
        cm.save_phase("01_extraction")
        doc = json.loads((tmp_path / "pipeline_checkpoint.json").read_text())
        assert doc["last_phase"] == "01_extraction"
        assert doc["last_updated"] is not None


class TestQueries:
    def test_phase_status_and_data(self, tmp_path):
        cm = CheckpointManager(tmp_path)
        cm.save_phase("02_detection", data={"detections": 42})
        assert cm.get_phase_status("02_detection") == "completed"
        assert cm.get_phase_data("02_detection") == {"detections": 42}
        assert cm.get_phase_status("03_tracking") is None
        assert cm.get_phase_data("03_tracking") == {}

    def test_last_completed_follows_canonical_order(self, tmp_path):
        cm = CheckpointManager(tmp_path)
        # saved out of order: later phase first
        cm.save_phase("04_transform")
        cm.save_phase("01_extraction")
        assert cm.get_last_completed_phase() == "04_transform"

    def test_resumable_is_first_incomplete(self, tmp_path):
        cm = CheckpointManager(tmp_path)
        cm.save_phase("01_extraction")
        cm.save_phase("02_detection")
        assert cm.get_resumable_phase() == "03_tracking"

    def test_resumable_skips_failed_back_to_it(self, tmp_path):
        cm = CheckpointManager(tmp_path)
        cm.save_phase("01_extraction")
        cm.save_phase("02_detection", status="failed")
        assert cm.get_resumable_phase() == "02_detection"

    def test_all_phases_complete(self, tmp_path):
        cm = CheckpointManager(tmp_path)
        for phase in PHASE_ORDER:
            cm.save_phase(phase)
        assert cm.get_last_completed_phase() == "06_visualization"
        assert cm.get_resumable_phase() is None

    def test_in_progress_not_completed(self, tmp_path):
        cm = CheckpointManager(tmp_path)
        cm.save_phase("01_extraction", status="in_progress")
        assert not cm.is_completed("01_extraction")
        assert cm.get_resumable_phase() == "01_extraction"

    def test_status_overwrite(self, tmp_path):
        cm = CheckpointManager(tmp_path)
        cm.save_phase("01_extraction", status="in_progress")
        cm.save_phase("01_extraction", status="completed")
        assert cm.is_completed("01_extraction")

    def test_summary_contains_all_saved(self, tmp_path):
        cm = CheckpointManager(tmp_path)
        cm.save_phase("01_extraction")
        cm.save_phase("02_detection", status="skipped")
        s = cm.summary()
        text = json.dumps(s)
        assert "01_extraction" in text and "02_detection" in text
