"""Service-layer tests (reference src/services/* analogs): OutputService,
CheckpointService, PerformanceService facades."""

import json
import time

from office_person_detection_vit_tpu.services.checkpoint_service import (
    CheckpointService,
)
from office_person_detection_vit_tpu.services.output_service import OutputService
from office_person_detection_vit_tpu.services.perf_service import PerformanceService


class TestOutputService:
    def test_setup_creates_session_with_metadata_and_config(self, tmp_path):
        svc = OutputService(base_dir=tmp_path)
        session_dir = svc.setup({"video": {"path": "x.mp4"}})
        assert session_dir.is_dir()
        assert svc.session_dir == session_dir
        assert svc.session_id == session_dir.name
        assert (session_dir / "metadata.json").exists()
        # resolved config persisted for dashboard/editor re-instantiation
        assert (session_dir / "config.yaml").exists()

    def test_phase_dirs_created(self, tmp_path):
        svc = OutputService(base_dir=tmp_path)
        svc.setup({})
        d = svc.get_phase_dir("02_detection")
        assert d.is_dir() and d.name == "02_detection"

    def test_attach_existing_session(self, tmp_path):
        svc = OutputService(base_dir=tmp_path)
        session_dir = svc.setup({})
        svc2 = OutputService(base_dir=tmp_path)
        attached = svc2.attach(session_dir)
        assert attached == session_dir
        assert svc2.session_id == session_dir.name

    def test_save_summary(self, tmp_path):
        svc = OutputService(base_dir=tmp_path)
        svc.setup({})
        p = svc.save_summary({"statistics": {"frames_extracted": 3}})
        assert json.loads(p.read_text())["statistics"]["frames_extracted"] == 3

    def test_explicit_session_id(self, tmp_path):
        svc = OutputService(base_dir=tmp_path)
        session_dir = svc.setup({}, session_id="my_session")
        assert session_dir.name == "my_session"


class TestCheckpointService:
    def test_save_and_query(self, tmp_path):
        svc = CheckpointService(tmp_path)
        svc.save("01_extraction", data={"frames": 5})
        assert svc.is_completed("01_extraction")
        assert not svc.is_completed("02_detection")
        assert svc.phase_data("01_extraction") == {"frames": 5}
        assert svc.last_completed() == "01_extraction"

    def test_resumable_phase_is_next(self, tmp_path):
        svc = CheckpointService(tmp_path)
        svc.save("01_extraction")
        svc.save("02_detection")
        nxt = svc.resumable_phase()
        assert nxt is not None and nxt != "01_extraction"

    def test_failed_status_not_completed(self, tmp_path):
        svc = CheckpointService(tmp_path)
        svc.save("01_extraction", status="failed")
        assert not svc.is_completed("01_extraction")

    def test_summary_lists_phases(self, tmp_path):
        svc = CheckpointService(tmp_path)
        svc.save("01_extraction")
        summary = svc.summary()
        assert "01_extraction" in json.dumps(summary)

    def test_persisted_across_instances(self, tmp_path):
        CheckpointService(tmp_path).save("01_extraction")
        assert CheckpointService(tmp_path).is_completed("01_extraction")


class TestPerformanceService:
    def test_measure_accumulates(self):
        svc = PerformanceService()
        with svc.measure("op"):
            time.sleep(0.01)
        with svc.measure("op"):
            time.sleep(0.01)
        summary = svc.summary()
        assert summary["op"]["count"] == 2
        assert summary["op"]["total_time"] >= 0.02

    def test_context_manager_noop_without_trace_dir(self):
        with PerformanceService() as svc:
            with svc.measure("x"):
                pass
        assert svc.summary()["x"]["count"] == 1

    def test_trace_capture(self, tmp_path):
        # jax profiler trace into a real directory (works on CPU backend)
        with PerformanceService(trace_dir=str(tmp_path / "trace")) as svc:
            with svc.measure("traced"):
                import jax.numpy as jnp

                (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
        assert (tmp_path / "trace").exists()


class TestSessionRetention:
    """Session archiving — declared in the reference's config
    (output.session.archive_days / delete_archive_days) but never
    implemented there; here it works."""

    def _fake_session(self, base, name):
        d = base / name
        d.mkdir(parents=True)
        (d / "metadata.json").write_text("{}")
        return d

    def test_old_sessions_archived(self, tmp_path):
        from office_person_detection_vit_tpu.utils.output_manager import (
            OutputManager,
        )

        om = OutputManager(tmp_path)
        self._fake_session(tmp_path, "20200101_000000")  # ancient
        recent = __import__("datetime").datetime.now().strftime("%Y%m%d_%H%M%S")
        self._fake_session(tmp_path, recent)
        archived, deleted = om.archive_old_sessions(archive_days=30,
                                                    delete_archive_days=10_000)
        assert archived == 1 and deleted == 0
        assert (tmp_path / "archive" / "20200101_000000").is_dir()
        assert (tmp_path / recent).is_dir()  # recent untouched

    def test_ancient_archives_deleted(self, tmp_path):
        from office_person_detection_vit_tpu.utils.output_manager import (
            OutputManager,
        )

        om = OutputManager(tmp_path)
        arch = tmp_path / "archive" / "20190101_000000"
        arch.mkdir(parents=True)
        archived, deleted = om.archive_old_sessions(archive_days=30,
                                                    delete_archive_days=90)
        assert deleted == 1
        assert not arch.exists()

    def test_latest_symlink_target_protected(self, tmp_path):
        from office_person_detection_vit_tpu.utils.output_manager import (
            OutputManager,
        )

        om = OutputManager(tmp_path)
        old = self._fake_session(tmp_path, "20200101_000000")
        (tmp_path / "latest").symlink_to("20200101_000000")
        archived, _ = om.archive_old_sessions(archive_days=30)
        assert archived == 0 and old.is_dir()

    def test_non_session_dirs_ignored(self, tmp_path):
        from office_person_detection_vit_tpu.utils.output_manager import (
            OutputManager,
        )

        om = OutputManager(tmp_path)
        (tmp_path / "ground_truth").mkdir()
        archived, deleted = om.archive_old_sessions()
        assert archived == 0 and deleted == 0
        assert (tmp_path / "ground_truth").is_dir()

    def test_setup_applies_retention(self, tmp_path):
        self._fake_session(tmp_path, "20200101_000000")
        svc = OutputService(base_dir=tmp_path)
        svc.setup({"output": {"session": {"archive_days": 30,
                                          "delete_archive_days": 10_000}}})
        assert (tmp_path / "archive" / "20200101_000000").is_dir()
