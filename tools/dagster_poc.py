"""Dagster PoC: wrap the PipelineOrchestrator as one Dagster job (analog of
reference tools/dagster_poc.py:1-66).

Dagster is an optional dependency in the reference and is not installed in
this image, so unlike the reference (which hard-exits on ImportError) the
job body is a plain function that also runs standalone:

  python tools/dagster_poc.py --config config.yaml        # direct run
  POC_CONFIG=config.yaml dagster dev -m tools.dagster_poc  # if dagster exists

Either path executes the same ``run_full_pipeline`` body.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from office_person_detection_vit_tpu.config import ConfigManager  # noqa: E402
from office_person_detection_vit_tpu.pipeline.orchestrator import (  # noqa: E402
    PipelineOrchestrator,
)
from office_person_detection_vit_tpu.utils.logging_utils import setup_logging  # noqa: E402

logger = logging.getLogger("dagster_poc")


def run_full_pipeline(config_path: str) -> str:
    """Full 5-phase pipeline as one op body (reference dagster_poc.py:29-58).

    Returns the generated summary.json path.
    """
    setup_logging(debug=False)
    config = ConfigManager(config_path)
    config.validate()
    orchestrator = PipelineOrchestrator(config, logging.getLogger("pipeline"))
    result = orchestrator.run()
    summary_path = Path(result["session_dir"]) / "summary.json"
    logger.info("summary: %s", summary_path)
    return str(summary_path)


try:  # optional dependency — definitions only exist when dagster is present
    from dagster import Definitions, job, op

    @op(description="Run the full 5-phase pipeline (PoC)")
    def run_full_pipeline_op(context) -> str:
        config_path = os.environ.get("POC_CONFIG", "config.yaml")
        path = run_full_pipeline(config_path)
        context.log.info(f"summary: {path}")
        return path

    @job
    def poc_job():
        run_full_pipeline_op()

    defs = Definitions(jobs=[poc_job])
    HAS_DAGSTER = True
except ImportError:  # pragma: no cover - dagster not in this image
    HAS_DAGSTER = False


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Dagster pipeline PoC")
    parser.add_argument("--config", default=os.environ.get("POC_CONFIG", "config.yaml"))
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    if not HAS_DAGSTER:
        logger.info("dagster not installed — running the job body directly")
    run_full_pipeline(args.config)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
