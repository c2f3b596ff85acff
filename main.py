"""Entry point (reference main.py:20-136).

argparse -> config -> logging -> orchestrate 5 phases -> optional evaluation
-> summary. Exit codes: 0 ok, 1 config error, 2 runtime error, 130 SIGINT
(reference main.py:120-131).
"""

from __future__ import annotations

import logging
import sys

from office_person_detection_vit_tpu.cli.arguments import parse_arguments
from office_person_detection_vit_tpu.config.config_manager import (
    ConfigManager,
    ConfigValidationError,
)
from office_person_detection_vit_tpu.pipeline.orchestrator import PipelineOrchestrator
from office_person_detection_vit_tpu.utils.logging_utils import setup_logging

logger = logging.getLogger(__name__)


def main(argv: list[str] | None = None) -> int:
    from office_person_detection_vit_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    args = parse_arguments(argv)
    setup_logging(debug=args.debug)
    orchestrator = None
    try:
        config = ConfigManager(args.config)
        config.validate()
        if args.debug:
            config.set("output.debug_mode", True)
        # Re-point the file log into the output dir (reference main.py:53-55).
        setup_logging(debug=args.debug, output_dir=config.get("output.directory", "output"))

        # Multi-host (DCN) bring-up before any jax backend use (SURVEY.md
        # §5.8): on a pod slice each process calls jax.distributed.initialize
        # so jax.devices() spans the slice; single-host runs skip this.
        if config.get("parallel.distributed.enabled", False):
            from office_person_detection_vit_tpu.parallel.mesh import (
                initialize_distributed,
            )

            initialize_distributed(
                coordinator_address=config.get(
                    "parallel.distributed.coordinator_address", None
                ),
                num_processes=config.get("parallel.distributed.num_processes", None),
                process_id=config.get("parallel.distributed.process_id", None),
            )

        if args.fine_tune:
            # Detector fine-tuning (reference --fine-tune path, main.py:20-136;
            # training config under training.* keys).
            from tools.train_detr import main as train_main

            train_args = [
                "--images", str(config.get("training.images_dir", "data/train/images")),
                "--annotations", str(config.get("training.annotations", "data/train/coco.json")),
                "--epochs", str(config.get("training.epochs", 10)),
                "--batch", str(config.get("training.batch_size", 8)),
                "--checkpoint", str(config.get("training.output_dir", "runs/detr_ft")),
                "--height", str(config.get("training.input_height", 768)),
                "--width", str(config.get("training.input_width", 1344)),
                "--lr", str(config.get("training.learning_rate", 1e-4)),
                "--model", str(config.get("training.model", "detr")),
                "--model-parallel", str(config.get("training.model_parallel", 1)),
            ]
            if config.get("training.model", "detr") == "yolo":
                train_args += [
                    "--yolo-variant", str(config.get("training.yolo_variant", "s")),
                ]
            if config.get("training.tiny", False):
                train_args += ["--tiny"]
            if config.get("training.remat", False):
                train_args += ["--remat"]
            # Recipe knobs (docs/training.md "Recipe knobs"): LR schedule,
            # accumulation, EMA weights, fused on-device augmentation.
            # A present-but-null YAML key means "default" (config.get only
            # falls back for MISSING keys).
            schedule = config.get("training.schedule", None)
            if schedule and schedule != "none":
                train_args += ["--schedule", str(schedule)]
                drop_at = config.get("training.drop_at", None)
                if drop_at is not None:
                    train_args += ["--drop-at", str(drop_at)]
            warmup = int(config.get("training.warmup_steps", 0) or 0)
            if warmup > 0:  # warmed-up constant LR is valid without schedule
                train_args += ["--warmup-steps", str(warmup)]
            accum = int(config.get("training.accum_steps", 1) or 1)
            if accum > 1:
                train_args += ["--accum-steps", str(accum)]
            ema = float(config.get("training.ema", 0.0) or 0.0)
            if ema > 0:
                train_args += ["--ema", str(ema)]
            if config.get("training.augment", False):
                train_args += ["--augment"]
            init = config.get("detection.checkpoint_path", None)
            if init:
                train_args += ["--init", str(init)]
            if config.get("training.evaluate", False):
                train_args += [
                    "--evaluate",
                    "--eval-every", str(config.get("training.eval_every", 0)),
                    "--eval-conf", str(
                        config.get("training.eval_confidence", 0.25)
                    ),
                ]
                val_images = config.get("training.val_images_dir", None)
                val_ann = config.get("training.val_annotations", None)
                if val_images:
                    train_args += ["--val-images", str(val_images)]
                if val_ann:
                    train_args += ["--val-annotations", str(val_ann)]
            return train_main(train_args)

        orchestrator = PipelineOrchestrator(config, logging.getLogger("pipeline"))
        start, end = orchestrator.parse_datetime_range(args.start_time, args.end_time)

        result = orchestrator.run(
            start_time=start,
            end_time=end,
            resume_session=args.resume,
            timestamps_only=args.timestamps_only,
        )
        logger.info("pipeline finished: %s", result)

        if args.evaluate:
            from office_person_detection_vit_tpu.evaluation.evaluation_module import (
                run_evaluation,
            )

            run_evaluation(config, orchestrator.frame_results,
                           orchestrator.output.session_dir)
        return 0
    except (ConfigValidationError, FileNotFoundError) as e:
        logger.error("configuration error: %s", e)
        return 1
    except KeyboardInterrupt:
        logger.warning("interrupted")
        if orchestrator is not None:
            try:
                orchestrator.save_session_summary(status="cancelled")
            except Exception:
                pass  # interrupted before the session existed
        return 130
    except Exception:
        logger.exception("pipeline failed")
        if orchestrator is not None:
            try:
                orchestrator.save_session_summary(status="failed")
            except Exception:
                pass
        return 2
    finally:
        if orchestrator is not None:
            orchestrator.cleanup()


if __name__ == "__main__":
    sys.exit(main())
