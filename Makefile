# Developer targets (reference Makefile parity where meaningful).

PYTHON ?= python

.PHONY: help run test test-fast test-cov lint format format-check ci bench bench-e2e serve dashboard benchmark-detection benchmark-tracking benchmark-tracking-sparse gt-prepare gt-from-cvat coco-to-cvat cvat-to-mot validate-annotation baseline mot-evaluate deps-check parity dryrun dryrun-multihost clean

help:  ## list targets
	@grep -E '^[a-z-]+:' Makefile | cut -d: -f1 | sort


run:
	$(PYTHON) main.py --config config.yaml

test:
	$(PYTHON) -m pytest tests/ -q

test-fast:
	$(PYTHON) -m pytest tests/ -q -m "not slow"

test-cov:
	$(PYTHON) -m pytest tests/ -q --cov=office_person_detection_vit_tpu --cov-report=term 2>/dev/null || \
	$(PYTHON) -m pytest tests/ -q  # pytest-cov not installed

format:
	$(PYTHON) -m ruff format office_person_detection_vit_tpu tests tools && \
	$(PYTHON) -m ruff check office_person_detection_vit_tpu tests tools --fix

format-check:
	$(PYTHON) -m ruff format --check office_person_detection_vit_tpu tests tools

ci: lint test

lint:
	$(PYTHON) -m ruff check office_person_detection_vit_tpu tests tools 2>/dev/null || \
	$(PYTHON) -m py_compile main.py bench.py __graft_entry__.py

bench:
	$(PYTHON) bench.py

bench-e2e:
	$(PYTHON) tools/bench_e2e.py --full-model

serve:
	$(PYTHON) tools/serve.py --port 8500

export:  ## portable StableHLO artifact of the detect program (+ weights)
	$(PYTHON) tools/export_stablehlo.py --output runs/detect.stablehlo \
		--weights-out runs/detect_weights.npz --validate

serve-artifact:  ## serve from the exported artifact (model-free bring-up)
	$(PYTHON) tools/serve.py --artifact runs/detect.stablehlo \
		--weights runs/detect_weights.npz --port 8500

dashboard:
	streamlit run office_person_detection_vit_tpu/visualization/dashboard_app.py

# Prediction inputs are pipeline artifacts (reference Makefile:160-189).
GT ?= output/ground_truth/gt_tracking.json
PRED ?= output/latest/03_tracking/tracks_mot.csv
DET_GT ?= output/ground_truth/detections_gt.json
DET_PRED ?= output/latest/04_transform/coordinate_transformations.json

benchmark-tracking:
	$(PYTHON) -m office_person_detection_vit_tpu.benchmark --gt $(GT) --pred $(PRED)

benchmark-tracking-sparse:
	$(PYTHON) -m office_person_detection_vit_tpu.benchmark --gt $(GT) --pred $(PRED) --sparse

benchmark-detection:
	$(PYTHON) -m office_person_detection_vit_tpu.benchmark.detection_runner --gt $(DET_GT) --pred $(DET_PRED)

# GT bootstrap: pipeline output -> editable gold GT (+ CVAT-importable MOT CSV)
# (reference Makefile gt-prepare / gt-from-cvat / mot-evaluate).
GT_DIR ?= output/ground_truth
CVAT_CSV ?= $(GT_DIR)/cvat_export.csv

gt-prepare:
	$(PYTHON) tools/convert_gt.py transforms-to-gold \
	  --input output/latest/04_transform/coordinate_transformations.json \
	  --output $(GT_DIR)/gt_tracking.json --mot-output $(GT_DIR)/gt_tracking.csv

gt-from-cvat:
	$(PYTHON) tools/convert_gt.py mot-to-gold --input $(CVAT_CSV) --output $(GT_DIR)/gt_tracking.json

# CVAT interchange (reference Makefile coco-to-cvat / cvat-to-mot — the
# reference advertises these but ships no implementation; ours works).
CVAT_XML_INPUT ?= $(GT_DIR)/cvat_tracks.xml
CVAT_XML_OUTPUT ?= $(GT_DIR)/cvat_export.xml
MOT_GT_CSV ?= $(GT_DIR)/gt_tracking.csv
ANNOTATION ?= output/labels/result_fixed.json
ANNOTATION_IMAGES ?= data/annotation_images

coco-to-cvat:
	$(PYTHON) tools/cvat_tools.py coco-to-cvat --input $(ANNOTATION) \
	  --images $(ANNOTATION_IMAGES) --output $(CVAT_XML_INPUT)

cvat-to-mot:
	$(PYTHON) tools/cvat_tools.py cvat-to-mot --input $(CVAT_XML_OUTPUT) --output $(MOT_GT_CSV)

validate-annotation:
	$(PYTHON) tools/validate_annotation_integrity.py --annotation $(ANNOTATION) \
	  --images $(ANNOTATION_IMAGES) --format coco

# Baseline run + verification vs the reference's targets (time/frame <= 2.0 s).
baseline:
	$(PYTHON) tools/run_baseline.py --config config.yaml $(if $(TAG),--tag $(TAG))

mot-evaluate:
	$(PYTHON) -m office_person_detection_vit_tpu.benchmark --gt $(GT) --pred $(PRED) --report $(GT_DIR)/evaluation

deps-check:
	$(PYTHON) tools/check_dependencies.py

# Drop-in parity vs the reference's committed artifacts (skipped when the
# upstream checkout is absent) — see BASELINE.md "metric parity".
parity:
	$(PYTHON) -m pytest tests/test_reference_parity.py -v

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
	$(PYTHON) -c "import jax; jax.config.update('jax_platforms','cpu'); from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"

# Real 2-process DCN group over localhost (SURVEY.md §5.8): two OS
# processes x 4 virtual CPU devices, TP intra-process, DP across the
# process boundary; asserts loss parity vs a single-process 8-device run.
dryrun-multihost:
	$(PYTHON) tools/dcn_dryrun.py

# Native host-staging library (ctypes; auto-built on first import too).
native:
	g++ -O3 -shared -fPIC -pthread -std=c++17 \
	office_person_detection_vit_tpu/native/staging.cpp \
	-o office_person_detection_vit_tpu/native/_staging.so

clean:
	rm -rf output/2* output/latest __pycache__ .pytest_cache
