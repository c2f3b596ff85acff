# Developer targets (reference Makefile parity where meaningful).

PYTHON ?= python

.PHONY: run test test-fast lint bench dashboard benchmark-detection benchmark-tracking benchmark-tracking-sparse dryrun clean

run:
	$(PYTHON) main.py --config config.yaml

test:
	$(PYTHON) -m pytest tests/ -q

test-fast:
	$(PYTHON) -m pytest tests/ -q -m "not slow"

lint:
	$(PYTHON) -m ruff check office_person_detection_vit_tpu tests tools 2>/dev/null || \
	$(PYTHON) -m py_compile main.py bench.py __graft_entry__.py

bench:
	$(PYTHON) bench.py

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

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
	$(PYTHON) -c "import jax; jax.config.update('jax_platforms','cpu'); from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"

clean:
	rm -rf output/2* output/latest __pycache__ .pytest_cache
