"""office_person_detection_vit_tpu — TPU-native office person-detection analytics.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference system
Kizuna42/office-person-detection-vit (see SURVEY.md): a batch video-analytics
pipeline that OCRs burned-in timestamps, detects people with a DETR
(ResNet-50 + transformer encoder/decoder) detector, tracks identities,
projects detections onto a floormap via homography / piecewise-affine
transforms, classifies floor points into zones, aggregates per-zone counts
over time, and renders visualizations.

Design stance (SURVEY.md §7.1): arrays over objects, batches over loops, one
jitted program per phase, host code only at the I/O edges. The compute path is
jax.numpy / Pallas; parallelism is jax.sharding over a device mesh.
"""

__version__ = "0.1.0"
