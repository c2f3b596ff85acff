"""Zone classification facade (reference src/zone/zone_classifier.py:44-243).

The implementation lives in ops/zones.py (vectorized jitted ray-cast);
re-exported here to keep the reference's module layout.
"""

from ..ops.zones import PackedZones, ZoneClassifier, classify_priority, points_in_zones

__all__ = ["PackedZones", "ZoneClassifier", "classify_priority", "points_in_zones"]
