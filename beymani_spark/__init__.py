"""beymani_spark — a PySpark-native anomaly/outlier-detection analytics engine.

A ground-up DataFrame-first rebuild of the capabilities of pranab/beymani
(reference surveyed in SURVEY.md). Operators are declarative DataFrame
transformations so Catalyst/AQE pick physical strategies (broadcast joins for
model tables, sort-based windows for sequences, partial aggregation). Python
UDFs appear only where semantics genuinely require per-key imperative scans,
and then always as Arrow-batched ``applyInPandas``.

Layout:
    sources/    readers/writers for the test tables and user data
    functions/  column-expression helpers (seasonal cycles, scaling, text)
    operators/  the operator library (profile builders, detectors, post ops)
    plans/      pipeline composition helpers + Detector protocol
    streaming/  Structured Streaming counterparts + drift detectors
"""

__version__ = "0.1.0"
