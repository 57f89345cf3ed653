"""fastie_ray — a Ray-Data-native knowledge-graph-construction engine.

Re-realizes the extraction semantics of xusenlinzy/FastIE (surveyed in
/root/repo/SURVEY.md) as streaming ``ray.data.Dataset`` pipelines:
stateless ``map_batches`` for parsing/chunking, actor pools for the
stateful scorer stages, explicit groupby/sort shuffles for the wide
steps, and partitioned, manifest-tracked Parquet output for resume.

Nothing in this package calls ``ray.init`` — sessions are owned by the
caller (tests, bench.py, or the driver).
"""

__version__ = "0.1.0"
