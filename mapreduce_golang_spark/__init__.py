"""mapreduce_golang_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the capabilities of the
reference MapReduce engine (ABE-Mark45/mapreduce-golang, a MIT 6.824
Lab-1 MapReduce in Go — see /root/reference), extended with the
operator library a large-scale (100 TB) LLM-training-data pipeline
needs: dedup, similarity search, text analysis, event analytics,
star-schema joins, multimodal plumbing and streaming.

Design stance (SURVEY.md §7): DataFrame/SQL-first so Catalyst and
Tungsten do the physical planning; the generic MapReduce contract
(`plans.mapreduce.run_job`) is a thin RDD compatibility layer; no
custom Catalyst rules.
"""

from mapreduce_golang_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
