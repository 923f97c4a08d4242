from mapreduce_golang_spark.plans.mapreduce import run_job

__all__ = ["run_job"]
