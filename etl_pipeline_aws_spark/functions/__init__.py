"""Scalar-function helpers shared by operators (SURVEY.md §2.B)."""

from etl_pipeline_aws_spark.functions.numeric import dec, dsum, davg, dmul

__all__ = ["dec", "dsum", "davg", "dmul"]
