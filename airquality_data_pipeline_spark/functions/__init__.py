"""Scalar function library (SURVEY.md §2.6 C1-C10), all built-in
pyspark.sql.functions compositions — JVM-side, codegen-friendly."""
