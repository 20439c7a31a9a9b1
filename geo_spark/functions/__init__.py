"""Spark-facing functions: pandas/Arrow UDF kernels + native SQL bit-math."""
