"""Scalar/column function library: dissect, grok, conditions, fmtstr,
text statistics, hashing, vector math. Everything here returns either
``pyspark.sql.Column`` expressions (JVM fast path) or Arrow-vectorized
pandas UDFs (sanctioned slow path)."""
