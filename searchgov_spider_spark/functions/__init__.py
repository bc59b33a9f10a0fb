"""Scalar function layer: pure-Python parity functions + Spark Column builders.

Every function exists in (up to) two forms:
- a pure-Python function (used inside vectorized pandas UDFs and as the
  unit-test oracle), and
- a native ``pyspark.sql.functions`` Column expression (the fast path,
  JVM-side, whole-stage-codegen'd) where exact parity allows.
"""
