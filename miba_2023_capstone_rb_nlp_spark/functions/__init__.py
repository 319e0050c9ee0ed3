"""Scalar/array function library (all JVM-side column expressions
unless explicitly noted — UDFs are the slow path)."""
