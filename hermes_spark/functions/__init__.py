"""Scalar/vector function library: text analysis, dedup, similarity.

These extend the engine beyond the reference's operator set with the
operations a large-scale training-data pipeline needs (dedup, ANN,
text quality, fingerprinting).  The reference's extension point for
scalar logic is Jinja filter plugins
(/root/reference/lib/plugins.py:34-53); ours is plain Column
expressions (JVM, codegen) with Arrow/pandas UDFs only where bit-level
math can't be expressed (simhash, rolling hash).
"""
