"""Pure-Python deterministic kernels (no Spark imports).

These are the byte-parity anchors: each function reproduces the observable
behaviour of a deterministic component of the reference pipeline and is unit
tested directly against the reference implementation where importable
(see tests/parity/).  They are invoked from Arrow-batched pandas UDFs in
``docling_graph_spark.operators``.
"""
