"""docling-graph-spark: a PySpark-native document-to-graph extraction engine.

A from-scratch reimplementation of the capabilities of SylvainWT/docling-graph
(reference at /root/reference) re-expressed as set-oriented Spark DataFrame
operators over Common-Crawl-style web-page tables:

    scan(web_pages) -> normalize -> main-content extract (Arrow UDF)
        -> chunk -> batch -> deterministic entity extraction -> merge
        -> nodes/edges assembly -> cleanup -> stats -> sinks

Everything is pyspark.sql DataFrame ops; per-row nested work runs in
Arrow-batched pandas UDFs (never per-row Python UDFs).
"""

__version__ = "0.1.0"
