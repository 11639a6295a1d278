"""metal_history_knowledge_graph_spark — a from-scratch, PySpark-native
knowledge-graph construction engine with the query and data-processing
capabilities of mikkelkrogsholm/Metal-History-Knowledge-Graph.

Architecture (Spark-first, NOT a port — see /root/repo/SURVEY.md):

    pages (url, warc_ts, html, text, lang)
      → operators.chunk        mapInPandas chunker   (narrow)
      → operators.extract      gazetteer+pattern NER (narrow, Arrow-batched)
      → operators.canonicalize pre-agg → MinHash-LSH → connected components
                               → ordered merge       (the only shuffles)
      → operators.triples      inference + broadcast id-resolution + whitelist
      → operators.materialize  entity/edge tables + lineage checkpoints

    plans.queries              the reference's 30-query read catalog
    operators.{dedup,simsearch,textstats,multimodal}
                               training-data-pipeline operators

Everything is DataFrame/SQL; Python only ever runs inside Arrow-batched
pandas UDFs (no per-row Python).
"""

__version__ = "0.1.0"
