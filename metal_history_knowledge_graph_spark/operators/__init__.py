"""Operators: the KG-construction stages (chunk → extract →
canonicalize → triples → materialize) plus the training-data-pipeline
operator family (dedup, simsearch, textstats, multimodal, graph
algorithms)."""
