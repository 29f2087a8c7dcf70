"""Deterministic synthetic fixtures — no external downloads.

The reference ships neither its wiki2vec model nor its sample CSVs
(only ``ontologies/*.json`` per ``MANIFEST.in``), so all inputs here are
seeded synthetic stand-ins with the same shapes.
"""
