"""PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the capabilities of the reference repo
``zulushakaka/named-entity-discovery-and-linking`` (CMU OPERA / DARPA AIDA
entity discovery + linking) as pure DataFrame transformations:

- ``sources``   : pages / KB / gazetteer / ontology readers (SURVEY.md §2.1)
- ``functions`` : scalar + vectorized column functions (§2.7, hashing, text)
- ``operators`` : mention discovery, candidate generation, link scoring,
                  canonicalization, dedup/similarity/text-stats (§2.2-2.6, §2.10)
- ``plans``     : end-to-end pipelines E1/E2/E3 (§3) + lineage/resume (§4)
- ``streaming`` : Structured Streaming variants (reference has none; §2.9)
- ``fixtures``  : deterministic synthetic corpora (FIXTURES.md)

Everything here derives from public knowledge only (Apache Spark APIs and the
reference repo's observable behavior, cited file:line in docstrings).
"""

__version__ = "0.1.0"
