"""cocrawler_spark — a PySpark-native URL-frontier + fetch-scheduler analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference crawler (racerthunder/cocrawler — an asyncio Python crawler;
see SURVEY.md §0 for the provenance caveat: the reference tree was empty
at survey time, so semantics are anchored by the in-repo oracle simulator
in :mod:`cocrawler_spark.oracle`).

Layout
------
- ``functions/``  pure + vectorized scalar functions (URL canon, SURT,
  robots matching, span parsing, text analysis, vector math, hashing).
  Pure-Python cores are shared between the oracle simulator and the
  Arrow/pandas UDFs so span-sequence equality holds by construction and
  is then independently pinned by hand-written golden tests.
- ``operators/``  relational/set operators (seen-dedup anti-join, bloom
  prefilter, politeness windows, global ordering, near-dup families,
  similarity search).
- ``sources/``    seed list reader, interleaved-corpus reader, the
  iceberg-style snapshot catalog, multimodal binary-column plumbing.
- ``plans/``      the crawl dataflow: wave plan, run loop, metrics.
- ``streaming/``  structured-streaming seam (applyInPandasWithState).
- ``oracle/``     pure-Python single-threaded reference simulator — the
  correctness oracle for crawl order / seen set / metrics equality.
"""

__version__ = "0.1.0"
