"""lucene_spark: a PySpark-native full-text index + BM25 search engine.

A regular (non-namespace) package on purpose: zipimport — the
``spark-submit --py-files lucene_spark.zip`` deployment path — does not
resolve implicit namespace packages, so this file must exist for the
driver and executors to import the library from the shipped zip.
"""
