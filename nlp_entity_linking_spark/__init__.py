"""PySpark-native entity-resolution / record-linkage engine.

A from-scratch, Spark-first re-expression of the capability set of
``ninikolov/NLP_Entity_linking`` (see SURVEY.md; the reference checkout at
/root/reference is empty, so BASELINE.json's north_rule is the binding spec):
blocking (minhash-LSH + sorted-neighborhood with hot-key salting), pairwise
scoring (Jaro-Winkler, token-set Levenshtein, TF-IDF cosine -> calibrated
logistic score) inside Arrow-batched pandas UDFs, and transitive clustering
via iterative large-star/small-star connected components with checkpointed
iterations — plus the training-data-pipeline operators (dedup families,
ANN similarity search, text analysis, multimodal plumbing).

Everything here is DataFrame-first: logical plans are declared with the
pyspark.sql API and Catalyst/AQE pick the physical strategy. Python only
crosses the JVM boundary through vectorized Arrow batches (pandas UDFs /
mapInPandas) — never row-at-a-time ``F.udf``.
"""

__version__ = "0.1.0"
