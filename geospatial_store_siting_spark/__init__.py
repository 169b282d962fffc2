"""geospatial_store_siting_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch engine with the query/data-processing capabilities of the
reference repo ``kevin-ippen/geospatial-store-siting`` (a Databricks QSR
store-siting accelerator), re-expressed Spark-first:

- from-scratch hex tile index (axial hex lattice, 3 resolutions, k-ring)
  as closed-form arithmetic — vectorized numpy kernels AND dialect-neutral
  SQL so tile assignments are bit-reproducible in any ANSI engine
- feature engineering (k-ring neighborhood aggregation, blocked distance
  joins, Huff gravity model) as pure DataFrame transforms
- candidate scoring (percentile rank + tier assignment)
- training-data-pipeline operators: dedup (exact/minhash/simhash/ngram),
  ANN similarity search, text quality/lang-id/token stats, multimodal
  binary-column plumbing
- interleaved text+media document model (doc_id, spans[]) with the
  span-sequence-equality invariant preserved through extraction

All heavy lifting is JVM-side Catalyst expressions; Python appears only in
vectorized Arrow batches (pandas UDFs / mapInPandas), never per-row.
"""

__version__ = "0.1.0"
