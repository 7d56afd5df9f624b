"""Streaming / continuous surface (reference SURVEY §2.5).

The reference built scaffolding for continuous queries (freq model,
retractable aggregates, MVCC log sections) but never shipped the
incremental planner.  Here the intent is realized two ways:

- ``incremental.py`` — micro-batch Structured Streaming: ``readStream`` →
  ``foreachBatch`` → FreqTable/MV merge (the Spark-native equivalent of the
  reference's planned log-section consumption), plus watermarked windowed
  aggregation in update mode.
- ``sessionize.py`` — gap-based sessionization over the events stream, both
  as a batch window-function query (oracle-checkable) and as a streaming
  ``applyInPandasWithState`` custom stateful operator.
"""
