"""Training-data pipeline functions: dedup, similarity search, text
analysis, multimodal plumbing — the operations a 100 TB pretraining-data
pipeline needs on top of the link-graph operators. All built Spark-first:
JVM expressions where possible, Arrow-batched pandas UDFs where not.
"""
