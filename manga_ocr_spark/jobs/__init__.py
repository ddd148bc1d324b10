"""Spark jobs: session config, the extraction job, lineage/resume."""
