"""Ray Data pipelines: ingest -> spatial join -> kNN -> tiling, with
per-partition lineage manifest + resume (SURVEY.md §3.2, §4.3)."""
