"""Engine operators: CRM export pipelines (SURVEY §2) and the [EXT]
scale tier — dedup, similarity search, text analysis, multimodal
plumbing (SURVEY §2.10)."""
