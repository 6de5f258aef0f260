"""[EXT] scale-tier queries (SURVEY §2.10): dedup, similarity search,
text analysis, event windows — populated as operators land."""
