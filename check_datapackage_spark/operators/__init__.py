"""Data-plane operators (SURVEY.md §2.8): stats, uniqueness,
referential, drift, dedup, similarity, text, multimodal."""
